"""Chunk-kernel sub-stage budget, problem-aware (diffusion OR elasticity).

Times the exact stages of `BasisKernels._uniform_chunk_fn`'s `cfn` at one
chunk of the bench config: vprep, the routed SPD multi-RHS solve
(fused / fused_split / panel, as `_fused_solver_mode` resolves), the
hoisted T inverse, the trace-Gram pre stage, the spectral stage
(smallk/jacobi), and the post stage.  Each number x n_chunks approximates
that stage's share of the end-to-end bench wall.

Usage: [BENCH_PROBLEM=elasticity] [BENCH_REFINE=3] [BENCH_CHUNK=...]
       python scripts/stagebench4.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# the axon site plugin wins over env JAX_PLATFORMS; pin programmatically
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver

problem = os.environ.get("BENCH_PROBLEM", "diffusion")
dim = int(os.environ.get("BENCH_DIM", 3))
refine = int(os.environ.get("BENCH_REFINE", 3 if problem == "elasticity"
                            else 4))
chunk = int(os.environ.get("BENCH_CHUNK",
                           128 if problem == "elasticity" else 256))
cfg = SLODConfig(
    dim=dim, n_global_refinements=refine, n_subdivisions=2,
    oversampling=int(os.environ.get("BENCH_ELL", 2)),
    lod_stabilization=True, constant_coefficients=False, coef_seed=0,
    coef_refinement=5, rhs="1", bc="0", dtype="float32", patch_chunk=chunk,
    solve_fine_problem=False, coarse_solver=ReductionControl(500, 1e-6, 1e-6),
    patch_solver=os.environ.get("BENCH_SOLVER", "auto"))
if problem == "elasticity":
    from dealii_slod_tpu.models import ElasticityProblem
    cfg.rhs = "; ".join(["1"] * dim)
    solver = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
else:
    solver = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)

P, C = solver.topo.n_patches, solver.C
n_chunks = -(-P // chunk)
REPS = 3
sc = solver.canvas_class
mode = solver._fused_solver_mode()
print(f"problem={problem} dim={dim} refine={refine} chunk={chunk} "
      f"P={P} solver_mode={mode} nI={sc.n_interior * C} "
      f"k={sc.n_coarse_dofs_local}", flush=True)


def t(name, f, *a):
    g = jax.jit(lambda *x: jax.tree_util.tree_map(
        lambda y: jnp.sum(jnp.asarray(y, jnp.float32)), f(*x)))
    r = g(*a)
    float(jax.tree_util.tree_leaves(r)[0])
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = g(*a)
        float(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1000:9.2f} ms  (x{n_chunks} = "
          f"{best*n_chunks:.3f} s)", flush=True)
    return best


nc = len(solver.coef_names)
prep, finish, one_patch = solver._uniform_core()
(finish_pre, finish_post, finish_post_dvec, slod, spec_mode,
 cD) = solver._finish_split
vprep = jax.vmap(prep, in_axes=([0] * nc, 0, 0))
vpre = jax.vmap(finish_pre)
vpost = jax.vmap(finish_post)
vpost_dvec = jax.vmap(finish_post_dvec)
Hdim = solver.grid.H ** cfg.dim

gsub, nlo, nhi, sides = solver._uniform_inputs()
cwins = {k: np.asarray(solver._coef_windows(solver.coef_q[k]))
         for k in solver.coef_names}
sl = slice(0, chunk)
coef_l = [jnp.asarray(cwins[k][sl]) for k in solver.coef_names]
nlo_j, nhi_j = jnp.asarray(nlo[sl]), jnp.asarray(nhi[sl])
sides_j = jnp.asarray(sides[sl])

from dealii_slod_tpu.ops.patch_solve import (fused_spd_multirhs,
                                             fused_spd_multirhs_split,
                                             spd_inverse_schur,
                                             panel_spd_multirhs)

with jax.default_matmul_precision(cfg.matmul_precision):
    t("prep.total (vprep)", lambda *c: vprep(list(c), nlo_j, nhi_j), *coef_l)
    A_rows_I, A_solve, PT_m, cvd = jax.jit(
        lambda *c: vprep(list(c), nlo_j, nhi_j))(*coef_l)
    A_rows_I = jax.block_until_ready(A_rows_I)

    if mode == "panel":
        sv = lambda a, b: panel_spd_multirhs(a, b, nb=cfg.panel_nb,
                                             gj_bs=cfg.panel_gj_bs)
    elif mode == "fused_split":
        sv = lambda a, b: fused_spd_multirhs_split(a, b, nb=cfg.panel_nb,
                                                   bs=cfg.split_bs)
    else:
        sv = lambda a, b: fused_spd_multirhs(a, b, nb=cfg.fused_nb,
                                             bs=cfg.fused_block,
                                             algo=cfg.fused_algo)
    t(f"solve ({mode})", sv, A_solve, PT_m)
    Ainv_PT, T_raw = jax.jit(sv)(A_solve, PT_m)

    eye = jnp.eye(cvd.shape[-1], dtype=solver.dtype)
    T = T_raw / Hdim + eye * (1.0 - cvd)[:, None, :]
    split_eig = slod and spec_mode in ("jacobi", "smallk")
    if not split_eig:
        vfin = jax.vmap(finish)
        t("finish.total (non-split)", vfin, A_rows_I, Ainv_PT, T, cvd,
          nlo_j, nhi_j, sides_j)
        print("done", flush=True)
        sys.exit(0)

    t("Tinv (spd_inverse_schur)", spd_inverse_schur, T)
    Tinv = jax.jit(spd_inverse_schur)(T)

    t("pre.total (trace Gram, scan)", vpre, A_rows_I, Ainv_PT, Tinv, cvd,
      nlo_j, nhi_j, sides_j)
    if solver._trace_chunk is not None:
        trace_chunk, pre_from_S = solver._trace_chunk

        def pre_pallas(A_rows_I, Ainv_PT, Tinv, cvd, nlo, nhi, sides):
            S99, is99d = trace_chunk(A_rows_I, Ainv_PT, nlo, nhi, sides)
            return jax.vmap(pre_from_S)(S99, Tinv, cvd, is99d)

        t("pre.total (trace Gram, pallas)", pre_pallas, A_rows_I, Ainv_PT,
          Tinv, cvd, nlo_j, nhi_j, sides_j)
    G, g0 = jax.jit(vpre)(A_rows_I, Ainv_PT, Tinv, cvd, nlo_j, nhi_j,
                          sides_j)
    G = jax.block_until_ready(G)
    B = G.shape[0]

    from dealii_slod_tpu.ops.eig import (jacobi_eigh_factor,
                                         smallk_truncated_dvec)
    from dealii_slod_tpu.models.basis import smallk_k_eff
    if spec_mode == "smallk":
        k_eff = smallk_k_eff(cD, solver.dtype, cfg.smallk_dirs)
        t(f"spectral smallk (k={k_eff},p={cfg.smallk_power})",
          lambda g, g0_: smallk_truncated_dvec(
              g.reshape(B * C, cD, cD), g0_.reshape(B * C, cD), k=k_eff,
              power_steps=cfg.smallk_power), G, g0)
        dvec = jax.jit(lambda g, g0_: smallk_truncated_dvec(
            g.reshape(B * C, cD, cD), g0_.reshape(B * C, cD), k=k_eff,
            power_steps=cfg.smallk_power))(G, g0)
        t("post.total (dvec)", vpost_dvec, A_rows_I, Ainv_PT, Tinv,
          dvec.reshape(B, C, cD), cvd, nlo_j, nhi_j, sides_j)
    else:
        t(f"spectral jacobi (sweeps={cfg.eig_sweeps})",
          lambda g: jacobi_eigh_factor(g.reshape(B * C, cD, cD),
                                       sweeps=cfg.eig_sweeps,
                                       tol=cfg.eig_tol), G)
        lam, V = jax.jit(lambda g: jacobi_eigh_factor(
            g.reshape(B * C, cD, cD), sweeps=cfg.eig_sweeps,
            tol=cfg.eig_tol))(G)
        t("post.total", vpost, A_rows_I, Ainv_PT, Tinv,
          lam.reshape(B, C, cD), V.reshape(B, C, cD, cD), g0, cvd,
          nlo_j, nhi_j, sides_j)
print("done", flush=True)
