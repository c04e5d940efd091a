"""Sub-stage timings inside the uniform chunk kernel (round-3 profiling).

Times the individual pieces of prep / finish_pre / finish_post at the bench
config to locate where the non-matmul time goes.
Usage: python scripts/stagebench2.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.ops.patch_solve import fused_spd_multirhs, gj_inverse_pallas
from dealii_slod_tpu.ops.assembly import (assemble_bands, bands_to_dense,
                                          make_band_tensors)

dim = int(os.environ.get("BENCH_DIM", 3))
cfg = SLODConfig(
    dim=dim, n_global_refinements=int(os.environ.get("BENCH_REFINE", 4)),
    n_subdivisions=2, oversampling=int(os.environ.get("BENCH_ELL", 2)),
    lod_stabilization=True, constant_coefficients=False, coef_seed=0,
    coef_refinement=5, rhs="1", bc="0", dtype="float32", patch_chunk=256,
    solve_fine_problem=False, coarse_solver=ReductionControl(500, 1e-6, 1e-6))
solver = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
P, C = solver.topo.n_patches, solver.C
chunk = cfg.patch_chunk
REPS = 3
sc = solver.canvas_class


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
    print(f"{name:40s} {best*1000:9.2f} ms  (x16 = {best*16:.3f} s)",
          flush=True)
    return best


nc = len(solver.coef_names)
prep, finish, one_patch = solver._uniform_core()
finish_pre, finish_post, finish_post_dvec, slod, spec_mode, cD = solver._finish_split
vprep = jax.vmap(prep, in_axes=([0] * nc, 0, 0))
vpre = jax.vmap(finish_pre)
vpost = jax.vmap(finish_post)
Hdim = solver.grid.H ** cfg.dim

gsub, nlo, nhi, sides = solver._uniform_inputs()
cw = np.asarray(solver._coef_windows(solver.coef_q["alpha"]))
sl = slice(0, chunk)
cl = jnp.asarray(cw[sl])
nlo_j, nhi_j = jnp.asarray(nlo[sl]), jnp.asarray(nhi[sl])
sides_j = jnp.asarray(sides[sl])

band_tensors = make_band_tensors(solver.et)
sub_dims_np = sc.sub_dims_local.copy()
node_dims_np = sc.node_dims_local.copy()
nD = sc.n_fine_dofs_local
nI = sc.n_interior * C
grid_rev = tuple(int(d) for d in sc.node_dims_local[::-1])
inner = tuple(slice(1, -1) for _ in range(cfg.dim))

with jax.default_matmul_precision(cfg.matmul_precision):
    # ---- prep pieces ----
    vbands = jax.vmap(lambda c: assemble_bands({"alpha": c}, band_tensors,
                                               sub_dims_np))
    t("prep.bands (einsum)", vbands, cl)
    bands = jax.jit(vbands)(cl)

    t("prep.total (vprep)", lambda c, lo, hi: vprep([c], lo, hi),
      cl, nlo_j, nhi_j)
    A_rows_I, A_solve, PT_m, cvd = jax.jit(
        lambda c, lo, hi: vprep([c], lo, hi))(cl, nlo_j, nhi_j)
    A_rows_I, A_solve = jax.block_until_ready((A_rows_I, A_solve))

    # ---- solve + Tinv ----
    t("fused_spd_multirhs", lambda a, b: fused_spd_multirhs(
        a, b, bs=cfg.fused_block, nb=cfg.fused_nb, algo=cfg.fused_algo),
      A_solve, PT_m)
    Ainv_PT, T_raw = jax.jit(lambda a, b: fused_spd_multirhs(
        a, b, bs=cfg.fused_block, nb=cfg.fused_nb,
        algo=cfg.fused_algo))(A_solve, PT_m)
    eye = jnp.eye(cvd.shape[-1], dtype=solver.dtype)
    T = T_raw / Hdim + eye * (1.0 - cvd)[:, None, :]
    t("Tinv (gj_inverse_pallas)", gj_inverse_pallas, T)
    Tinv = jax.jit(gj_inverse_pallas)(T)

    # ---- finish_pre ----
    t("pre.total (vpre)", vpre, A_rows_I, Ainv_PT, Tinv, cvd, nlo_j, nhi_j,
      sides_j)
    G, g0 = jax.jit(vpre)(A_rows_I, Ainv_PT, Tinv, cvd, nlo_j, nhi_j, sides_j)
    G, g0 = jax.block_until_ready((G, g0))

    # ---- eig + finish_post ----
    from dealii_slod_tpu.ops.eig import jacobi_eigh_factor
    Bc = G.shape[0]
    t("eig (factor, tol=3e-6)",
      lambda g: jacobi_eigh_factor(g.reshape(Bc * C, cD, cD), sweeps=10,
                                   tol=3e-6), G)
    lam, V = jax.jit(lambda g: jacobi_eigh_factor(
        g.reshape(Bc * C, cD, cD), sweeps=10, tol=3e-6))(G)
    lam = lam.reshape(Bc, C, cD)
    V = V.reshape(Bc, C, cD, cD)
    t("post.total (vpost)", vpost, A_rows_I, Ainv_PT, Tinv, lam, V, g0, cvd,
      nlo_j, nhi_j, sides_j)
    from dealii_slod_tpu.ops.eig import smallk_truncated_dvec
    Bc2 = G.shape[0]
    t("eig smallk (k=32,p=3)",
      lambda g, h: smallk_truncated_dvec(g.reshape(Bc2 * C, cD, cD),
                                         h.reshape(Bc2 * C, cD), k=32,
                                         power_steps=3), G, g0)

    # ---- whole chunk (one dispatch, as the pipeline runs it) ----
    cfn = solver._uniform_chunk_fn()
    t("CHUNK total (cfn)", lambda c, lo, hi, sd: cfn([c], lo, hi, sd),
      cl, nlo_j, nhi_j, sides_j)

    # ---- full step (compile cached from bench) ----
    solver.assemble_fine_rhs()
    step = jax.jit(solver.build_step())

    def full(coef, rhs):
        u, A_st = step(coef, rhs)
        return u

    t("STEP total", full, solver.coef_q, solver.fem_rhs)
print("done")
