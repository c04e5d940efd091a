"""Stage-level timings of the REAL pipeline pieces at the bench config.
Usage: python scripts/stagebench.py [stage ...]   (default: all)
"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver

dim = int(os.environ.get("BENCH_DIM", 3))
cfg = SLODConfig(
    dim=dim, n_global_refinements=int(os.environ.get("BENCH_REFINE", 4)),
    n_subdivisions=2, oversampling=int(os.environ.get("BENCH_ELL", 2)),
    lod_stabilization=True, constant_coefficients=False, coef_seed=0,
    coef_refinement=5, rhs="1", bc="0", dtype="float32", patch_chunk=256,
    solve_fine_problem=False, coarse_solver=ReductionControl(500, 1e-6, 1e-6))
solver = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
solver.assemble_fine_rhs()
P, C = solver.topo.n_patches, solver.C
chunk = cfg.patch_chunk
REPS = 3

def t(name, f, *a):
    g = jax.jit(lambda *x: jax.tree_util.tree_map(
        lambda y: jnp.sum(jnp.asarray(y, jnp.float32)), f(*x)))
    g(*a)
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = g(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1000:9.2f} ms")
    return best

stages = sys.argv[1:] or ["coef", "kernel", "stencil", "cg"]
solver.cfg.eig_tol = float(os.environ.get("BENCH_EIG_TOL", 1e-10))
solver.cfg.eig_sweeps = int(os.environ.get("BENCH_EIG_SWEEPS", 10))
gsub, nlo, nhi, sides = solver._uniform_inputs()

if "coef" in stages:
    coef = solver.coef_q["alpha"]
    gs = jnp.asarray(gsub)
    t("coef gather (P,n_sub)", lambda c: c[gs], coef)
    t("coef windows (conv patches)", solver._coef_windows, coef)

if "kernel" in stages:
    cfn = solver._uniform_chunk_fn()
    cw = np.asarray(solver._coef_windows(solver.coef_q["alpha"]))
    cl = jnp.asarray(cw[:chunk])
    args = (jnp.asarray(nlo[:chunk]), jnp.asarray(nhi[:chunk]),
            jnp.asarray(sides[:chunk]))
    with jax.default_matmul_precision(cfg.matmul_precision):
        w = t(f"uniform chunk kernel ({cfg.patch_solver})",
              lambda c, *a: cfn([c], *a), cl, *args)
    print(f"   -> all patches: {w*P/chunk:.3f} s", flush=True)

if "fused" in stages:
    from dealii_slod_tpu.ops.patch_solve import fused_spd_multirhs
    prep, _, _ = solver._uniform_core()
    vprep = jax.vmap(prep, in_axes=([0], 0, 0))
    cw = np.asarray(solver._coef_windows(solver.coef_q["alpha"]))
    cl = jnp.asarray(cw[:chunk])
    with jax.default_matmul_precision(cfg.matmul_precision):
        _, A_solve, PT_m, _ = jax.jit(
            lambda c, lo, hi: vprep([c], lo, hi))(
            cl, jnp.asarray(nlo[:chunk]), jnp.asarray(nhi[:chunk]))
        A_solve = jax.block_until_ready(A_solve)
        w = t("fused spd multirhs chunk", fused_spd_multirhs, A_solve, PT_m)
        print(f"   -> all patches: {w*P/chunk:.3f} s", flush=True)
        w = t("prep (assembly+masks) chunk",
              lambda c, lo, hi: vprep([c], lo, hi),
              cl, jnp.asarray(nlo[:chunk]), jnp.asarray(nhi[:chunk]))
        print(f"   -> all patches: {w*P/chunk:.3f} s", flush=True)

if "eig" in stages:
    from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas
    rng = np.random.default_rng(0)
    cD = (2 * cfg.oversampling + 1) ** dim
    M = rng.standard_normal((chunk, cD, cD)).astype(np.float32)
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))
    with jax.default_matmul_precision(cfg.matmul_precision):
        w = t("jacobi adaptive (tol,maxsweeps)",
              lambda g: jacobi_eigh_pallas(g, sweeps=solver.cfg.eig_sweeps,
                                           tol=solver.cfg.eig_tol), G)
        print(f"   -> all patches: {w*P/chunk:.3f} s", flush=True)
        w = t("jacobi fixed 6",
              lambda g: jacobi_eigh_pallas(g, sweeps=6, tol=0.0), G)
        print(f"   -> all patches: {w*P/chunk:.3f} s", flush=True)

if "stencil" in stages:
    # build canvases once (host path)
    solver.compute_basis()
    Phi, APhi = solver.Phi, solver.APhi
    with jax.default_matmul_precision(cfg.matmul_precision):
        t("stencil build (cells+separable)", solver._stencil_build_cells, Phi, APhi)

if "cg" in stages:
    if not hasattr(solver, "A_stencil"):
        solver.compute_basis(); solver.assemble_coarse_operator()
    A_st = solver.A_stencil
    u = jnp.asarray(np.random.default_rng(0).standard_normal((P, C)),
                    jnp.float32)
    def mv_new(u):
        def body(i, x):
            return solver._coarse_matvec_with(A_st, x) * 1e-4 + u
        return jax.lax.fori_loop(0, 40, body, u)
    def mv_old(u):
        def body(i, x):
            xn = x[solver.stencil_nbr] * solver.stencil_valid[:, :, None]
            return jnp.einsum("psde,pse->pd", A_st, xn) * 1e-4 + u
        return jax.lax.fori_loop(0, 40, body, u)
    t("40 stencil matvecs (window)", mv_new, u)
    t("40 stencil matvecs (gather)", mv_old, u)
    # full coarse solve
    rhs = solver.fem_rhs[solver.canvas_gidx]
    rhs_c = jnp.einsum("pncd,pnc->pd", solver.Phi, rhs)
    diag = jnp.einsum("pdd->pd", A_st[:, solver.center_offset_idx])
    from dealii_slod_tpu.ops.solvers import cg
    rc = cfg.coarse_solver
    def solve(b):
        return cg(lambda x: solver._coarse_matvec_with(A_st, x), b,
                  max_steps=rc.max_steps, tolerance=rc.tolerance,
                  reduce=rc.reduce, precond=lambda r: r / diag).x
    t("coarse CG solve", solve, rhs_c)
print("done")
