"""Non-chunk stage timings of the full step: coefficient windows, canvas
scatter, stencil build, coarse rhs, dense embed + CG.
Usage: python scripts/stagebench3.py
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
from dealii_slod_tpu.ops.solvers import cg

cfg = SLODConfig(
    dim=3, n_global_refinements=int(os.environ.get("BENCH_REFINE", 4)),
    n_subdivisions=2, oversampling=2, lod_stabilization=True,
    constant_coefficients=False, coef_seed=0, coef_refinement=5,
    rhs="1", bc="0", dtype="float32",
    patch_chunk=int(os.environ.get(
        "BENCH_CHUNK",
        128 if os.environ.get("BENCH_PROBLEM") == "elasticity" else 256)),
    solve_fine_problem=False, coarse_solver=ReductionControl(500, 1e-6, 1e-6))
if os.environ.get("BENCH_PROBLEM") == "elasticity":
    from dealii_slod_tpu.models import ElasticityProblem
    cfg.rhs = "; ".join(["1"] * cfg.dim)
    solver = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
else:
    solver = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
P, C = solver.topo.n_patches, solver.C
REPS = 3


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
    print(f"{name:40s} {best*1000:9.2f} ms", flush=True)
    return best


solver.assemble_fine_rhs()
rhs = solver.fem_rhs
alpha = solver.coef_q[solver.coef_names[0]]

with jax.default_matmul_precision(cfg.matmul_precision):
    t("coef windows (all P)", solver._coef_windows, alpha)

    Phi = jnp.zeros((P, solver.canvas_n, C, C), solver.dtype) + 0.01
    APhi = jnp.zeros((P, solver.canvas_n, C, C), solver.dtype) + 0.01
    t("stencil build (cells)", solver._stencil_build, Phi, APhi)
    A_st = jax.jit(solver._stencil_build)(Phi, APhi)

    t("coarse rhs (gather+einsum)",
      lambda ph, r: jnp.einsum("pncd,pnc->pd", ph, r[solver.canvas_gidx]),
      Phi, rhs)

    t("dense embed", solver.coarse_dense_matrix, A_st)
    rhs_c = jnp.ones((P, C), solver.dtype)
    diag = jnp.einsum("pdd->pd", A_st[:, solver.center_offset_idx]) + 1.0
    rc = cfg.coarse_solver

    def solve_dense(A_st, rhs_c, diag):
        mv = solver._coarse_matvec_fn(A_st)
        return cg(mv, rhs_c, max_steps=rc.max_steps, tolerance=rc.tolerance,
                  reduce=rc.reduce, precond=lambda r: r / diag).x

    t("dense embed + CG", solve_dense, A_st, rhs_c, diag)

    def solve_sten(A_st, rhs_c, diag):
        return cg(lambda u: solver._coarse_matvec_with(A_st, u), rhs_c,
                  max_steps=rc.max_steps, tolerance=rc.tolerance,
                  reduce=rc.reduce, precond=lambda r: r / diag).x

    t("stencil CG (old path)", solve_sten, A_st, rhs_c, diag)
print("done")
