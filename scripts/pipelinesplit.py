"""Top-level pipeline split at the bench config: basis vs stencil vs solve.

The per-chunk stage budget (stagebench4) is flat across refinements, yet
the refine-4 3D elasticity bench wall is ~2.3x the chunk-stage sum — this
locates the inflation by timing the pieces of ``build_step``'s
``_step_inner`` (models/lod.py) separately, with explicit host fetches
(axon's block_until_ready does not wait):

  coef windows  — structured window extraction per coefficient
  basis scan    — the lax.map chunk scan + canvas scatter
  stencil       — coarse stencil operator assembly from the canvases
  rhs + coarse  — rhs restriction + coarse CG solve

Usage: [BENCH_PROBLEM=elasticity] [BENCH_REFINE=4] [BENCH_CHUNK=128]
       python scripts/pipelinesplit.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.ops.solvers import cg

problem = os.environ.get("BENCH_PROBLEM", "elasticity")
dim = int(os.environ.get("BENCH_DIM", 3))
refine = int(os.environ.get("BENCH_REFINE", 4))
chunk = int(os.environ.get("BENCH_CHUNK",
                           128 if problem == "elasticity" else 256))
cfg = SLODConfig(
    dim=dim, n_global_refinements=refine, n_subdivisions=2,
    oversampling=2, lod_stabilization=True, constant_coefficients=False,
    coef_seed=0, coef_refinement=5, rhs="1", bc="0", dtype="float32",
    patch_chunk=chunk, solve_fine_problem=False,
    coarse_solver=ReductionControl(500, 1e-6, 1e-6))
if problem == "elasticity":
    from dealii_slod_tpu.models import ElasticityProblem
    cfg.rhs = "; ".join(["1"] * dim)
    solver = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
else:
    solver = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)

P, C = solver.topo.n_patches, solver.C
print(f"problem={problem} refine={refine} chunk={chunk} P={P}", flush=True)
solver.assemble_fine_rhs()
REPS = 3


def t(name, f, *a):
    g = jax.jit(f)
    out = g(*a)
    jax.tree_util.tree_map(lambda x: np.asarray(jnp.ravel(x)[:1]), out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*a)
        jax.tree_util.tree_map(lambda x: np.asarray(jnp.ravel(x)[:1]), out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt * 1e3:9.1f} ms", flush=True)
    return out


# --- replicate _step_inner's uniform-path pieces (models/lod.py) ---------
gsub, nlo, nhi, sides = solver._uniform_inputs()
n_chunks = -(-P // chunk)
idx = np.minimum(np.arange(n_chunks * chunk), P - 1)
extras = (jnp.asarray(nlo[idx]), jnp.asarray(nhi[idx]),
          jnp.asarray(sides[idx]))
vfn = solver._uniform_chunk_fn()
coefs = solver.coef_q

with jax.default_matmul_precision(cfg.matmul_precision):
    cw = t("coef windows (all coefs)",
           lambda cf: [solver._coef_windows(cf[k])[jnp.asarray(idx)]
                       for k in solver.coef_names], coefs)

    def basis_scan(cl, e0, e1, e2):
        def resh(a):
            return a.reshape((n_chunks, -1) + a.shape[1:])
        phi_c, aphi_c = jax.lax.map(
            lambda tup: vfn(list(tup[0]), *tup[1:]),
            (tuple(resh(c) for c in cl),) + tuple(map(resh, (e0, e1, e2))))
        phi_c = phi_c.reshape((-1,) + phi_c.shape[2:])[:P]
        aphi_c = aphi_c.reshape((-1,) + aphi_c.shape[2:])[:P]
        return (phi_c.reshape(P, -1, C, C), aphi_c.reshape(P, -1, C, C))

    Phi, APhi = t("basis scan (chunks)", basis_scan, cw, *extras)

    A_st = t("stencil assembly", solver._stencil_build, Phi, APhi)

    def coarse(Phi, A_st, fem_rhs):
        f_at = solver._rhs_windows(fem_rhs)
        rhs_c = jnp.einsum("pncd,pnc->pd", Phi, f_at)
        diag = jnp.einsum("pdd->pd", A_st[:, solver.center_offset_idx])
        rc = cfg.coarse_solver
        res = cg(solver._coarse_matvec_fn(A_st), rhs_c,
                 max_steps=rc.max_steps, tolerance=rc.tolerance,
                 reduce=rc.reduce, precond=lambda r: r / diag)
        return res.x

    t("rhs windows + coarse CG", coarse, Phi, A_st, solver.fem_rhs)

    step = solver.build_step()
    t("FULL step", step, coefs, solver.fem_rhs)
