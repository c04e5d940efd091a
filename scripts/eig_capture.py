"""Capture REAL SLOD Gram matrices (G, g0) at the bench config to npz.

Runs the uniform-kernel pipeline up to (but not including) the spectral
stage for a few chunks and saves the per-patch Gram matrices — the inputs
of the dominant eig stage — for offline algorithm experiments
(scripts/eig_precond_eval.py).

Usage: python scripts/eig_capture.py [out.npz] [chunk_ids...]
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.ops.patch_solve import fused_spd_multirhs, gj_inverse_pallas

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eig_grams.npz"
chunk_ids = [int(c) for c in sys.argv[2:]] or [0, 7]

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

nc = len(solver.coef_names)
prep, finish, one_patch = solver._uniform_core()
finish_pre, finish_post, finish_post_dvec, slod, spec_mode, cD = solver._finish_split
assert slod
vprep = jax.vmap(prep, in_axes=([0] * nc, 0, 0))
vpre = jax.vmap(finish_pre)
Hdim = solver.grid.H ** cfg.dim


def capture(coef_list, nlo, nhi, sides):
    A_rows_I, A_solve, PT_m, cvd = vprep(coef_list, nlo, nhi)
    Ainv_PT, T_raw = fused_spd_multirhs(A_solve, PT_m, bs=cfg.fused_block,
                                        algo=cfg.fused_algo)
    eye = jnp.eye(cvd.shape[-1], dtype=solver.dtype)
    T = T_raw / Hdim + eye * (1.0 - cvd)[:, None, :]
    Tinv = gj_inverse_pallas(T)
    G, g0 = vpre(A_rows_I, Ainv_PT, Tinv, cvd, nlo, nhi, sides)
    return G, g0


kern = jax.jit(lambda cl, lo, hi, sd: capture([cl], lo, hi, sd))
gsub, nlo, nhi, sides = solver._uniform_inputs()
cw = np.asarray(solver._coef_windows(solver.coef_q["alpha"]))

Gs, g0s, pids = [], [], []
with jax.default_matmul_precision(cfg.matmul_precision):
    for ci in chunk_ids:
        lo = ci * chunk
        sl = slice(lo, lo + chunk)
        G, g0 = kern(jnp.asarray(cw[sl]), jnp.asarray(nlo[sl]),
                     jnp.asarray(nhi[sl]), jnp.asarray(sides[sl]))
        Gs.append(np.asarray(G))
        g0s.append(np.asarray(g0))
        pids.append(np.arange(lo, lo + chunk))
        print(f"chunk {ci}: G {Gs[-1].shape}", flush=True)

np.savez_compressed(out_path, G=np.concatenate(Gs), g0=np.concatenate(g0s),
                    pids=np.concatenate(pids), cD=cD, C=C,
                    svd_threshold=cfg.svd_threshold)
print("saved", out_path)
