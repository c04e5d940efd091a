"""Microbench: coarse-stencil build variants at the north-star config.

The pipelinesplit stage budget shows ~50 ms net for the stencil build vs
~8 ms of FLOP-model cost — this times the current `_stencil_build_cells`
against a C==1-squeezed contraction (drops the size-1 (C, C) axes from
the big einsum and the indicator matmul inputs) to locate the loss.

Usage: [BENCH_REFINE=4] python scripts/stencilbench.py
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

refine = int(os.environ.get("BENCH_REFINE", 4))
cfg = SLODConfig(dim=3, n_global_refinements=refine, n_subdivisions=2,
                 oversampling=2, lod_stabilization=True,
                 constant_coefficients=False, coef_seed=0, coef_refinement=5,
                 rhs="1", bc="0", dtype="float32", patch_chunk=256,
                 solve_fine_problem=False,
                 coarse_solver=ReductionControl(500, 1e-6, 1e-6))
s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
P, C = s.topo.n_patches, s.C
print(f"P={P} C={C} n_stencil={s.n_stencil}", flush=True)
rng = np.random.default_rng(0)
Phi = jnp.asarray(rng.standard_normal((P, s.canvas_n, C, C)), jnp.float32)
APhi = jnp.asarray(rng.standard_normal((P, s.canvas_n, C, C)), jnp.float32)


def timeit(name, f):
    # fetch ONLY a scalar: np.asarray(full A) pulls ~12 MB through the
    # tunnel per rep and swamps the ~50 ms signal (axon block_until_ready
    # does not wait, so a value fetch is still required)
    g = jax.jit(lambda a, b: jnp.sum(f(a, b)))
    np.asarray(g(Phi, APhi))
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        v = g(Phi, APhi)
        np.asarray(v)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1000:8.2f} ms", flush=True)
    return f(Phi, APhi)


A0 = timeit("current _stencil_build", s._stencil_build)


def build_c1(Phi, APhi):
    """C==1-squeezed variant of _stencil_build_cells (single chunk)."""
    tab = s._cell_tables()
    K, K2, O = tab["K"], tab["K2"], tab["O"]
    dim = cfg.dim
    kappa = 2 * cfg.oversampling + 1

    def side_table(X, which, slots_per_axis):
        cn = jnp.asarray(tab[f"cnode{which}"].reshape(-1))
        Y = jnp.take(X, cn, axis=1)
        incv = jnp.asarray(tab[f"incv{which}"].reshape(-1).astype(np.float32),
                           X.dtype)
        Y = Y * incv[None, :]
        Kx = slots_per_axis ** dim
        return s._shift_slots(Y.reshape(P, Kx, O), slots_per_axis)

    Pc = side_table(Phi.reshape(P, s.canvas_n), 1, kappa)        # (E, K, O)
    Ac = side_table(APhi.reshape(P, s.canvas_n), 2, kappa + 1)   # (E, K2, O)
    own = jnp.asarray(tab["own"].astype(np.float32), Phi.dtype)  # (E, 1, O)
    Ac = Ac * own
    Tk = jnp.einsum("eko,emo->ekm", Pc, Ac)                      # (E, K, K2)
    e_idx = jnp.asarray(tab["e_idx"])
    G2 = Tk[e_idx, jnp.arange(K)[None, :]]
    G2 = G2 * tab["evalid"][:, :, None]
    M3 = jnp.asarray(s._slot_match_matrix(), s.dtype)
    A_st = jnp.einsum("px,xj->pj", G2.reshape(P, K * K2), M3,
                      precision=jax.lax.Precision.HIGH)
    return A_st.reshape(P, s.n_stencil, 1, 1)


A1 = timeit("C1-squeezed single-chunk", build_c1)
print("max abs diff:", float(jnp.max(jnp.abs(A0 - A1))), flush=True)


def _shift_slots_neg(X, slots_per_axis):
    """`_shift_slots` with the OPPOSITE shift sign:
    out[q, k, :] = X[q + (k - ell), k, :] — realizes the G2 row gather
    G2[q, k] = Tk[e(q, k), k] (e = q + ks[k] - ell) as static pad/slice
    stacks; off-lattice rows come out zero, which equals the evalid mask."""
    dim = cfg.dim
    N = cfg.n_coarse
    ell = cfg.oversampling
    Kx = slots_per_axis
    rest = X.shape[2:]
    X = X.reshape((N,) * dim + (Kx,) * dim + rest)
    for a in range(dim):
        lat_ax = dim - 1 - a
        slot_ax = dim + (dim - 1 - a)
        parts = []
        for kv in range(Kx):
            d = kv - ell
            Xi = jax.lax.index_in_dim(X, kv, axis=slot_ax, keepdims=True)
            pad = [(0, 0)] * Xi.ndim
            if d >= 0:
                lo = min(d, N)
                Xi = jax.lax.slice_in_dim(Xi, lo, N, axis=lat_ax)
                pad[lat_ax] = (0, lo)
            else:
                hi = max(N + d, 0)
                Xi = jax.lax.slice_in_dim(Xi, 0, hi, axis=lat_ax)
                pad[lat_ax] = (N - hi, 0)
            parts.append(jnp.pad(Xi, pad))
        X = jnp.concatenate(parts, axis=slot_ax)
    return X.reshape((N ** dim, Kx ** dim) + rest)


def build_c1_shift(Phi, APhi):
    """build_c1 with the G2 row gather replaced by the shift stacks."""
    tab = s._cell_tables()
    K, K2, O = tab["K"], tab["K2"], tab["O"]
    kappa = 2 * cfg.oversampling + 1

    def side_table(X, which, slots_per_axis):
        cn = jnp.asarray(tab[f"cnode{which}"].reshape(-1))
        Y = jnp.take(X, cn, axis=1)
        incv = jnp.asarray(tab[f"incv{which}"].reshape(-1).astype(np.float32),
                           X.dtype)
        Y = Y * incv[None, :]
        Kx = slots_per_axis ** cfg.dim
        return s._shift_slots(Y.reshape(P, Kx, O), slots_per_axis)

    Pc = side_table(Phi.reshape(P, s.canvas_n), 1, kappa)
    Ac = side_table(APhi.reshape(P, s.canvas_n), 2, kappa + 1)
    own = jnp.asarray(tab["own"].astype(np.float32), Phi.dtype)
    Ac = Ac * own
    Tk = jnp.einsum("eko,emo->ekm", Pc, Ac)
    G2 = _shift_slots_neg(Tk, kappa)                      # (P, K, K2)
    M3 = jnp.asarray(s._slot_match_matrix(), s.dtype)
    A_st = jnp.einsum("px,xj->pj", G2.reshape(P, K * K2), M3,
                      precision=jax.lax.Precision.HIGH)
    return A_st.reshape(P, s.n_stencil, 1, 1)


A2 = timeit("C1-squeezed shift-G2", build_c1_shift)
print("max abs diff (shift vs gather):",
      float(jnp.max(jnp.abs(A1 - A2))), flush=True)
