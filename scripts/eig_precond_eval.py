"""Evaluate spectral-preconditioned one-sided Jacobi on REAL SLOD Grams.

Loads the npz captured by scripts/eig_capture.py and compares, per sweep
count:

  base     jacobi_eigh_factor (current production: Jacobi on L^T)
  precond  Jacobi on Q^T L^T where Q = f64 eigenbasis of mean_b(L_b^T L_b)
           (one-sided Jacobi convergence is governed by the ROW Gram of the
           working matrix, M M^T = Q^T (L^T L) Q — a shared Q that nearly
           diagonalizes the mean row Gram starts every patch deep in the
           quadratic-convergence regime; converged rows still give the
           eigenpairs of G = L L^T directly, since M^T M = G + delta I)

Accuracy metric: truncated pseudo-inverse ACTION error vs f64 LAPACK eigh
(the gauge-invariant metric from round 2).  Also reports off-diagonal mass
of the row Gram before/after preconditioning and TPU wall times.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.ops.eig import jacobi_eigh_factor, jacobi_eigh_pallas

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eig_grams.npz"
z = np.load(path)
G32 = z["G"].reshape(-1, z["G"].shape[-1], z["G"].shape[-1])
g032 = z["g0"].reshape(-1, z["g0"].shape[-1])
thr = float(z["svd_threshold"])
B, n, _ = G32.shape
print(f"{B} Grams of {n}x{n}, thr={thr}")

# ---- f64 reference ----
Gd = G32.astype(np.float64)
g0d = g032.astype(np.float64)
lam_r, V_r = np.linalg.eigh(Gd)
lam_r = lam_r[:, ::-1]
V_r = V_r[:, :, ::-1]
inv_r = np.where(lam_r > thr * lam_r[:, :1], 1.0 / np.maximum(lam_r, 1e-300), 0.0)
a_ref = np.einsum("bij,bj,bkj,bk->bi", V_r, inv_r, V_r, g0d)
nrm_ref = np.linalg.norm(a_ref, axis=1) + 1e-300

jitter = 1e-6
dmax = np.abs(np.einsum("bii->bi", Gd)).max(axis=1)
Ld = np.linalg.cholesky(Gd + (jitter * dmax)[:, None, None] * np.eye(n))
R = np.einsum("bki,bkj->bij", Ld, Ld)          # row Gram of L^T: L^T L
Rm = R.mean(axis=0)
w, Q = np.linalg.eigh(Rm)
Q = Q[:, ::-1]

def offdiag_mass(Rb):
    od = Rb - np.einsum("bii->bi", Rb)[:, None] * np.eye(n)
    d = np.sqrt(np.abs(np.einsum("bii->bi", Rb)))
    # normalized off-diagonal (cosine) mass
    cos = np.abs(od) / (d[:, :, None] * d[:, None, :] + 1e-300)
    return np.median(cos.max(axis=(1, 2))), np.median(
        np.sqrt((cos ** 2).sum(axis=(1, 2))))

Rq = np.einsum("ij,bjk,kl->bil", Q.T, R, Q)
print("row-gram max|cos| / frob(cos):  raw %.3e / %.3e   precond %.3e / %.3e"
      % (*offdiag_mass(R), *offdiag_mass(Rq)))

# ---- variants on TPU ----
Gj = jnp.asarray(G32)
Qj32 = jnp.asarray(Q.astype(np.float32))


def factor_precond(G, Qm, sweeps, tol, block=16):
    d = jnp.diagonal(G, axis1=-2, axis2=-1)
    dm = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
    delta = (jitter * dm)[..., None]
    nn = G.shape[-1]
    L = jnp.linalg.cholesky(G + delta * jnp.eye(nn, dtype=G.dtype))
    M = jnp.einsum("ij,bkj->bik", Qm.T, L)     # Q^T L^T
    s, U = jacobi_eigh_pallas(M, sweeps=sweeps, tol=tol, block=block)
    return s * s, U


def accuracy(lam, V):
    lam = np.asarray(lam, np.float64)
    V = np.asarray(V, np.float64)
    inv = np.where(lam > thr * lam[:, :1], 1.0 / np.maximum(lam, 1e-300), 0.0)
    a = np.einsum("bij,bj,bkj,bk->bi", V, inv, V, g0d)
    return np.median(np.linalg.norm(a - a_ref, axis=1) / nrm_ref)


def timeit(f, *a):
    g = jax.jit(lambda *x: jax.tree_util.tree_map(jnp.sum, f(*x)))
    g(*a)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*a)
        float(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best


# f32 LAPACK context
lam32, V32 = np.linalg.eigh(G32.astype(np.float32))
print(f"f32 LAPACK eigh action err: {accuracy(lam32[:, ::-1], V32[:, :, ::-1]):.3e}")

with jax.default_matmul_precision("high"):
    for sweeps in (2, 3, 4, 6, 8, 10):
        lam_b, V_b = jacobi_eigh_factor(Gj, sweeps=sweeps, tol=0.0)
        lam_p, V_p = factor_precond(Gj, Qj32, sweeps=sweeps, tol=0.0)
        print(f"sweeps={sweeps}: base err {accuracy(lam_b, V_b):.3e}   "
              f"precond err {accuracy(lam_p, V_p):.3e}", flush=True)
    for tol, sw in ((3e-6, 10), (1e-4, 10)):
        tb = timeit(lambda g: jacobi_eigh_factor(g, sweeps=sw, tol=tol), Gj)
        tp = timeit(lambda g: factor_precond(g, Qj32, sw, tol), Gj)
        lam_b, V_b = jacobi_eigh_factor(Gj, sweeps=sw, tol=tol)
        lam_p, V_p = factor_precond(Gj, Qj32, sw, tol)
        print(f"tol={tol:g}: base {tb*1e3:.1f} ms (err {accuracy(lam_b, V_b):.2e})  "
              f"precond {tp*1e3:.1f} ms (err {accuracy(lam_p, V_p):.2e})",
              flush=True)
