"""Variant microbenchmarks: Tinv strategies + Jacobi sweep counts."""
import time, os
import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("MB_B", 256))
cD = 125
REPS = 3
rng = np.random.default_rng(0)

def t(f, *a):
    g = jax.jit(lambda *x: jax.tree_util.tree_map(jnp.sum, f(*x)))
    g(*a)
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = g(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best

M = rng.standard_normal((B, cD, cD)).astype(np.float32)
T = jnp.asarray(np.einsum("bik,bjk->bij", M, M) + cD * np.eye(cD, dtype=np.float32))
G = jnp.asarray(np.einsum("bik,bjk->bij",
    rng.standard_normal((B, cD, cD)).astype(np.float32),
    rng.standard_normal((B, cD, cD)).astype(np.float32)))
eye = jnp.broadcast_to(jnp.eye(cD, dtype=jnp.float32), (B, cD, cD))

from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas, jacobi_eigh_onesided
from jax.scipy.linalg import solve_triangular

with jax.default_matmul_precision("high"):
    res = {}
    res["inv LU"] = t(jnp.linalg.inv, T)
    res["solve LU eye"] = t(lambda a: jnp.linalg.solve(a, eye), T)
    def chol_inv(a):
        L = jnp.linalg.cholesky(a)
        Y = solve_triangular(L, eye, lower=True)
        return solve_triangular(jnp.swapaxes(L, -1, -2), Y, lower=False)
    res["chol inv"] = t(chol_inv, T)
    def ns_inv(a, iters=18):
        # Newton-Schulz: X <- X (2I - A X); init X0 = A^T/(||A||_1 ||A||_inf)
        n1 = jnp.abs(a).sum(axis=-1).max(axis=-1)
        ninf = jnp.abs(a).sum(axis=-2).max(axis=-1)
        X = jnp.swapaxes(a, -1, -2) / (n1 * ninf)[:, None, None]
        def body(i, X):
            return X @ (2.0 * eye - a @ X)
        return jax.lax.fori_loop(0, iters, body, X)
    res["newton-schulz 18"] = t(ns_inv, T)
    err = float(jnp.abs(ns_inv(T) @ T - eye).max())
    res["jacobi sweeps=6"] = t(lambda g: jacobi_eigh_pallas(g, sweeps=6), G)
    res["jacobi sweeps=8"] = t(lambda g: jacobi_eigh_pallas(g, sweeps=8), G)
    res["jacobi onesided XLA s=8"] = t(lambda g: jacobi_eigh_onesided(g, sweeps=8), G)
    # CG on the coarse stencil shapes: 4096 dofs, 729-wide stencil gather
    P, S = 4096, 729
    A_st = jnp.asarray(rng.standard_normal((P, S)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, P, (P, S)).astype(np.int32))
    b = jnp.asarray(rng.standard_normal((P,)).astype(np.float32))
    def cg_like(b, iters=60):
        def body(i, x):
            ax = (A_st * x[nbr]).sum(-1)
            return x + 1e-3 * (b - ax)
        return jax.lax.fori_loop(0, iters, body, b)
    res["60 stencil matvecs"] = t(cg_like, b)

scale = 4096 / B
print(f"B={B} backend={jax.default_backend()}  ns_err={err:.2e}")
for k, w in res.items():
    sc = 1.0 if "matvec" in k else scale
    print(f"{k:28s} {w*1000:9.2f} ms  {w*sc:7.3f} s/4096")
