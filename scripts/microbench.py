"""Per-stage TPU microbenchmarks at the north-star shapes (BENCH_* config:
dim=3, l=2, s=2, N=16 -> P=4096 patches, chunk=256).

Each stage is timed in isolation with fetch-to-host materialization (the
axon backend's block_until_ready does not wait).  Prints stage wall times,
analytic FLOPs, and achieved TFLOP/s.
"""
import time, os, sys
import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("MB_B", 256))      # chunk size
nI = 729                                   # 9^3 interior dofs
nD = 1331                                  # 11^3 canvas dofs
cD = 125                                   # (2l+1)^3 coarse dofs
nG = 125                                   # SLOD Gram size
PREC = os.environ.get("MB_PREC", "high")
REPS = int(os.environ.get("MB_REPS", 3))

rng = np.random.default_rng(0)
def t(f, *a):
    g = jax.jit(lambda *x: jax.tree_util.tree_map(jnp.sum, f(*x)))
    g(*a)  # compile
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = g(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best

M = rng.standard_normal((B, nI, 32)).astype(np.float32)
A = jnp.asarray(np.einsum("bik,bjk->bij", M, M) + 729 * np.eye(nI, dtype=np.float32))
RHS = jnp.asarray(rng.standard_normal((B, nI, cD)).astype(np.float32))
G = jnp.asarray(np.einsum("bik,bjk->bij",
    rng.standard_normal((B, nG, nG)).astype(np.float32),
    rng.standard_normal((B, nG, nG)).astype(np.float32)))
Acols = jnp.asarray(rng.standard_normal((B, nD, nI)).astype(np.float32))

with jax.default_matmul_precision(PREC):
    chol = jax.jit(jnp.linalg.cholesky)
    def trsm2(L, Bm):
        from jax.scipy.linalg import solve_triangular
        Y = solve_triangular(L, Bm, lower=True)
        return solve_triangular(jnp.swapaxes(L, -1, -2), Y, lower=False)
    trsm2 = jax.jit(trsm2)
    def triple(PTm, Y):
        return jnp.einsum("bik,bij->bkj", PTm, Y)
    triple = jax.jit(triple)
    inv = jax.jit(jnp.linalg.inv)
    def slod_prod(Ac, Y):
        return Ac @ Y
    slod_prod = jax.jit(slod_prod)
    eigh = jax.jit(jnp.linalg.eigh)
    from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas
    jac = jax.jit(lambda g: jacobi_eigh_pallas(g, sweeps=12))
    matmul_nInI = jax.jit(lambda a, b: a @ b)

    res = {}
    res["cholesky 729^3/3"] = (t(chol, A), B * nI**3 / 3)
    L = chol(A)
    res["trsm 2x729^2x125"] = (t(trsm2, L, RHS), B * 2 * nI**2 * cD)
    res["triple 125x729x125"] = (t(triple, RHS, RHS), B * cD * nI * cD)
    T = jnp.asarray(np.einsum("bik,bjk->bij",
        rng.standard_normal((B, cD, cD)).astype(np.float32),
        rng.standard_normal((B, cD, cD)).astype(np.float32)) + np.eye(cD, dtype=np.float32))
    res["inv 125 (LU)"] = (t(inv, T), B * 2 * cD**3)
    res["slodprod 1331x729x125"] = (t(slod_prod, Acols, RHS), B * 2 * nD * nI * cD)
    res["eigh 125 (XLA)"] = (t(eigh, G), B * 9 * nG**3)
    res["jacobi12 125 (pallas)"] = (t(jac, G), B * (nG) * 12 * 14 * (nG//2) * nG)
    res["matmul 729x729 @ 729x125"] = (t(matmul_nInI, A, RHS), B * 2 * nI**2 * cD)

scale = 4096 / B
print(f"B={B} prec={PREC} backend={jax.default_backend()}")
for k, (w, fl) in res.items():
    print(f"{k:32s} {w*1000:9.2f} ms/chunk  {w*scale:7.3f} s/4096  "
          f"{fl/w/1e12:7.2f} TF/s")
