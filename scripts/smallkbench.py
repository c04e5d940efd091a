"""Sub-stage budget of the smallk spectral stage at a bench-config shape.

The chunk-level smallk call (`smallk_truncated_dvec`) is one of the two
dominant real costs of the 3D elasticity bench chunk (~96 ms/chunk after
subtracting the ~30 ms tunnel dispatch floor).  This times its pieces —
batched blocked Gauss-Jordan inverse, the inverse-subspace power steps
(matmul + MGS QR), the (k, k) Jacobi eig, and the removal scan — each
jitted standalone, on synthetic SPD Grams of the bench shape.

Usage: [SB_B=384] [SB_N=375] [SB_K=32] [SB_P=3] python scripts/smallkbench.py
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
from dealii_slod_tpu.ops.eig import (jacobi_eigh_pallas, mgs_qr_pallas,
                                     smallk_truncated_dvec)
from dealii_slod_tpu.ops.patch_solve import (fused_spd_multirhs,
                                             gj_inverse_pallas,
                                             spd_inverse_schur)

B = int(os.environ.get("SB_B", 384))
n = int(os.environ.get("SB_N", 375))
k = int(os.environ.get("SB_K", 32))
p = int(os.environ.get("SB_P", 3))
REPS = 5

rng = np.random.default_rng(0)
M = rng.standard_normal((B, n, n)).astype(np.float32)
G = jnp.asarray(M @ np.swapaxes(M, -1, -2) + n * np.eye(n, dtype=np.float32))
g0 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
Z0 = jnp.asarray(np.linalg.qr(rng.standard_normal((n, k)))[0]
                 .astype(np.float32))
Z0b = jnp.broadcast_to(Z0, (B, n, k)) + 0.0
print(f"B={B} n={n} k={k} p={p} backend={jax.default_backend()}", flush=True)


def t(name, f, *a):
    g = jax.jit(f)
    r = g(*a)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x[..., :1, :1] if x.ndim >= 2 else x), r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = g(*a)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x[..., :1, :1] if x.ndim >= 2 else x), r)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return r


Ginv = t("gj_inverse_pallas (B,n,n)", gj_inverse_pallas, G)
t("spd_inverse_schur (B,n,n)", spd_inverse_schur, G)
t("matmul Ginv@Z (one power step)",
  lambda Gi, Z: jnp.einsum("bij,bjk->bik", Gi, Z), Ginv, Z0b)
t("mgs_qr_pallas (one power step)", mgs_qr_pallas, Z0b)
t("fused_spd_multirhs solve (n rhs=k)",
  lambda A, Bm: fused_spd_multirhs(A, Bm), G, Z0b)


def Wstage(Gj, Z):
    W = jnp.einsum("bik,bij,bjl->bkl", Z, Gj, Z)
    W = 0.5 * (W + jnp.swapaxes(W, -1, -2))
    return jacobi_eigh_pallas(W, sweeps=8, block=128)


t("W + jacobi_eigh_pallas (k,k)", Wstage, G, Z0b)
t("smallk_truncated_dvec TOTAL",
  lambda Gm, g: smallk_truncated_dvec(Gm, g, k=k, power_steps=p), G, g0)
