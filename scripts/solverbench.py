"""Microbench: fused Pallas LDL vs XLA-level panel LDL at bench shapes.
Usage: python scripts/solverbench.py [n k P]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.ops.patch_solve import (fused_spd_multirhs,
                                             fused_spd_multirhs_split,
                                             panel_spd_multirhs)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 729
k = int(sys.argv[2]) if len(sys.argv) > 2 else 125
P = int(sys.argv[3]) if len(sys.argv) > 3 else 256

rng = np.random.default_rng(0)
M = rng.standard_normal((P, n, 16)).astype(np.float32)
A = jnp.asarray(np.einsum("bik,bjk->bij", M, M) + n * np.eye(n, dtype=np.float32))
B = jnp.asarray(rng.standard_normal((P, n, k)).astype(np.float32))


def t(name, f):
    try:
        X, T = f()
        np.asarray(X)  # axon: block_until_ready does not wait; fetch
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            X, T = f()
            np.asarray(T[0, 0, 0])
            np.asarray(X)
            best = min(best, time.perf_counter() - t0)
        # residual check
        R = np.einsum("bij,bjk->bik", np.asarray(A), np.asarray(X)) - np.asarray(B)
        rel = np.abs(R).max() / np.abs(np.asarray(B)).max()
        print(f"{name:28s} {best*1000:9.2f} ms   rel resid {rel:.2e}", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


with jax.default_matmul_precision("highest"):
    t("panel nb=128", lambda: panel_spd_multirhs(A, B, nb=128))
    t("panel nb=256", lambda: panel_spd_multirhs(A, B, nb=256))
    t("panel nb=128 gj_bs=32", lambda: panel_spd_multirhs(A, B, nb=128,
                                                          gj_bs=32))
    t("panel nb=128 gj_bs=64", lambda: panel_spd_multirhs(A, B, nb=128,
                                                          gj_bs=64))
    if n <= 1200:
        t("fused ldl bs=4 nb=64", lambda: fused_spd_multirhs(A, B, nb=64, bs=4))
        t("fused pipe bs=4 nb=64", lambda: fused_spd_multirhs(
            A, B, nb=64, bs=4, algo="ldl_pipe"))
    else:
        t("fused_split", lambda: fused_spd_multirhs_split(A, B))
