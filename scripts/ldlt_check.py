"""Correctness + microbench of the stacked transposed-RHS fused kernel
("ldlt") against the row-major "ldl" formulation at the bench shape.
Usage: python scripts/ldlt_check.py [P]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dealii_slod_tpu.ops.patch_solve import fused_spd_multirhs

P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
n, k = 729, 125
rng = np.random.default_rng(0)
M = rng.standard_normal((P, n, n)).astype(np.float32)
A = np.einsum("bij,bkj->bik", M, M) / n + 3.0 * np.eye(n, dtype=np.float32)
B = rng.standard_normal((P, n, k)).astype(np.float32)
Aj, Bj = jnp.asarray(A), jnp.asarray(B)


def run(algo, bs):
    f = jax.jit(lambda a, b: fused_spd_multirhs(a, b, bs=bs, algo=algo))
    # timing closure reduces on device: fetching X (93 MB) through the
    # axon tunnel costs seconds and would swamp the kernel time
    g = jax.jit(lambda a, b: sum(jnp.sum(v) for v in f(a, b)))
    t0 = time.perf_counter()
    X, T = f(Aj, Bj)
    Xn, Tn = np.asarray(X), np.asarray(T)
    comp = time.perf_counter() - t0
    float(g(Aj, Bj))
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(Aj, Bj))
        best = min(best, time.perf_counter() - t0)
    r = np.linalg.norm(np.einsum("bij,bjk->bik", A, Xn) - B) / np.linalg.norm(B)
    rt = np.linalg.norm(Tn - np.einsum("bnk,bnj->bkj", B, Xn)) / np.linalg.norm(Tn)
    print(f"{algo:8s} bs={bs}  compile {comp:6.1f}s  best {best*1000:8.2f} ms"
          f"  resid {r:.3e}  T-consist {rt:.3e}", flush=True)
    return Xn, best


def run_nb(algo, bs, nb):
    f = jax.jit(lambda a, b: fused_spd_multirhs(a, b, bs=bs, nb=nb,
                                                algo=algo))
    g = jax.jit(lambda a, b: sum(jnp.sum(v) for v in f(a, b)))
    t0 = time.perf_counter()
    float(g(Aj, Bj))
    comp = time.perf_counter() - t0
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(Aj, Bj))
        best = min(best, time.perf_counter() - t0)
    X = np.asarray(f(Aj, Bj)[0])
    r = np.linalg.norm(np.einsum("bij,bjk->bik", A, X) - B) / np.linalg.norm(B)
    print(f"{algo:8s} bs={bs} nb={nb:3d}  compile {comp:6.1f}s  "
          f"best {best*1000:8.2f} ms  resid {r:.3e}", flush=True)


import itertools
combos = sys.argv[2:] or ["ldl:2:128", "ldlt:2:128", "ldlt:2:64", "ldlt:4:64"]
for c in combos:
    algo, bs, nb = c.split(":")
    try:
        run_nb(algo, int(bs), int(nb))
    except Exception as e:
        print(f"{c} FAILED: {str(e)[:200]}", flush=True)
