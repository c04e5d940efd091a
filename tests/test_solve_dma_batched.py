"""Batched-leaf solve: bs > 1 batch padding preserves exact solutions.

`spd_multirhs_solve_dma(bs=N)` (ops/patch_solve.py) pads the patch batch
to a multiple of bs with identity-lead matrices (zero RHS) so instances
share the factor chain.  On CPU the kernel routes to `jnp.linalg.solve`
AFTER the padding is built, so this exercises the padding algebra
(identity extension must not perturb the real patches) on every
platform; the TPU kernel path is covered by the on-chip elasticity
benches (finite + nonzero solution asserts) and the e2e equality tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.ops.patch_solve import (fused_spd_multirhs_split,
                                             spd_multirhs_solve_dma)


@pytest.mark.parametrize("P,bs", [(5, 3), (4, 4), (7, 2)])
def test_solve_dma_batch_padding(P, bs):
    rng = np.random.default_rng(P * 10 + bs)
    n, k = 162, 37                       # non-multiple of nb/lane sizes
    M = rng.standard_normal((P, n, n))
    A = jnp.asarray(M @ np.swapaxes(M, -1, -2) + n * np.eye(n))
    B = jnp.asarray(rng.standard_normal((P, n, k)))
    X = np.asarray(spd_multirhs_solve_dma(A, B, bs=bs))
    ref = np.linalg.solve(np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(X, ref, rtol=1e-9, atol=1e-11)


def test_split_solver_bs_equals_bs1():
    rng = np.random.default_rng(0)
    P, n, k = 3, 300, 20
    M = rng.standard_normal((P, n, n))
    A = jnp.asarray(M @ np.swapaxes(M, -1, -2) + n * np.eye(n))
    B = jnp.asarray(rng.standard_normal((P, n, k)))
    X1, T1 = fused_spd_multirhs_split(A, B, nb=128, bs=1)
    X2, T2 = fused_spd_multirhs_split(A, B, nb=128, bs=2)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T1),
                               rtol=1e-10, atol=1e-12)
