"""Regression tests for the Pallas scoped-VMEM gates (VERDICT r4 #7).

The Python-side VMEM heuristics are pure functions; pin them against the
compiler residencies actually MEASURED on the v5e so the next heuristic
drift is caught on CPU at test time, not at round close on the chip.

Measured data points (all from driver/self runs on TPU v5 lite):

- ``jacobi_eigh_pallas`` f32[256,16,32] (block=256): the r4 round-close
  driver bench crashed with "Scoped allocation with size 22.78M and limit
  16.00M" — the conditional gate had estimated 10.5M and set no limit
  (BENCH_r04.json tail; ops/eig.py r4 state).
- ``mgs_qr_pallas`` f32[192,32,384] (9.4M padded) and f32[128,32,384]
  (6.3M padded): both produced "Scoped allocation with size 17.80M" from
  the relayout operand+result stack pair (ops/eig.py mgs docstring, r3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_slod_tpu.ops.eig import jacobi_vmem_limit, mgs_stack_hazard

MB = 2 ** 20


def test_jacobi_limit_covers_r4_crash_shape():
    # f32[256,16,32]: B=256, block=256, m=16, n=32 — measured 22.78M
    lim = jacobi_vmem_limit(256, 256, 16, 32, 4)
    assert lim > int(22.78 * MB), (
        f"limit {lim / MB:.2f}M does not cover the measured 22.78M "
        "residency of the r4 driver crash")
    assert lim <= 110 * MB


def test_jacobi_limit_unconditional():
    # every shape gets a limit >= the compiler default: no shape may take
    # the None path again (the context-dependent relayout stack decision
    # makes 'fits today' meaningless across HLO changes)
    for B, block, m, n, isz in [
        (1, 1, 1, 2, 4),            # degenerate single matrix
        (384, 384, 16, 32, 4),      # the 3D W-stage that 'fit' pre-r4
        (512, 16, 25, 50, 4),       # 2D elasticity Grams
        (512, 16, 25, 50, 8),       # same at f64
        (4096, 1024, 64, 128, 4),   # large batch, blocked
    ]:
        lim = jacobi_vmem_limit(B, block, m, n, isz)
        assert lim >= 16 * MB
        assert lim <= 110 * MB


def test_jacobi_limit_scales_with_block_not_batch():
    # ADVICE r4: per-grid-step residency is (block, m, n); a huge batch at
    # fixed block must not inflate the in-kernel term (the full-batch term
    # only enters through the <=16M stack-hazard window, which a huge
    # batch is outside of)
    small = jacobi_vmem_limit(2048, 128, 64, 128, 4)
    huge = jacobi_vmem_limit(65536, 128, 64, 128, 4)
    assert huge == small


def test_mgs_stack_hazard_window():
    # both measured 17.80M-failure shapes must be classified as hazards
    for B, k, n in [(192, 32, 384), (128, 32, 384)]:
        assert mgs_stack_hazard(4 * B * k * n), (B, k, n)
    # tiny and large operands are out of the window (large gets a real
    # HBM relayout; tiny fits alongside the pair)
    assert not mgs_stack_hazard(4 * 8 * 8 * 128)
    assert not mgs_stack_hazard(4 * 1024 * 32 * 384)


def test_jacobi_pallas_still_correct_after_gate_change():
    # the unconditional limit changed every kernel's compiler params;
    # re-check numerics end-to-end in interpret mode on the crash shape
    from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas

    rng = np.random.default_rng(3)
    A = rng.standard_normal((8, 32, 32))
    G = jnp.asarray(A @ np.swapaxes(A, -1, -2), jnp.float32)
    lam, V = jacobi_eigh_pallas(G, sweeps=12, block=8)
    lam_ref = np.linalg.eigvalsh(np.asarray(G, np.float64))[:, ::-1]
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=2e-4,
                               atol=1e-3)
    # eigenvector residual ||G v - lam v||
    Gv = np.einsum("bij,bjk->bik", np.asarray(G), np.asarray(V))
    lv = np.asarray(lam)[:, None, :] * np.asarray(V)
    assert np.max(np.abs(Gv - lv)) < 1e-2 * np.max(lam_ref)
