"""Blocked Gauss-Jordan sweep SPD inverse == reference inverse.

`spd_inverse_schur` (ops/patch_solve.py) replaces the scalar Gauss-Jordan
sweep for the large SLOD Gram/T inverses (smallk spectral stage + chunk
Tinv, models/basis.py): nb x nb pivot blocks are inverted by the scalar
Pallas sweep, the rank-nb updates are batched MXU einsums.  Block sweeps
compose identically to scalar sweeps — must match numpy's inverse to
f.p. roundoff at every block pattern (n <= nb routes straight to the
scalar sweep; odd n exercises the identity-extended ragged block)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.ops.patch_solve import spd_inverse_schur


@pytest.mark.parametrize("n", [57, 125, 129, 375])
def test_spd_inverse_schur_matches_numpy(n):
    rng = np.random.default_rng(n)
    B = 5
    M = rng.standard_normal((B, n, n)).astype(np.float64)
    G = M @ np.swapaxes(M, -1, -2) + n * np.eye(n)
    Gi = np.asarray(spd_inverse_schur(jnp.asarray(G)))
    err = np.abs(Gi @ G - np.eye(n)).max()
    assert err < 1e-9, err


def test_spd_inverse_schur_f32_conditioned():
    """f32 at the bench-like shape and conditioning (jittered Gram)."""
    rng = np.random.default_rng(0)
    B, n = 8, 375
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    G = (M @ np.swapaxes(M, -1, -2)).astype(np.float32)
    d = np.abs(np.diagonal(G, axis1=-2, axis2=-1)).max(-1)
    G = G + (1e-6 * d)[:, None, None] * np.eye(n, dtype=np.float32)
    Gi = np.asarray(spd_inverse_schur(jnp.asarray(G)))
    # check in f64 against the true inverse action
    X = Gi.astype(np.float64) @ G.astype(np.float64)
    err = np.abs(X - np.eye(n)).max()
    # cond(G) ~ 1e4-1e6 at this shape; the residual scales with it
    assert err < 5e-2, err
