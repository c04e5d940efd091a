"""Batched ring-Jacobi eigensolver tests (ops/eig.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.ops.eig import jacobi_eigh, _ring_permutation


def test_ring_permutation_covers_all_pairs():
    for n in (6, 8, 126):
        perm = _ring_permutation(n)
        layout = np.arange(n)
        seen = set()
        for _ in range(n - 1):
            for k in range(n // 2):
                a, b = layout[2 * k], layout[2 * k + 1]
                seen.add((min(a, b), max(a, b)))
            layout = layout[perm]
        assert len(seen) == n * (n - 1) // 2


@pytest.mark.parametrize("n", [8, 125, 126])
def test_jacobi_eigh_matches_lapack(n):
    rng = np.random.default_rng(1)
    B = 8
    M = rng.standard_normal((B, n, n // 2 + 2))
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))  # PSD, rank-deficient
    lam, V = jacobi_eigh(G, sweeps=12)
    lam_ref = np.linalg.eigvalsh(np.asarray(G))[:, ::-1]
    np.testing.assert_allclose(np.asarray(lam), lam_ref,
                               rtol=1e-11, atol=1e-10 * lam_ref.max())
    # eigen residual + orthogonality
    res = np.einsum("bij,bjk->bik", np.asarray(G), np.asarray(V)) \
        - np.asarray(V) * np.asarray(lam)[:, None, :]
    assert np.abs(res).max() < 1e-8 * lam_ref.max()
    orth = np.einsum("bki,bkj->bij", np.asarray(V), np.asarray(V)) - np.eye(n)
    assert np.abs(orth).max() < 1e-12


@pytest.mark.parametrize("n", [8, 125])
def test_onesided_jacobi_matches_lapack(n):
    rng = np.random.default_rng(2)
    B = 6
    M = rng.standard_normal((B, n, n // 2 + 2))
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))
    from dealii_slod_tpu.ops.eig import jacobi_eigh_onesided
    lam, V = jacobi_eigh_onesided(G, sweeps=16)
    lam_ref = np.linalg.eigvalsh(np.asarray(G))[:, ::-1]
    np.testing.assert_allclose(np.asarray(lam), lam_ref,
                               rtol=1e-10, atol=1e-10 * lam_ref.max())
    res = np.einsum("bij,bjk->bik", np.asarray(G), np.asarray(V)) \
        - np.asarray(V) * np.asarray(lam)[:, None, :]
    assert np.abs(res).max() < 1e-8 * lam_ref.max()


def test_pallas_jacobi_interpret_mode():
    """On CPU the Pallas kernel runs in interpret mode; same results."""
    from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas
    rng = np.random.default_rng(3)
    n, B = 10, 4
    M = rng.standard_normal((B, n, n))
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))
    lam, V = jacobi_eigh_pallas(G, sweeps=14)
    lam_ref = np.linalg.eigvalsh(np.asarray(G))[:, ::-1]
    np.testing.assert_allclose(np.asarray(lam), lam_ref, rtol=1e-10)


def test_equal_diagonal_coupling_rotated():
    """zeta == 0 (equal row norms / diagonals, nonzero coupling) must still
    rotate: [[1, .5], [.5, 1]] has eigenvalues (1.5, 0.5).  Regression for
    the jnp.sign(0) == 0 bug (ADVICE r1)."""
    from dealii_slod_tpu.ops.eig import jacobi_eigh_onesided
    G = jnp.asarray([[[1.0, 0.5], [0.5, 1.0]]])
    lam, V = jacobi_eigh_onesided(G, sweeps=10)
    np.testing.assert_allclose(np.asarray(lam[0]), [1.5, 0.5], atol=1e-12)
    lam2, _ = jacobi_eigh(G, sweeps=10)
    np.testing.assert_allclose(np.asarray(lam2[0]), [1.5, 0.5], atol=1e-12)
    # equal-diagonal tridiagonal, two-sided
    T = np.eye(5) * 2.0 + np.diag(np.ones(4), 1) + np.diag(np.ones(4), -1)
    lam3, _ = jacobi_eigh(jnp.asarray(T[None]), sweeps=12)
    ref = np.sort(np.linalg.eigvalsh(T))[::-1]
    np.testing.assert_allclose(np.asarray(lam3[0]), ref, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_matrices(n):
    """n <= 2 previously broke the caterpillar advance (carry-shape error)."""
    from dealii_slod_tpu.ops.eig import jacobi_eigh_onesided
    rng = np.random.default_rng(4)
    M = rng.standard_normal((3, n, n))
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))
    lam, V = jacobi_eigh_onesided(G, sweeps=8)
    lam_ref = np.linalg.eigvalsh(np.asarray(G))[:, ::-1]
    np.testing.assert_allclose(np.asarray(lam), lam_ref, atol=1e-10)
    lam2, _ = jacobi_eigh(G, sweeps=8)
    np.testing.assert_allclose(np.asarray(lam2), lam_ref, atol=1e-10)


def test_adaptive_sweeps_match_fixed():
    """tol > 0 (adaptive sweep count) must reproduce the fixed-sweep
    spectrum; interpret mode exercises the same while_loop the TPU runs."""
    from dealii_slod_tpu.ops.eig import jacobi_eigh_onesided, jacobi_eigh_pallas
    rng = np.random.default_rng(7)
    n, B = 40, 8
    M = rng.standard_normal((B, n, n // 2))
    G = jnp.asarray(np.einsum("bik,bjk->bij", M, M))
    lam_ref = np.linalg.eigvalsh(np.asarray(G))[:, ::-1]
    lam, _ = jacobi_eigh_onesided(G, sweeps=30, tol=1e-28)
    np.testing.assert_allclose(np.asarray(lam), lam_ref, atol=1e-10)
    lam2, _ = jacobi_eigh_pallas(G, sweeps=30, tol=1e-28)
    np.testing.assert_allclose(np.asarray(lam2), lam_ref, atol=1e-10)


def test_factor_form_matches_eigh():
    """jacobi_eigh_factor must agree with numpy eigh on the significant
    spectrum (the factor form sees sqrt of the dynamic range)."""
    from dealii_slod_tpu.ops.eig import jacobi_eigh_factor

    rng = np.random.default_rng(11)
    B, n = 5, 40
    M = rng.standard_normal((B, n, n))
    lam_true = 10.0 ** rng.uniform(-5, 0, (B, n))
    Q = np.linalg.qr(M)[0]
    G = jnp.asarray(np.einsum("bik,bk,bjk->bij", Q, lam_true, Q))
    lam, V = jacobi_eigh_factor(G, sweeps=16, tol=1e-13)
    lam_ref = np.sort(lam_true, axis=-1)[:, ::-1]
    assert np.abs(np.asarray(lam) - lam_ref).max() < 1e-6 * lam_ref.max()
    # eigenvector residual on the significant spectrum
    for i in range(B):
        for j in range(10):
            v = np.asarray(V[i, :, j])
            r = np.asarray(G[i]) @ v - float(lam[i, j]) * v
            assert np.abs(r).max() < 1e-6 * float(lam[i, 0])


def test_smallk_zero_gram_degenerates_to_zero():
    """Full-domain patches produce an identically-zero Gram (no 99-boundary
    trace, reference LOD.cc:563-564); the smallk stage must return dvec = 0
    for them — and stay finite — while handling regular Grams in the same
    batch."""
    import numpy as np
    import jax.numpy as jnp
    from dealii_slod_tpu.ops.eig import smallk_truncated_dvec

    rng = np.random.default_rng(0)
    n = 24
    M = rng.standard_normal((n, n))
    G_ok = M @ M.T + n * np.eye(n)
    G = np.stack([G_ok, np.zeros((n, n)), G_ok])
    g0 = np.stack([G_ok @ rng.standard_normal(n) * 1e-3,
                   np.zeros(n),
                   G_ok @ rng.standard_normal(n) * 1e-3])
    d = np.asarray(smallk_truncated_dvec(jnp.asarray(G), jnp.asarray(g0),
                                         k=8))
    assert np.isfinite(d).all()
    np.testing.assert_array_equal(d[1], 0.0)
    ref = -np.linalg.solve(G_ok + 1e-13 * np.abs(np.diag(G_ok)).max()
                           * np.eye(n), g0[0])
    np.testing.assert_allclose(d[0], ref, rtol=1e-6, atol=1e-12)


def test_mgs_qr_matches_householder_span():
    """mgs_qr_pallas (interpret falls back to QR on CPU; on TPU the Pallas
    MGS2 kernel): orthonormal columns spanning the same subspace."""
    from dealii_slod_tpu.ops.eig import mgs_qr_pallas
    rng = np.random.default_rng(0)
    X = rng.standard_normal((7, 125, 32)).astype(np.float32)
    # poorly scaled columns (the subspace-iteration regime)
    X *= np.logspace(0, -5, 32)[None, None, :]
    Q = np.asarray(mgs_qr_pallas(jnp.asarray(X)))
    QtQ = np.einsum("bni,bnj->bij", Q, Q)
    np.testing.assert_allclose(QtQ, np.broadcast_to(np.eye(32), QtQ.shape),
                               atol=5e-5)
    # span: projecting X onto Q reproduces X
    P = np.einsum("bni,bmi->bnm", Q, Q)
    X2 = np.einsum("bnm,bmk->bnk", P, X)
    np.testing.assert_allclose(X2, X, rtol=1e-3, atol=1e-5)
