"""End-to-end coverage of the production TPU spectral path on CPU: the
hoisted smallk stage (ops/eig.smallk_truncated_dvec) + the fused Pallas
solver (interpret mode) + finish_post_dvec, against the default
lapack-eigh/lax path.

Coarse coefficient vectors are basis-gauge-dependent (the sigma-truncation
takes discrete ||d||_inf < 0.5 decisions that can flip between numerically
different but equally valid stabilizations), so the comparison is on the
PROLONGED fine-grid field; at float64 both paths make the same decisions
and agree to ~3e-6 here — the tolerance leaves headroom for a flip."""

import jax
import numpy as np

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver


def _prolonged(problem="diffusion", **kw):
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                     oversampling=2, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=0,
                     rhs="1", bc="0", dtype="float64",
                     write_output=False, solve_fine_problem=False, **kw)
    if problem == "elasticity":
        from dealii_slod_tpu.models import ElasticityProblem
        cfg.rhs = "1; 1"
        prob = ElasticityProblem(cfg)
    else:
        prob = DiffusionProblem(cfg)
    s = LODSolver(cfg, prob, verbose=False)
    s.assemble_fine_rhs()
    s.compute_basis()
    s.assemble_coarse_operator()
    s.solve_coarse()
    return np.asarray(s.prolong_lod_solution())


def test_smallk_k_eff_large_cD():
    """Regression: the cD > 64 branch evaluated an undefined name (only the
    3D bench shapes cross 64, so the 2D e2e tests short-circuited past it;
    r4 TPU session crash)."""
    import jax.numpy as jnp
    from dealii_slod_tpu.models.basis import smallk_k_eff
    assert smallk_k_eff(50, jnp.float32, 32) == 50     # small: all dirs
    assert smallk_k_eff(125, jnp.float32, 32) == 32    # capped on f32
    assert smallk_k_eff(125, jnp.float64, 32) == 125   # f64: never capped
    assert smallk_k_eff(375, jnp.dtype("float32"), 32) == 32


def test_smallk_fused_matches_lapack_field():
    u_ref = _prolonged()                        # lapack eigh + lax solver
    u_sk = _prolonged(eig_solver="smallk", patch_solver="fused")
    rel = np.abs(u_sk - u_ref).max() / np.abs(u_ref).max()
    assert rel < 1e-4, rel


def test_smallk_variants_match_field():
    """The smallk perf knobs (adaptive W-stage tol, fused W-build+eig
    kernel) must not change the prolonged field beyond flip headroom."""
    u_ref = _prolonged(eig_solver="smallk", patch_solver="fused")
    u_tol = _prolonged(eig_solver="smallk", patch_solver="fused",
                       smallk_tol=3e-6)
    rel = np.abs(u_tol - u_ref).max() / np.abs(u_ref).max()
    assert rel < 1e-4, rel
    u_weig = _prolonged(eig_solver="smallk", patch_solver="fused",
                        smallk_weig=True)
    rel = np.abs(u_weig - u_ref).max() / np.abs(u_ref).max()
    assert rel < 1e-4, rel


def test_weig_pallas_matches_explicit_w_eig():
    """weig_pallas (in-kernel W = Z^T G Z + caterpillar sweeps) agrees
    with the two-step path on a random SPD batch (interpret on CPU)."""
    import jax.numpy as jnp
    from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas, weig_pallas

    rng = np.random.default_rng(11)
    B, n, k = 6, 40, 8
    A = rng.standard_normal((B, n, n))
    G = jnp.asarray(A @ np.swapaxes(A, -1, -2), jnp.float32)
    Z = jnp.asarray(np.linalg.qr(rng.standard_normal((B, n, k)))[0],
                    jnp.float32)
    W = jnp.einsum("bik,bij,bjl->bkl", Z, G, Z)
    W = 0.5 * (W + jnp.swapaxes(W, -1, -2))
    lam_ref, _ = jacobi_eigh_pallas(W, sweeps=12, block=B)
    ZT = jnp.swapaxes(Z, 1, 2)
    YT = jnp.einsum("bkj,bji->bki", ZT, G)
    lam, U = weig_pallas(ZT, YT, sweeps=12)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref),
                               rtol=1e-4, atol=1e-3)
    # eigenvector residual in W-space: ||W u - lam u||
    Wu = np.einsum("bij,bjk->bik", np.asarray(W, np.float64),
                   np.asarray(U, np.float64))
    lu = np.asarray(lam, np.float64)[:, None, :] * np.asarray(U, np.float64)
    assert np.max(np.abs(Wu - lu)) < 1e-2 * float(np.max(lam_ref))


def test_smallk_fused_matches_lapack_field_elasticity():
    """C > 1 exercises the batched candidate assembly in finish_post_dvec
    (dvec (C, cD) -> one matmul chain) and the C-component smallk batch."""
    u_ref = _prolonged("elasticity")
    u_sk = _prolonged("elasticity", eig_solver="smallk",
                      patch_solver="fused")
    rel = np.abs(u_sk - u_ref).max() / np.abs(u_ref).max()
    assert rel < 1e-4, rel
