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


def test_smallk_fused_matches_lapack_field_elasticity():
    """C > 1 exercises the batched candidate assembly in finish_post_dvec
    (dvec (C, cD) -> one matmul chain) and the C-component smallk batch."""
    u_ref = _prolonged("elasticity")
    u_sk = _prolonged("elasticity", eig_solver="smallk",
                      patch_solver="fused")
    rel = np.abs(u_sk - u_ref).max() / np.abs(u_ref).max()
    assert rel < 1e-4, rel
