"""Correlated lognormal coefficient field (beyond the reference's i.i.d.
problem_parameter): statistics, determinism, host/device samplers, and
end-to-end pipeline integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.models.coefficients import (
    LognormalField, lognormal_lattice_batch, sample_gaussian_lattice)


def test_gaussian_lattice_statistics():
    rng = np.random.default_rng(0)
    zs = np.stack([sample_gaussian_lattice(rng, 64, 2, 0.1)
                   for _ in range(16)])
    # unit variance by construction
    assert abs(zs.std() - 1.0) < 0.05
    # neighbor correlation >> distant correlation (corr length 0.1 = 6.4
    # cells): estimate across samples at fixed lags
    flat = zs.reshape(16, 64, 64)
    near = np.mean([np.corrcoef(flat[i, :-1].ravel(),
                                flat[i, 1:].ravel())[0, 1]
                    for i in range(16)])
    far = np.mean([np.corrcoef(flat[i, :32].ravel(),
                               flat[i, 32:].ravel())[0, 1]
                   for i in range(16)])
    assert near > 0.9
    assert abs(far) < 0.35


def test_lognormal_field_range_and_determinism():
    f1 = LognormalField(1.0, 100.0, 6, 2, corr_len=0.1, seed=3)
    f2 = LognormalField(1.0, 100.0, 6, 2, corr_len=0.1, seed=3)
    f3 = LognormalField(1.0, 100.0, 6, 2, corr_len=0.1, seed=4)
    np.testing.assert_array_equal(f1.values, f2.values)
    assert not np.array_equal(f1.values, f3.values)
    # geometric median ~ sqrt(min*max) = 10; +-2 sigma spans [1, 100]
    gm = np.exp(np.median(np.log(f1.values)))
    assert 5.0 < gm < 20.0
    pts = np.random.default_rng(0).uniform(0, 1, (50, 2))
    v = f1(pts)
    assert v.shape == (50,)
    assert (v > 0).all()
    # constant degenerate case
    fc = LognormalField(2.0, 2.0, 6, 2)
    assert (fc(pts) == 2.0).all()


def test_device_batch_sampler_matches_host_statistics():
    vals = lognormal_lattice_batch(jax.random.PRNGKey(0), 8, 5, 2,
                                   1.0, 100.0, corr_len=0.1)
    assert vals.shape == (8, 1024)
    v = np.asarray(vals)
    assert (v > 0).all()
    # log-statistics match the host parameterization
    mu = 0.5 * (np.log(1.0) + np.log(100.0))
    sigma = 0.25 * (np.log(100.0) - np.log(1.0))
    lg = np.log(v)
    # the DC mode of a corr_len=0.1 field makes per-sample means fluctuate
    # ~0.2-0.4; statistics over 8 samples are loose by design
    assert abs(lg.mean() - mu) < 0.6
    assert abs(lg.std() - sigma) < 0.3


def test_lognormal_pipeline_end_to_end():
    from dealii_slod_tpu.config import SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                     oversampling=2, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=1,
                     coef_field="lognormal", coef_corr_len=0.15,
                     coef_refinement=5, rhs="1", bc="0", dtype="float64",
                     write_output=False)
    s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    s.compute_basis(); s.assemble_coarse_operator(); s.assemble_fine_rhs()
    u = np.asarray(s.solve_coarse())
    assert np.isfinite(u).all() and np.abs(u).max() > 0
