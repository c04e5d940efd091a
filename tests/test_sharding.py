"""Multi-device sharding tests on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.parallel.mesh import make_mesh, replicate, shard_patches


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=0)
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.assemble_fine_rhs()
    u_single, A_single = jax.jit(sol.build_step())(sol.coef_q, sol.fem_rhs)

    mesh = make_mesh(8)
    step = jax.jit(sol.build_step(mesh=mesh))
    coefs = {k: replicate(mesh, v) for k, v in sol.coef_q.items()}
    u_mesh, A_mesh = step(coefs, replicate(mesh, sol.fem_rhs))
    np.testing.assert_allclose(np.asarray(u_mesh), np.asarray(u_single),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A_mesh), np.asarray(A_single),
                               rtol=1e-10, atol=1e-12)
    # the patch axis really is sharded (16 patches over 8 devices)
    assert len(u_mesh.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_direct_coarse_matches():
    """coarse_solve="direct" composes with the mesh-sharded step: the
    dense factor runs replicated after a gather; the result must equal the
    single-device direct solve."""
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=0,
                     coarse_solve="direct")
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.assemble_fine_rhs()
    u_single, _ = jax.jit(sol.build_step())(sol.coef_q, sol.fem_rhs)
    mesh = make_mesh(8)
    step = jax.jit(sol.build_step(mesh=mesh))
    coefs = {k: replicate(mesh, v) for k, v in sol.coef_q.items()}
    u_mesh, _ = step(coefs, replicate(mesh, sol.fem_rhs))
    np.testing.assert_allclose(np.asarray(u_mesh), np.asarray(u_single),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_shard_patches_uneven_replicates():
    mesh = make_mesh(2)
    x = np.zeros((7, 3))
    y = shard_patches(mesh, x)   # 7 % 2 != 0 -> replicated, not an error
    assert np.asarray(y).shape == (7, 3)


# NOTE: a second in-process 3D sharded-equality test was removed: the 3D
# SLOD sharded-vs-single-device check lives in `dryrun_multichip`
# (exercised by test_graft_dryrun above).  Running the same computation a
# second time inside the loaded suite process trips XLA:CPU's hardcoded
# collective-rendezvous abort on this single-core host.


def test_graft_entry_compiles():
    """The driver compile-checks entry() single-chip; keep it green here."""
    import jax

    import __graft_entry__ as ge
    fn, args = ge.entry()
    u, A_st = jax.jit(fn)(*args)
    import numpy as np
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(A_st)).all()
