"""Sample-axis (Monte-Carlo) sweep tests: vmapped end-to-end step over a
batch of coefficient fields, sharded over the 8-virtual-device CPU mesh.
The sharded sweep must equal per-sample sequential runs exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.models.coefficients import RandomField
from dealii_slod_tpu.parallel.mesh import make_mesh
from dealii_slod_tpu.parallel.sweep import stack_fields, sweep_step


def _solver_and_fields(n_fields):
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=0,
                     coef_refinement=3, coef_min=1.0, coef_max=50.0)
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.assemble_fine_rhs()
    qp = np.asarray(sol.qpts)
    fields = [{"alpha": jnp.asarray(
        RandomField(1.0, 50.0, 3, 2, seed=s, sampler="numpy")(qp),
        sol.dtype)} for s in range(n_fields)]
    return sol, fields


def test_sweep_matches_sequential():
    sol, fields = _solver_and_fields(3)
    base = jax.jit(sol.build_step())
    seq = [base(f, sol.fem_rhs) for f in fields]

    sw = sweep_step(sol)
    u, A_st = sw(stack_fields(fields), sol.fem_rhs)
    for s, (u_s, A_s) in enumerate(seq):
        np.testing.assert_allclose(np.asarray(u[s]), np.asarray(u_s),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(A_st[s]), np.asarray(A_s),
                                   rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sweep_sharded_over_mesh():
    sol, fields = _solver_and_fields(8)
    base = jax.jit(sol.build_step())
    u0, _ = base(fields[5], sol.fem_rhs)

    mesh = make_mesh(8, axis="samples")
    sw = sweep_step(sol, mesh=mesh, axis="samples")
    u, _ = sw(stack_fields(fields), sol.fem_rhs)
    assert len(u.sharding.device_set) == 8      # sample axis really sharded
    np.testing.assert_allclose(np.asarray(u[5]), np.asarray(u0),
                               rtol=1e-10, atol=1e-12)
