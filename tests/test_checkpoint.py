"""Checkpoint/resume: basis save + reload skips basis construction and
reproduces the same solution; stale configs are rejected."""

import numpy as np

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import LODSolver, DiffusionProblem
from dealii_slod_tpu.utils.checkpoint import load_basis, save_basis


def _mk(**kw):
    base = dict(dim=2, n_global_refinements=2, n_subdivisions=2,
                oversampling=1, lod_stabilization=True,
                constant_coefficients=False, coef_seed=9)
    base.update(kw)
    cfg = SLODConfig(**base)
    return LODSolver(cfg, DiffusionProblem(cfg), verbose=False)


def test_checkpoint_roundtrip(tmp_path):
    a = _mk()
    a.compute_basis()
    a.assemble_coarse_operator()
    a.assemble_fine_rhs()
    u_a = np.asarray(a.solve_coarse())
    path = str(tmp_path / "basis.npz")
    save_basis(a, path)

    b = _mk()
    assert load_basis(b, path)
    b.assemble_fine_rhs()
    u_b = np.asarray(b.solve_coarse())
    np.testing.assert_allclose(u_a, u_b, rtol=1e-12)


def test_checkpoint_rejects_mismatched_config(tmp_path):
    a = _mk()
    a.compute_basis()
    path = str(tmp_path / "basis.npz")
    save_basis(a, path)
    c = _mk(oversampling=2)
    assert not load_basis(c, path)
