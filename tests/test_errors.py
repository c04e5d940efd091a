"""Device-path error norms must match the host NumPy quadrature."""

import numpy as np
import jax.numpy as jnp

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
from dealii_slod_tpu.utils.errors import _device_norms, error_norms


def test_device_norms_match_numpy():
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                     oversampling=1, constant_coefficients=True,
                     rhs="1", bc="0", dtype="float64")
    s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    conn = np.asarray(s.conn)
    rng = np.random.default_rng(0)
    n = s.grid.n_nodes * s.C
    u = rng.standard_normal((n // s.C, s.C))
    v = rng.standard_normal((n // s.C, s.C))
    host = error_norms(s.grid, s.et, conn, u, other=v)
    l2, h1s, linf = _device_norms(s.et, conn, jnp.asarray(u), jnp.asarray(v))
    assert abs(l2 - host["L2"]) < 1e-12 * host["L2"]
    assert abs(h1s - host["H1_semi"]) < 1e-12 * host["H1_semi"]
    assert abs(linf - host["Linfty"]) < 1e-12 * host["Linfty"]
