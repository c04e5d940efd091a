"""Sharded-vs-single-device equality for the ELASTICITY family (the
reference treats elasticity as a first-class peer of diffusion,
reference include/Elasticity.h:92-438; its parallel design is patch
partitioning, reference source/LOD.cc:116-118).

Runs in a SUBPROCESS: XLA:CPU's collective rendezvous aborts the process
when a second sharded program runs in an already-loaded suite process on
this single-core host (see the note at the bottom of test_sharding.py),
so the in-suite diffusion test and this elasticity test cannot share a
process."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import sys
sys.path.insert(0, {here!r})
from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import ElasticityProblem, LODSolver
from dealii_slod_tpu.parallel.mesh import make_mesh, replicate

cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                 oversampling=1, lod_stabilization=True,
                 constant_coefficients=False, coef_seed=0, rhs="1; 1",
                 patch_chunk=8)
sol = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
sol.assemble_fine_rhs()
u1, A1 = jax.jit(sol.build_step())(sol.coef_q, sol.fem_rhs)

mesh = make_mesh(8)
step = jax.jit(sol.build_step(mesh=mesh))
coefs = {{k: replicate(mesh, v) for k, v in sol.coef_q.items()}}
u8, A8 = step(coefs, replicate(mesh, sol.fem_rhs))
np.testing.assert_allclose(np.asarray(u8), np.asarray(u1),
                           rtol=1e-10, atol=1e-12)
np.testing.assert_allclose(np.asarray(A8), np.asarray(A1),
                           rtol=1e-10, atol=1e-12)
assert len(u8.sharding.device_set) == 8
print("OK")
"""


def test_sharded_elasticity_matches_single_device():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    res = subprocess.run([sys.executable, "-c", CHILD.format(here=HERE)],
                         capture_output=True, text=True, cwd=HERE, env=env,
                         timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "OK" in res.stdout
