"""Distributed CG under ``shard_map``: row-sharded vectors with explicit
``psum`` reductions via the ``psum_axis`` hook.

The GSPMD pipeline path (models/lod.py build_step) lets XLA insert the CG
collectives from sharding constraints; this test exercises the *manual*
SPMD form — the direct analog of the reference's distributed Trilinos CG,
whose dot products all-reduce over MPI (reference source/LOD.cc:992-998) —
so the ``psum_axis`` contract of ops/solvers.cg is covered by a real
multi-device solve, not just kept as a hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dealii_slod_tpu.ops.solvers import cg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cg_psum_axis_row_sharded_matches_dense_solve():
    n = 64
    rng = np.random.default_rng(3)
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)                    # SPD
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)

    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    A_j = jnp.asarray(A)
    b_j = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P("rows")))

    def solve_shard(A_rows, b_loc):
        # A_rows: this shard's (n/8, n) row block; b_loc: its (n/8,) slice.
        def matvec(x_loc):
            x_full = jax.lax.all_gather(x_loc, "rows", tiled=True)
            return A_rows @ x_full

        res = cg(matvec, b_loc, max_steps=200, tolerance=1e-12,
                 reduce=1e-14, psum_axis="rows")
        return res.x, res.n_iter, res.converged

    fn = shard_map(solve_shard, mesh=mesh,
                   in_specs=(P("rows", None), P("rows")),
                   out_specs=(P("rows"), P(), P()))
    x, n_iter, converged = jax.jit(fn)(A_j, b_j)
    assert bool(converged)
    assert int(n_iter) <= n + 5
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-10)
    # the solution really is row-sharded over all 8 devices
    assert len(x.sharding.device_set) == 8
