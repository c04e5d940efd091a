"""Full-vector golden diff against the reference's single-patch Poisson
solve (tests/solve_poisson_problem_on_patch_01.cc): a Q_iso_Q1(7) patch of
5x7 coarse cells on a 10x10 grid (start cell (1,4), overlap 3, clipped at
the x=0 boundary), alpha=1, f=1, zero boundary values on ALL patch faces,
solved and lifted into the 71x71-node global fine vector in lexicographic
numbering (tests/util.h:216-281 compute_renumbering_lex: y-major,
x-fastest) and printed with deal.II Vector::print (3-decimal scientific).

The reference golden (tests/solve_poisson_problem_on_patch_01.output) is
position-by-position reproducible here because the print order is plain
lex — exactly this package's node ordering — so this checks values AND
layout of the whole lifted vector (5041 entries), not summary norms.

Exercises the production patch ops end-to-end: closed-form element tensors
(ops/element.py) -> nodal-stencil banded assembly (ops/assembly.py:
make_band_tensors/assemble_dense_banded) -> interior extraction -> batched
Cholesky multi-RHS solve (ops/solvers.py) -> boundary scatter.
"""
import os
import re

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from dealii_slod_tpu.grid import cartesian_coords
from dealii_slod_tpu.ops.assembly import (assemble_dense_banded,
                                          assemble_load_vector,
                                          make_band_tensors)
from dealii_slod_tpu.ops.element import ElementTensors
from dealii_slod_tpu.ops.solvers import cholesky_factor, cholesky_solve

GOLDEN = "/root/reference/tests/solve_poisson_problem_on_patch_01.output"


def _subcell_conn(sub_dims):
    """Subcell -> node connectivity on an x-fastest node grid."""
    sx, sy = sub_dims
    nx = sx + 1
    cells = cartesian_coords(np.array([sx, sy]))       # (n_sub, 2) x-fastest
    corners = cartesian_coords(np.array([2, 2]))       # (4, 2) x-fastest
    return ((cells[:, None, 0] + corners[None, :, 0])
            + nx * (cells[:, None, 1] + corners[None, :, 1]))


def test_solve_poisson_problem_on_patch_01_full_vector():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference tree not present")
    tokens = re.split(r"\s+", open(GOLDEN).read().strip())
    golden = np.array([float(t) for t in tokens])
    assert golden.size == 71 * 71                      # 10x10 cells, degree 7

    # patch geometry (solve_poisson_problem_on_patch_01.cc:28-52 +
    # util.h:408-440 reinit-by-overlap): cells x in [0,5), y in [1,8)
    deg = 7
    sub_dims = (5 * deg, 7 * deg)                      # (35, 49) subcells
    node_dims = (sub_dims[0] + 1, sub_dims[1] + 1)     # (36, 50) nodes
    n_nodes = node_dims[0] * node_dims[1]
    h = 1.0 / 70.0                                     # global fine cell size

    et = ElementTensors(dim=2, h=h)
    bt = make_band_tensors(et)
    n_sub = sub_dims[0] * sub_dims[1]
    ones = jnp.ones((n_sub, 4), jnp.float64)
    A = assemble_dense_banded({"alpha": ones}, bt, sub_dims, node_dims)
    A = A.reshape(n_nodes, n_nodes)

    conn = _subcell_conn(sub_dims)
    f_q = jnp.ones((n_sub, 4, 1), jnp.float64)
    rhs = assemble_load_vector(et, jnp.asarray(conn), f_q, n_nodes)[:, 0]

    # zero boundary values on all four patch faces (the .cc constrains
    # every face d in 0..2*dim regardless of the domain boundary)
    xy = cartesian_coords(np.asarray(node_dims))
    interior = ((xy[:, 0] > 0) & (xy[:, 0] < sub_dims[0])
                & (xy[:, 1] > 0) & (xy[:, 1] < sub_dims[1]))
    idx = np.flatnonzero(interior)
    A_II = jnp.asarray(np.asarray(A)[np.ix_(idx, idx)])
    L = cholesky_factor(A_II[None])
    u_I = cholesky_solve(L, rhs[jnp.asarray(idx)][None, :, None])[0, :, 0]
    u = np.zeros(n_nodes)
    u[idx] = np.asarray(u_I)

    # lift into the 71x71 global lex vector: node (x, y+7) -> x + 71*(y+7)
    lifted = np.zeros(71 * 71)
    gx = xy[:, 0]
    gy = xy[:, 1] + 7
    lifted[gx + 71 * gy] = u

    # golden prints %.3e: per-entry tolerance = half a unit in the last
    # printed digit (plus rounding slack)
    tol = np.where(golden == 0.0, 1e-14,
                   0.51e-3 * 10.0 ** np.floor(
                       np.log10(np.maximum(np.abs(golden), 1e-300))))
    bad = np.abs(lifted - golden) > tol
    assert not bad.any(), (
        f"{bad.sum()} entries off; first at {np.flatnonzero(bad)[:5]}: "
        f"{lifted[bad][:5]} vs {golden[bad][:5]}")
