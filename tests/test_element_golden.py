"""Golden diff of the Q_iso_Q1 element stiffness matrices against the
reference's printed values (tests/fe_q_iso_q1_01.cc + .output): degree 3,
unit cell, dim 1 and 2, printed with FullMatrix::print_formatted(precision
3, fixed, width 10; blank = zero) in deal.II HIERARCHIC dof numbering
(vertices, then line interiors, then quad interior).

The golden holds two identical matrices per dim (subcell-loop vs
full-quadrature assembly — the reference test's own point); both blocks are
diffed against this package's closed-form banded assembly
(ops/element.ElementTensors + ops/assembly.assemble_dense_banded), permuted
lex -> hierarchic.
"""
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from dealii_slod_tpu.ops.assembly import assemble_dense_banded, make_band_tensors
from dealii_slod_tpu.ops.element import ElementTensors

GOLDEN = "/root/reference/tests/fe_q_iso_q1_01.output"


def _parse_blocks(path):
    """print_formatted width-10 fields + 1-space separator; blank field =
    stored zero.  Returns the list of matrices (consecutive non-empty
    lines form one matrix)."""
    blocks, rows = [], []
    for ln in open(path).read().splitlines():
        if not ln.strip():
            if rows:
                blocks.append(np.array(rows))
                rows = []
            continue
        vals = []
        for i in range(0, len(ln), 11):
            f = ln[i:i + 11].strip()
            vals.append(float(f) if f else 0.0)
        rows.append(vals)
    if rows:
        blocks.append(np.array(rows))
    return blocks


def _hierarchic_to_lex(dim, deg):
    """deal.II hierarchic dof order for Q(deg) on a line/quad -> flat lex
    node index (x-fastest).  Vertices first, then line interiors (quad
    lines ordered left/right/bottom/top), then the quad interior in lex."""
    if dim == 1:
        return np.array([0, deg] + list(range(1, deg)))
    nx = deg + 1
    idx = [0 + 0 * nx, deg + 0 * nx, 0 + deg * nx, deg + deg * nx]
    rng = range(1, deg)
    idx += [0 + j * nx for j in rng]          # line 0: x=0
    idx += [deg + j * nx for j in rng]        # line 1: x=deg
    idx += [i + 0 * nx for i in rng]          # line 2: y=0
    idx += [i + deg * nx for i in rng]        # line 3: y=deg
    idx += [i + j * nx for j in rng for i in rng]
    return np.array(idx)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference tree not present")
def test_fe_q_iso_q1_01_element_matrices_golden():
    blocks = _parse_blocks(GOLDEN)
    assert len(blocks) == 4                    # (subcell, full) x (1D, 2D)
    deg = 3
    for dim, golds in ((1, blocks[:2]), (2, blocks[2:])):
        et = ElementTensors(dim=dim, h=1.0 / deg)   # unit cell, 3 subcells
        bt = make_band_tensors(et)
        sub_dims = (deg,) * dim
        node_dims = (deg + 1,) * dim
        n_sub = deg ** dim
        ones = jnp.ones((n_sub, 2 ** dim), jnp.float64)
        A = np.asarray(assemble_dense_banded({"alpha": ones}, bt,
                                             sub_dims, node_dims))
        n = (deg + 1) ** dim
        A = A.reshape(n, n)
        p = _hierarchic_to_lex(dim, deg)
        A_h = A[np.ix_(p, p)]
        for gold in golds:
            assert gold.shape == (n, n)
            # golden prints 3 decimals fixed -> quantization 5e-4 + slack
            np.testing.assert_allclose(A_h, gold, atol=5.1e-4, rtol=0)
