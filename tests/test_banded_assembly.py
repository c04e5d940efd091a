"""Scatter-free banded assembly (ops/assembly.py) vs the scatter-add path.

The banded form must reproduce the per-subcell scatter assembly exactly —
same stiffness entries, every dim / component count / grid shape (the
reference's assembly contract, include/Diffusion.h:111-207, validated there
by tests/fe_q_iso_q1_01.cc / _02.cc)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.grid import GridSpec, ShapeClass
from dealii_slod_tpu.ops.assembly import (assemble_dense,
                                          assemble_dense_banded,
                                          make_band_tensors,
                                          make_subcell_matrices)
from dealii_slod_tpu.ops.element import ElementTensors


@pytest.mark.parametrize("dim,C,cells", [
    (2, 1, (3, 3)), (2, 1, (2, 4)), (3, 1, (2, 2, 2)), (3, 1, (3, 2, 2)),
    (2, 2, (3, 3)), (2, 2, (2, 2)),
])
def test_banded_matches_scatter(dim, C, cells):
    rng = np.random.default_rng(7)
    g = GridSpec(dim, 4, 2, C)
    sc = ShapeClass(tuple(cells), g)
    et = ElementTensors(dim, g.h, C)
    nq = 2 ** dim
    names = ["alpha"] if C == 1 else ["mu", "lam"]
    coefs = {k: jnp.asarray(rng.standard_normal((sc.n_sub_local, nq)) + 3.0)
             for k in names}
    A_ref = assemble_dense(make_subcell_matrices(et, coefs),
                           jnp.asarray(sc.assembly_flat_idx),
                           sc.n_fine_dofs_local)
    A_band = assemble_dense_banded(coefs, make_band_tensors(et),
                                   sc.sub_dims_local, sc.node_dims_local)
    err = float(jnp.abs(A_ref - A_band).max())
    assert err < 1e-12 * float(jnp.abs(A_ref).max())


def test_banded_masked_window():
    """With coefficients zeroed outside a sub-window (the uniform kernel's
    in_sub mask) the banded and scatter paths still agree — the clipped
    node windows must zero the wrap positions of the strided embedding."""
    rng = np.random.default_rng(3)
    dim, C = 3, 1
    g = GridSpec(dim, 4, 2, C)
    sc = ShapeClass((3, 3, 3), g)
    et = ElementTensors(dim, g.h, C)
    coef = rng.standard_normal((sc.n_sub_local, 8)) + 3.0
    # zero a boundary shell of subcells
    keep = ((sc.sub_coords >= 2) & (sc.sub_coords <= 4)).all(axis=1)
    coefs = {"alpha": jnp.asarray(coef * keep[:, None])}
    A_ref = assemble_dense(make_subcell_matrices(et, coefs),
                           jnp.asarray(sc.assembly_flat_idx),
                           sc.n_fine_dofs_local)
    A_band = assemble_dense_banded(coefs, make_band_tensors(et),
                                   sc.sub_dims_local, sc.node_dims_local)
    assert float(jnp.abs(A_ref - A_band).max()) \
        < 1e-12 * float(jnp.abs(A_ref).max())
