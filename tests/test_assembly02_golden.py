"""Golden diff vs the reference's assembly_02 test (tests/assembly_02.cc +
.output): 1D, 5 cells, Q_iso_Q1(2), overlap-1 patches, dummy basis = the
indicator of each patch's interior dofs (1 on the patch, zeroed on ALL
patch faces incl. the domain boundary, assembly_02.cc:141-152), real Laplace
element matrices and f=1 load.  Prints A_LOD's Frobenius norm (48.9898),
rhs_lod = C^T f and the direct solution of A_LOD x = rhs_lod.

All three are deterministic and checked here against this package's
closed-form dim=1 banded assembly + load vector, with C built from the same
clipped-window interior combinatorics the reference's Patch::reinit
produces.
"""
import os
import re

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from dealii_slod_tpu.ops.assembly import (assemble_dense_banded,
                                          assemble_load_vector,
                                          make_band_tensors)
from dealii_slod_tpu.ops.element import ElementTensors

GOLDEN = "/root/reference/tests/assembly_02.output"


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference tree not present")
def test_assembly_02_norm_rhs_solution_golden():
    txt = open(GOLDEN).read().splitlines()
    frob_golden = float(txt[0])
    vecs = []
    for i, ln in enumerate(txt):
        if ln.startswith("Vector data"):
            vecs.append(np.array([float(t) for t in txt[i + 1].split()]))
    rhs_golden, sol_golden = vecs

    n_cells, deg = 5, 2
    n_sub = n_cells * deg                       # 10 subcells, h = 1/10
    n_nodes = n_sub + 1
    et = ElementTensors(dim=1, h=1.0 / n_sub)
    bt = make_band_tensors(et)
    A = np.asarray(assemble_dense_banded(
        {"alpha": jnp.ones((n_sub, 2), jnp.float64)}, bt,
        (n_sub,), (n_nodes,))).reshape(n_nodes, n_nodes)

    conn = np.stack([np.arange(n_sub), np.arange(n_sub) + 1], axis=1)
    f = np.asarray(assemble_load_vector(
        et, jnp.asarray(conn), jnp.ones((n_sub, 2, 1), jnp.float64),
        n_nodes))[:, 0]

    # C(i, j) = 1 for fine nodes strictly inside patch j's window
    # (cells [j-1, j+1] clipped; zero constraints on every patch face)
    C = np.zeros((n_nodes, n_cells))
    for j in range(n_cells):
        lo_c, hi_c = max(0, j - 1), min(n_cells, j + 2)
        lo_n, hi_n = lo_c * deg, hi_c * deg     # window nodes [lo_n, hi_n]
        C[lo_n + 1:hi_n, j] = 1.0

    A_lod = C.T @ A @ C
    rhs_lod = C.T @ f
    sol_lod = np.linalg.solve(A_lod, rhs_lod)

    assert abs(np.linalg.norm(A_lod) - frob_golden) < 5e-4 * frob_golden
    np.testing.assert_allclose(rhs_lod, rhs_golden, atol=5.1e-4)
    # solution entries print %.3e -> tolerance scales with the exponent
    tol = 0.51e-3 * 10.0 ** np.floor(np.log10(np.abs(sol_golden)))
    assert (np.abs(sol_lod - sol_golden) <= tol).all(), sol_lod
