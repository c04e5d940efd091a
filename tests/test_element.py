"""Element-tensor and assembly tests — mirrors reference tests
fe_q_iso_q1_01.cc (subcell-loop == full assembly, scalar) and
fe_q_iso_q1_02.cc (vector/elasticity form, <= 1e-16 agreement)."""

import numpy as np
import jax.numpy as jnp

from dealii_slod_tpu.grid import GridSpec, ShapeClass
from dealii_slod_tpu.ops.assembly import (assemble_dense, assemble_load_vector,
                                          make_subcell_matrices)
from dealii_slod_tpu.ops.element import ElementTensors, quad_points_global


def q1_laplace_2d():
    """Known closed-form Q1 Laplace element matrix on a square (any h),
    lexicographic node order (0,0),(1,0),(0,1),(1,1)."""
    return np.array([
        [2 / 3, -1 / 6, -1 / 6, -1 / 3],
        [-1 / 6, 2 / 3, -1 / 3, -1 / 6],
        [-1 / 6, -1 / 3, 2 / 3, -1 / 6],
        [-1 / 3, -1 / 6, -1 / 6, 2 / 3],
    ])


def test_scalar_stiffness_2d_closed_form():
    et = ElementTensors(dim=2, h=0.25)
    K = et.K_grad.sum(axis=0)  # alpha == 1
    np.testing.assert_allclose(K, q1_laplace_2d(), atol=1e-15)


def test_scalar_stiffness_3d_properties():
    et = ElementTensors(dim=3, h=0.5)
    K = et.K_grad.sum(axis=0)
    # symmetric, zero row sums (constants in kernel), known diagonal h/3
    np.testing.assert_allclose(K, K.T, atol=1e-15)
    np.testing.assert_allclose(K.sum(axis=1), 0, atol=1e-15)
    np.testing.assert_allclose(np.diag(K), 0.5 / 3.0, atol=1e-15)


def test_mass_matrix_2d():
    h = 0.1
    et = ElementTensors(dim=2, h=h)
    M = et.M.sum(axis=0)
    # Q1 mass matrix h^2/36 * [[4,2,2,1],...]
    Mref = (h * h / 36.0) * np.array([
        [4, 2, 2, 1], [2, 4, 1, 2], [2, 1, 4, 2], [1, 2, 2, 4]])
    np.testing.assert_allclose(M, Mref, atol=1e-16)


def test_load_vector_exact_for_constant():
    h = 0.2
    et = ElementTensors(dim=2, h=h)
    R = et.R.sum(axis=0)
    np.testing.assert_allclose(R, h * h / 4, atol=1e-16)


def naive_assemble_scalar(g: GridSpec, sc: ShapeClass, alpha_q: np.ndarray):
    """Independent naive reference: loop subcells/qpoints/nodes in Python."""
    et = ElementTensors(g.dim, g.h)
    n = sc.n_nodes_local
    A = np.zeros((n, n))
    for s_ in range(sc.n_sub_local):
        for q in range(et.K_grad.shape[0]):
            for a in range(2 ** g.dim):
                for b in range(2 ** g.dim):
                    A[sc.conn[s_, a], sc.conn[s_, b]] += (
                        alpha_q[s_, q] * et.K_grad[q, a, b])
    return A


def test_dense_patch_assembly_vs_naive():
    g = GridSpec(dim=2, n_coarse=4, n_sub=2)
    sc = ShapeClass((2, 3), g)
    rng = np.random.default_rng(0)
    alpha_q = rng.uniform(1.0, 100.0, (sc.n_sub_local, 4))
    et = ElementTensors(g.dim, g.h)
    Ksub = make_subcell_matrices(et, {"alpha": jnp.asarray(alpha_q)})
    A = assemble_dense(Ksub, jnp.asarray(sc.assembly_flat_idx),
                       sc.n_fine_dofs_local)
    A_ref = naive_assemble_scalar(g, sc, alpha_q)
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-13, atol=1e-15)


def test_elasticity_element_matrix_properties():
    # mirrors fe_q_iso_q1_02.cc: the vector subcell assembly must agree with
    # an independent formulation; here: check against the explicit
    # 2mu eps:eps + lam div div quadrature in numpy.
    g = GridSpec(dim=2, n_coarse=4, n_sub=2, n_components=2)
    et = ElementTensors(dim=2, h=g.h, n_components=2)
    rng = np.random.default_rng(1)
    mu = rng.uniform(1, 100, 4)
    lam = rng.uniform(1, 100, 4)
    K = (np.einsum("q,qIJ->IJ", mu, et.K_mu)
         + np.einsum("q,qIJ->IJ", lam, et.K_lam))
    # independent: build from V/G
    m = 4
    D = 2
    Kref = np.zeros((m * D, m * D))
    for q in range(4):
        for i in range(m):
            for di in range(D):
                for j in range(m):
                    for dj in range(D):
                        gi, gj = et.G[q, i], et.G[q, j]
                        eps = 0.5 * (gi[dj] * gj[di]
                                     + (di == dj) * gi @ gj) * 2
                        div = gi[di] * gj[dj]
                        Kref[i * D + di, j * D + dj] += (
                            mu[q] * eps + lam[q] * div) * et.w[q]
    np.testing.assert_allclose(K, Kref, rtol=1e-13)
    # symmetry + rigid-body modes (translations) in kernel
    Kc = et.K_mu.sum(axis=0) + et.K_lam.sum(axis=0)
    np.testing.assert_allclose(Kc, Kc.T, atol=1e-14)
    for d in range(D):
        t = np.zeros(m * D)
        t[d::D] = 1.0
        np.testing.assert_allclose(Kc @ t, 0, atol=1e-13)


def test_quad_points_global_layout():
    g = GridSpec(dim=2, n_coarse=2, n_sub=2)
    pts = quad_points_global(g)
    assert pts.shape == (16, 4, 2)
    # all points strictly inside their subcell
    sub = pts // g.h
    for q in range(4):
        assert np.array_equal(sub[:, q, :], sub[:, 0, :])


def test_load_vector_global_constant_f():
    # f == 1 on N=4, s=2 grid: interior node rhs = h^2, matching the golden
    # fem rhs l2 norm = 7/64 = 0.109375 once boundary rows are zeroed
    # (tests/Poisson_LOD_Example.output:3)
    g = GridSpec(dim=2, n_coarse=4, n_sub=2)
    sc = ShapeClass((4, 4), g)  # whole domain as one "patch"
    et = ElementTensors(g.dim, g.h)
    f_q = np.ones((sc.n_sub_local, 4, 1))
    rhs = assemble_load_vector(et, jnp.asarray(sc.conn), jnp.asarray(f_q),
                               sc.n_nodes_local)
    rhs = np.array(rhs)[:, 0]
    bnd = ((sc.node_coords_local == 0)
           | (sc.node_coords_local == 8)).any(axis=1)
    rhs[bnd] = 0.0
    np.testing.assert_allclose(np.linalg.norm(rhs), 0.109375, rtol=1e-14)
