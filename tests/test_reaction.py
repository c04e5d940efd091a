"""Reaction-diffusion problem family (-div(alpha grad u) + c u = f) —
beyond the reference's physics set; validates the named-coefficient
extension path (the "creact" -> mass-tensor pair flows through banded patch
assembly, SLOD stabilization, the stencil coarse operator and the
matrix-free fine solve with no special-casing)."""

import jax.numpy as jnp
import numpy as np

from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import LODSolver, ReactionDiffusionProblem
from dealii_slod_tpu.ops.assembly import (assemble_bands,
                                          make_band_tensors,
                                          make_subcell_matrices)
from dealii_slod_tpu.ops.element import ElementTensors

from tests.test_pipeline import _explicit_C_matrices


def test_subcell_matrices_are_stiffness_plus_mass():
    et = ElementTensors(dim=2, h=0.25)
    ones = jnp.ones((4, 4), jnp.float64)
    K = np.asarray(make_subcell_matrices(et, {"alpha": ones}))
    KM = np.asarray(make_subcell_matrices(et, {"alpha": ones,
                                               "creact": 2.0 * ones}))
    M_exact = np.asarray(et.M).sum(axis=0)          # sum over qpoints
    np.testing.assert_allclose(KM - K, np.broadcast_to(2.0 * M_exact,
                                                       KM.shape),
                               rtol=1e-14, atol=1e-15)
    # mass matrix row sums = integral of the shape function = (h/1)^dim
    np.testing.assert_allclose(M_exact.sum(axis=1), 0.25 ** 2 / 4,
                               rtol=1e-14)


def test_reaction_bands_match_subcell_scatter():
    et = ElementTensors(dim=2, h=0.5)
    bt = make_band_tensors(et)
    rng = np.random.default_rng(3)
    alpha = jnp.asarray(rng.uniform(1, 5, (4, 4)))
    creact = jnp.asarray(rng.uniform(0, 3, (4, 4)))
    band = assemble_bands({"alpha": alpha, "creact": creact}, bt, (2, 2))
    # brute force: scatter subcell (K + cM) into the 3x3-node dense matrix
    Ksub = np.asarray(make_subcell_matrices(
        et, {"alpha": alpha, "creact": creact}))
    cells = np.array([[0, 0], [1, 0], [0, 1], [1, 1]])
    A = np.zeros((9, 9))
    for s, (cx, cy) in enumerate(cells):
        nodes = [(cx + i) + 3 * (cy + j) for j in (0, 1) for i in (0, 1)]
        for a in range(4):
            for b in range(4):
                A[nodes[a], nodes[b]] += Ksub[s, a, b]
    offs = [(i, j) for j in (-1, 0, 1) for i in (-1, 0, 1)]
    band_np = np.asarray(band)[..., 0, 0]
    for n in range(9):
        x, y = n % 3, n // 3
        for o, (ox, oy) in enumerate(offs):
            xx, yy = x + ox, y + oy
            if 0 <= xx < 3 and 0 <= yy < 3:
                np.testing.assert_allclose(band_np[n, o], A[n, xx + 3 * yy],
                                           rtol=1e-13, atol=1e-14)


def test_reaction_stencil_equals_explicit_triple_product():
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=5,
                     coef_refinement=3, rhs="1", bc="0",
                     reaction="1 + x*y")
    sol = LODSolver(cfg, ReactionDiffusionProblem(cfg), verbose=False)
    sol.compute_basis()
    sol.assemble_coarse_operator()
    Cmat, ACmat = _explicit_C_matrices(sol)
    A_ref = (Cmat.T @ ACmat).toarray()
    P = sol.topo.n_patches
    A_st = np.asarray(sol.A_stencil)
    nbr = np.asarray(sol.stencil_nbr)
    valid = np.asarray(sol.stencil_valid)
    A_full = np.zeros((P, P))
    for q in range(P):
        for k in range(sol.n_stencil):
            if valid[q, k]:
                A_full[q, nbr[q, k]] = A_st[q, k, 0, 0]
    np.testing.assert_allclose(A_full, A_ref, rtol=1e-9, atol=1e-11)


def test_reaction_manufactured_convergence():
    """u = sin(pi x) sin(pi y), alpha = 1, c = 1:
    f = (2 pi^2 + 1) u.  FEMh converges at 2nd order; LOD tracks FEMh."""
    errs_fem, errs_lod = [], []
    for r, ell in ((2, 1), (3, 2)):
        cfg = SLODConfig(
            dim=2, n_global_refinements=r, n_subdivisions=2,
            oversampling=ell, lod_stabilization=True,
            constant_coefficients=True, reaction="1",
            rhs="(2*pi^2 + 1)*sin(pi*x)*sin(pi*y)",
            exact_solution="sin(pi*x)*sin(pi*y)", bc="0", dtype="float64",
            solve_fine_problem=True,
            fine_solver=ReductionControl(8000, 1e-12, 1e-12),
            coarse_solver=ReductionControl(4000, 1e-12, 1e-12))
        sol = LODSolver(cfg, ReactionDiffusionProblem(cfg), verbose=False)
        sol.compute_basis()
        sol.assemble_coarse_operator()
        sol.assemble_fine_rhs()
        sol.solve_coarse()
        sol.solve_fine_fem()
        u = np.asarray(sol.prolong_lod_solution())
        uf = np.asarray(sol.fem_solution)
        x = np.asarray(sol.grid.node_coords())
        exact = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
        errs_fem.append(np.abs(uf[:, 0] - exact).max())
        errs_lod.append(np.linalg.norm(u - uf) / np.linalg.norm(uf))
    assert errs_fem[0] / errs_fem[1] > 3.5          # ~4x per halving
    assert errs_lod[0] / errs_lod[1] > 4            # LOD-vs-FEMh decays


def test_reaction_inhomogeneous_dirichlet():
    """g != 0 through the reaction path: the lifting elimination must carry
    the mass term too (FineOperator applies alpha AND creact).  Exact
    u = sin(pi x) sin(pi y) + y, alpha = 1, c = 1:
    f = (2 pi^2 + 1) sin sin + y, bc = y on the boundary."""
    errs = []
    for r, ell in ((2, 1), (3, 2)):
        cfg = SLODConfig(
            dim=2, n_global_refinements=r, n_subdivisions=2,
            oversampling=ell, lod_stabilization=True,
            constant_coefficients=True, reaction="1",
            rhs="(2*pi^2 + 1)*sin(pi*x)*sin(pi*y) + y", bc="y",
            exact_solution="sin(pi*x)*sin(pi*y) + y", dtype="float64",
            solve_fine_problem=True,
            fine_solver=ReductionControl(8000, 1e-12, 1e-12),
            coarse_solver=ReductionControl(4000, 1e-12, 1e-12))
        sol = LODSolver(cfg, ReactionDiffusionProblem(cfg), verbose=False)
        sol.compute_basis()
        sol.assemble_coarse_operator()
        sol.assemble_fine_rhs()
        sol.solve_coarse()
        sol.solve_fine_fem()
        u = np.asarray(sol.prolong_lod_solution())
        uf = np.asarray(sol.fem_solution)
        x = np.asarray(sol.grid.node_coords())
        bnd = np.asarray(sol.grid.boundary_node_mask())
        np.testing.assert_allclose(u[bnd, 0], x[bnd, 1], atol=1e-12)
        errs.append(np.linalg.norm(u - uf) / np.linalg.norm(uf))
    assert errs[0] / errs[1] > 4, errs


def test_reaction_varying_c_with_constant_alpha_symmetric():
    """constant_coefficients=True (constant alpha) + x-dependent reaction
    coefficient: the LOD.cc:354-361 stiffness-cache redirect must NOT fire
    (c(x) makes patch operators translation-variant) — caught as a ~1e-4
    coarse-operator asymmetry by the r4 extended property sweep."""
    import numpy as np
    from dealii_slod_tpu.config import SLODConfig
    from dealii_slod_tpu.models import LODSolver, ReactionDiffusionProblem
    from tests.test_pipeline import _explicit_C_matrices

    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=False,
                     constant_coefficients=True, reaction="1 + x",
                     rhs="1", bc="0", dtype="float64", write_output=False)
    sol = LODSolver(cfg, ReactionDiffusionProblem(cfg), verbose=False)
    sol.compute_basis()
    sol.assemble_coarse_operator()
    Cmat, ACmat = _explicit_C_matrices(sol)
    A_ref = (Cmat.T @ ACmat).toarray()
    P, C = sol.topo.n_patches, sol.C
    A_st = np.asarray(sol.A_stencil)
    nbr, valid = np.asarray(sol.stencil_nbr), np.asarray(sol.stencil_valid)
    A_full = np.zeros((P * C, P * C))
    for q in range(P):
        for k in range(sol.n_stencil):
            if valid[q, k]:
                A_full[q*C:(q+1)*C, nbr[q, k]*C:(nbr[q, k]+1)*C] = A_st[q, k]
    scale = np.abs(A_full).max()
    assert np.abs(A_full - A_full.T).max() < 1e-12 * scale
    np.testing.assert_allclose(A_full, A_ref, rtol=1e-9, atol=1e-12 * scale)
