"""SLOD stabilization tests — validates the SVD boundary-trace least
squares (reference source/LOD.cc:596-757) against a literal NumPy
brute-force, and the super-localization property end-to-end."""

import numpy as np
import pytest

from dealii_slod_tpu.config import SLODConfig, ReductionControl
from dealii_slod_tpu.models import LODSolver, DiffusionProblem, ElasticityProblem
from dealii_slod_tpu.utils.errors import error_norms


def brute_force_slod_phi(sol, p, coefs_patch):
    """Literal reference SLOD algorithm (LOD.cc:296-768 incl. :596-757) in
    NumPy for one patch, scalar diffusion."""
    topo, g, et = sol.topo, sol.grid, sol.et
    sc = topo.classes[topo.class_of_patch[p]]
    n = sc.n_nodes_local
    alpha = coefs_patch["alpha"]
    A = np.zeros((n, n))
    for s_ in range(sc.n_sub_local):
        A[np.ix_(sc.conn[s_], sc.conn[s_])] += np.einsum(
            "q,qij->ij", alpha[s_], et.K_grad)
    A_unconstrained = A.copy()
    PT = sc.PT_node_cell.copy()
    is99, isdom = topo.edge_node_flags(np.array([p]), sc)
    is99, isdom = is99[0], isdom[0]
    bset = sc.edge_nodes[is99]
    dset = sc.edge_nodes[isdom]
    internal = sc.interior_nodes
    # PT_boundary / S_boundary extracted BEFORE zeroing (LOD.cc:498-528)
    PT_b = PT[bset].copy()
    S_b = A_unconstrained[np.ix_(bset, internal)]
    PT[bset] = 0.0
    PT[dset] = 0.0
    for j in dset:
        A[j, :] = 0; A[j, j] = 1
    A_semi = A.copy()
    for j in bset:
        A[j, :] = 0; A[j, j] = 1
    AiPT = np.linalg.solve(A, PT)
    T = PT.T @ AiPT / g.H ** 2
    Tinv = np.linalg.inv(T)
    cen = topo.central_cell_local[p]
    cD = sc.n_cells_local

    AiPT_int = AiPT[internal]
    B_full = S_b @ AiPT_int
    BD = (B_full - PT_b) @ Tinv
    b0 = BD[:, cen]
    other = [k for k in range(cD) if k != cen]
    newBD = BD[:, other]
    G = newBD.T @ newBD
    g0 = newBD.T @ b0
    U, sig, Vt = np.linalg.svd(G)
    inv_sig = np.where(sig > 1e-15 * sig[0], 1.0 / sig, 0.0)
    d = -(Vt.T * inv_sig) @ (U.T @ g0)
    # sigma-truncation loop (LOD.cc:703-725)
    for i in range(len(other) - 1, -1, -1):
        if np.abs(d).max() < 0.5:
            break
        d = d + inv_sig[i] * Vt[i] * (U[:, i] @ g0)
    coeff = np.zeros(cD)
    coeff[cen] = 1.0
    for k, o in enumerate(other):
        coeff[o] = d[k]
    phi_int = AiPT_int @ (Tinv @ coeff)
    phi = np.zeros(n)
    phi[internal] = phi_int
    phi /= np.linalg.norm(phi)
    Aphi = A_semi @ phi
    Aphi[dset] = 0.0
    return phi, Aphi, sc


@pytest.mark.parametrize("constant", [True, False])
def test_slod_kernel_vs_bruteforce(constant):
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=constant, coef_seed=7)
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.compute_basis()
    alpha_glob = np.asarray(sol.coef_q["alpha"])
    Gd = sol.canvas_dims
    for p in [0, 1, 5, 15]:
        sc = sol.topo.classes[sol.topo.class_of_patch[p]]
        gsub = sol.topo.global_subcell_indices(np.array([p]), sc)[0]
        ap = alpha_glob[gsub]
        if constant and sc.n_cells_local == 9:
            # cache semantics: full-size patches reuse the first one's field
            sc0 = sol.topo.classes[sol.topo.class_of_patch[5]]
            ap = alpha_glob[sol.topo.global_subcell_indices(
                np.array([5]), sc0)[0]]
        phi_ref, Aphi_ref, sc = brute_force_slod_phi(
            sol, p, {"alpha": ap})
        off = sol.canvas_off[p]
        nd = sc.node_dims_local
        canvas = np.asarray(sol.Phi[p, :, 0, 0]).reshape(tuple(Gd[::-1]))
        block = canvas[off[1]:off[1] + nd[1], off[0]:off[0] + nd[0]].reshape(-1)
        # sign of the basis function is SVD-determined; compare up to sign
        sign = np.sign(block @ phi_ref) or 1.0
        np.testing.assert_allclose(block, sign * phi_ref, atol=1e-12)
        acanvas = np.asarray(sol.APhi[p, :, 0, 0]).reshape(tuple(Gd[::-1]))
        ablock = acanvas[off[1]:off[1] + nd[1],
                         off[0]:off[0] + nd[0]].reshape(-1)
        np.testing.assert_allclose(ablock, sign * Aphi_ref, atol=1e-10)


def _solve_error(stab, ell, **kw):
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=4,
                     oversampling=ell, rhs="2*pi^2*sin(pi*x)*sin(pi*y)",
                     exact_solution="sin(pi*x)*sin(pi*y)", bc="0",
                     lod_stabilization=stab,
                     coarse_solver=ReductionControl(2000, 1e-14, 1e-12), **kw)
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.compute_basis(); sol.assemble_coarse_operator()
    sol.assemble_fine_rhs(); sol.solve_coarse(); sol.prolong_lod_solution()
    return error_norms(sol.grid, sol.et, np.asarray(sol.conn),
                       np.asarray(sol.lod_solution),
                       exact=sol.parse(cfg.exact_solution),
                       qpts=sol.qpts)["L2"]


def test_slod_superlocalization():
    """Stabilization must beat plain LOD by a large factor at small l —
    the entire point of SLOD."""
    lod = _solve_error(False, 1, constant_coefficients=True)
    slod = _solve_error(True, 1, constant_coefficients=True)
    assert slod < lod / 20, (lod, slod)
    assert slod < 5e-3


def test_slod_high_contrast():
    """SLOD with a rough high-contrast coefficient still tracks the fine
    FEM solution (no NaNs, bounded error)."""
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=4,
                     oversampling=2, rhs="1", bc="0",
                     lod_stabilization=True, constant_coefficients=False,
                     coef_seed=11,
                     coarse_solver=ReductionControl(2000, 1e-14, 1e-12))
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    res = sol.run()
    err = res["error_LOD_FEMh"].rows[0][2]["L2"]
    femn = float(np.sqrt((np.asarray(res["fem_solution"]) ** 2).sum()))
    assert np.isfinite(err)
    assert err < 0.1 * femn, (err, femn)


def test_slod_elasticity_runs():
    cfg = SLODConfig(dim=2, n_global_refinements=2, n_subdivisions=2,
                     oversampling=1, rhs="1; 1", bc="0",
                     lod_stabilization=True, constant_coefficients=True)
    sol = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
    res = sol.run()
    assert np.isfinite(np.asarray(res["lod_solution"])).all()
