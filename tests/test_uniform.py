"""Uniform padded kernel == per-shape-class kernels.

The uniform kernel (one shape class, masks as data) must reproduce the
per-class kernels (exact window sizes, the form validated against the
literal reference algorithm) bit-closely on every patch, for LOD and SLOD,
scalar and vector, constant and random coefficients, 2D and 3D."""

import numpy as np
import jax.numpy as jnp
import pytest

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import LODSolver, DiffusionProblem, ElasticityProblem


def _both(probcls, **kw):
    sols = []
    for mode in ("classes", "uniform"):
        cfg = SLODConfig(kernel_mode=mode, **kw)
        sol = LODSolver(cfg, probcls(cfg), verbose=False)
        sol.compute_basis()
        sols.append(sol)
    return sols


@pytest.mark.parametrize("stab,constant",
                         [(False, True), (True, True), (True, False)])
def test_uniform_matches_classes_2d(stab, constant):
    a, b = _both(DiffusionProblem, dim=2, n_global_refinements=2,
                 n_subdivisions=2, oversampling=2, lod_stabilization=stab,
                 constant_coefficients=constant, coef_seed=5)
    # the SLOD pseudo-inverse goes through the Gram matrix BD^T BD
    # (reference semantics, LOD.cc:660-667), whose squared conditioning
    # limits cross-implementation agreement to ~1e-8
    tol = 3e-7 if stab else 1e-11
    np.testing.assert_allclose(np.asarray(a.Phi), np.asarray(b.Phi),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(a.APhi), np.asarray(b.APhi),
                               atol=max(tol, 1e-9) * 30)


def test_uniform_matches_classes_elasticity():
    a, b = _both(ElasticityProblem, dim=2, n_global_refinements=2,
                 n_subdivisions=2, oversampling=1, lod_stabilization=True,
                 constant_coefficients=False, coef_seed=2)
    np.testing.assert_allclose(np.asarray(a.Phi), np.asarray(b.Phi),
                               atol=3e-7)
    np.testing.assert_allclose(np.asarray(a.APhi), np.asarray(b.APhi),
                               atol=1e-5)


def test_uniform_matches_classes_3d():
    a, b = _both(DiffusionProblem, dim=3, n_global_refinements=2,
                 n_subdivisions=2, oversampling=1, lod_stabilization=True,
                 constant_coefficients=False, coef_seed=4)
    np.testing.assert_allclose(np.asarray(a.Phi), np.asarray(b.Phi),
                               atol=3e-7)
    np.testing.assert_allclose(np.asarray(a.APhi), np.asarray(b.APhi),
                               atol=1e-5)


def test_uniform_full_domain_patches():
    """When l >= N some/all patches cover the whole domain; the SLOD branch
    must degenerate to the LOD candidate there (reference LOD.cc:563-564)."""
    a, b = _both(DiffusionProblem, dim=2, n_global_refinements=2,
                 n_subdivisions=2, oversampling=4, lod_stabilization=True,
                 constant_coefficients=True)
    np.testing.assert_allclose(np.asarray(a.Phi), np.asarray(b.Phi),
                               atol=1e-11)


def test_uniform_chunked_build_step():
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, kernel_mode="uniform",
                     patch_chunk=7)
    sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
    sol.assemble_fine_rhs()
    import jax
    u1, _ = jax.jit(sol.build_step())(sol.coef_q, sol.fem_rhs)
    cfg2 = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                      oversampling=1, lod_stabilization=True,
                      constant_coefficients=False, kernel_mode="classes")
    sol2 = LODSolver(cfg2, DiffusionProblem(cfg2), verbose=False)
    sol2.assemble_fine_rhs()
    u2, _ = jax.jit(sol2.build_step())(sol2.coef_q, sol2.fem_rhs)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-9)


def test_chunk_scan_matches_chunk_loop():
    """The single-dispatch lax.scan over basis chunks must be bit-identical
    to the per-chunk python loop (it runs the same chunk kernel)."""
    import numpy as np
    from dealii_slod_tpu.config import SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    kw = dict(dim=2, n_global_refinements=3, n_subdivisions=2,
              oversampling=2, lod_stabilization=True,
              constant_coefficients=False, coef_seed=0, patch_chunk=16)
    a = LODSolver(SLODConfig(**kw, chunk_scan=True),
                  DiffusionProblem(SLODConfig(**kw)), verbose=False)
    b = LODSolver(SLODConfig(**kw, chunk_scan=False),
                  DiffusionProblem(SLODConfig(**kw)), verbose=False)
    Pa, Aa = a.compute_basis()
    Pb, Ab = b.compute_basis()
    np.testing.assert_array_equal(np.asarray(Pa), np.asarray(Pb))
    np.testing.assert_array_equal(np.asarray(Aa), np.asarray(Ab))


def test_coef_windows_match_explicit():
    """_coef_windows (strided slice-stacks) == explicit numpy window
    extraction with zero outside the domain, and the full pipeline gives
    identical basis canvases with windows on/off (the gather path masks
    out-of-window subcells in prep, so Phi agrees although the raw clamped
    gather rows differ)."""
    import numpy as np
    import jax.numpy as jnp
    from dealii_slod_tpu.config import SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    for dim, refine in [(2, 3), (3, 2)]:
        cfg = SLODConfig(dim=dim, n_global_refinements=refine,
                         n_subdivisions=2, oversampling=1,
                         lod_stabilization=True, constant_coefficients=False,
                         coef_seed=1, rhs="1", bc="0")
        sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
        coef = np.asarray(sol.coef_q["alpha"])          # (n_fine_cells, nq)
        cw = np.asarray(sol._coef_windows(jnp.asarray(coef)))
        s, ell, N = cfg.n_subdivisions, cfg.oversampling, cfg.n_coarse
        win = (2 * ell + 1) * s
        dims = np.asarray(sol.grid.fine_cell_dims)
        # explicit: window of patch p starts at (coarse coords)*s - ell*s
        from dealii_slod_tpu.grid import cartesian_coords, ravel
        centers = cartesian_coords(np.full(dim, N))
        offs = cartesian_coords(np.full(dim, win))
        for p in [0, sol.topo.n_patches // 2, sol.topo.n_patches - 1]:
            lo = centers[p] * s - ell * s
            cells = lo[None, :] + offs                   # (n_sub, dim)
            inside = ((cells >= 0) & (cells < dims)).all(axis=1)
            idx = ravel(np.clip(cells, 0, dims - 1), dims)
            expect = np.where(inside[:, None], coef[idx], 0.0)
            np.testing.assert_allclose(cw[p], expect, rtol=0, atol=0)

        sol.compute_basis()
        phi_w = np.asarray(sol.Phi)
        cfg2 = SLODConfig(**{**cfg.__dict__, "coef_windows": False})
        sol2 = LODSolver(cfg2, DiffusionProblem(cfg2), verbose=False)
        sol2.compute_basis()
        np.testing.assert_allclose(phi_w, np.asarray(sol2.Phi),
                                   rtol=1e-10, atol=1e-12)


def test_rhs_windows_match_gather_contraction():
    """Phi^T (rhs windows) == Phi^T (clamped canvas gather): the windows
    are zero outside the domain exactly where Phi vanishes."""
    import numpy as np
    import jax.numpy as jnp
    from dealii_slod_tpu.config import SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    for dim in (2, 3):
        cfg = SLODConfig(dim=dim, n_global_refinements=2, n_subdivisions=2,
                         oversampling=1, lod_stabilization=True,
                         constant_coefficients=False, coef_seed=2,
                         rhs="1 + x*y", bc="0")
        sol = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
        sol.assemble_fine_rhs()
        sol.compute_basis()
        fw = sol._rhs_windows(sol.fem_rhs)
        fg = sol.fem_rhs[sol.canvas_gidx]
        a = np.asarray(jnp.einsum("pncd,pnc->pd", sol.Phi, fw))
        b = np.asarray(jnp.einsum("pncd,pnc->pd", sol.Phi, fg))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-13)
