"""The SLOD/LOD pipeline: batched basis construction, coarse-operator
assembly, coarse + fine solves, error tables.

TPU-native re-design of the reference ``LOD<dim, spacedim>`` engine
(reference include/LOD.h:159-262, source/LOD.cc) — same mathematics, batched
dataflow:

- ``compute_basis_function_candidates`` (source/LOD.cc:296-768), the hot
  per-patch loop, becomes one jitted, ``vmap``-ped kernel per patch *shape
  class*: dense Q_iso_Q1 assembly by static scatter-add, multi-RHS Cholesky
  solve of the SPD internal submatrix (replacing Amesos KLU on the
  row-cleared operator — mathematically identical because the cleared rows
  carry zero right-hand sides, LOD.cc:512-544), the coarse triple product
  + inverse, and (optionally) the SLOD boundary-trace least squares with
  SVD truncation (LOD.cc:596-757).
- ``assemble_global_matrix`` (LOD.cc:860-973) becomes a *stencil-form*
  coarse operator: each basis function lives on a fixed-size canvas grid and
  ``A_LOD[(q,dq),(p,dp)] = phi_q . (A phi_p)`` is a batch of static-slice
  dot products over canvas overlaps — no sparse matrices anywhere.
- ``solve`` (CG+SSOR, LOD.cc:976-1002) becomes matrix-free CG with Jacobi
  preconditioning on the stencil operator; ``assemble_and_solve_fem_problem``
  (LOD.cc:1004-1238) becomes a matrix-free fine-grid CG-Jacobi solve plus a
  small dense coarse-FEM comparison solve.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.grid import (GridSpec, PatchTopology, ShapeClass,
                                  cartesian_coords, global_connectivity, ravel)
from dealii_slod_tpu.ops.assembly import (FineOperator, assemble_dense,
                                          assemble_load_vector,
                                          make_subcell_matrices)
from dealii_slod_tpu.ops.element import ElementTensors, quad_points_global
from dealii_slod_tpu.ops.solvers import (cg, cholesky_factor, cholesky_solve,
                                         dense_dirichlet_solve, spd_inverse)
from dealii_slod_tpu.utils.errors import ConvergenceTable, error_norms
from dealii_slod_tpu.utils.timers import StageTimer


def _rev(dims) -> tuple:
    """Spatial dims in array-axis order (axis 0 fastest => last array axis)."""
    return tuple(int(d) for d in np.asarray(dims)[::-1])


class LODSolver:
    """Orchestrates the full pipeline (reference LOD::run, LOD.cc:1423-1467)."""

    def __init__(self, cfg: SLODConfig, problem, verbose: bool = True):
        self.cfg = cfg
        self.problem = problem
        self.verbose = verbose
        self.timer = StageTimer()
        C = problem.n_components
        self.C = C
        self.grid = GridSpec(cfg.dim, cfg.n_coarse, cfg.n_subdivisions, C)
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        with self.timer.section("1: create patches"):
            self.topo = PatchTopology(self.grid, cfg.oversampling)
        self.et = ElementTensors(cfg.dim, self.grid.h, C)

        # global quadrature data (coefficients + rhs at quadrature points,
        # cf. reference value_list calls, Diffusion.h:151-154)
        qpts = quad_points_global(self.grid)           # (n_fine_cells, nq, dim)
        self.qpts = qpts
        self.coef_q = {k: jnp.asarray(v, self.dtype)
                       for k, v in problem.coefficients(qpts).items()}
        self.coef_names = sorted(self.coef_q.keys())
        self.conn = jnp.asarray(global_connectivity(self.grid))

        # canvas geometry: every basis function is stored on a fixed
        # (2l+1)s+1 per-axis node grid anchored at (center - l)*s, so that
        # the canvas shift between patches q and p = q + delta is exactly
        # delta*s — static per stencil offset, clipping-independent.
        ell = cfg.oversampling
        s = cfg.n_subdivisions
        self.canvas_dims = np.full(cfg.dim, (2 * ell + 1) * s + 1,
                                   dtype=np.int64)
        self.canvas_n = int(self.canvas_dims.prod())
        centers = cartesian_coords(self.grid.cell_dims)
        self.anchor_nodes = (centers - ell) * s        # may be negative
        self.canvas_off = (ell - (centers - self.topo.patch_lo)) * s
        canvas_coords = cartesian_coords(self.canvas_dims)
        gcoords = (self.anchor_nodes[:, None, :] + canvas_coords[None, :, :])
        gcoords = np.clip(gcoords, 0, self.grid.nodes_per_axis - 1)
        # clamped: out-of-window canvas nodes hold phi = 0, so clamped
        # gathers/scatters contribute nothing.
        self.canvas_gidx = jnp.asarray(
            ravel(gcoords, self.grid.node_dims).astype(np.int32))

        # stencil neighbor table: windows of q and p overlap iff
        # |center_p - center_q|_inf <= 2l
        R = min(2 * ell, cfg.n_coarse - 1)
        self.stencil_R = R
        offsets = cartesian_coords(np.full(cfg.dim, 2 * R + 1)) - R
        self.stencil_offsets = offsets                 # (S, dim)
        self.n_stencil = len(offsets)
        nb_coords = centers[:, None, :] + offsets[None, :, :]
        valid = ((nb_coords >= 0) & (nb_coords < cfg.n_coarse)).all(axis=-1)
        nb = ravel(np.clip(nb_coords, 0, cfg.n_coarse - 1),
                   self.grid.cell_dims)
        self.stencil_nbr = jnp.asarray(np.where(valid, nb, 0).astype(np.int32))
        self.stencil_valid = jnp.asarray(valid)
        self.center_offset_idx = int(np.nonzero((offsets == 0).all(axis=1))[0][0])

        # the uniform kernel pads every patch to the full (2l+1)-cell canvas
        # window with data-driven masks — one shape class, one compiled
        # kernel, one uniform batch (SURVEY.md §7 'ragged boundary patches')
        self.canvas_class = ShapeClass((2 * ell + 1,) * cfg.dim, self.grid)
        self.canvas_center_cell = int(ravel(np.full(cfg.dim, ell),
                                            np.full(cfg.dim, 2 * ell + 1)))

        self._class_kernels: Dict[int, callable] = {}
        self._uniform_kernel_cache = None
        self.log = (lambda *a: print(*a)) if verbose else (lambda *a: None)

    def parse(self, spec):
        """Parse a function spec with the *problem's* component count (the
        config default n_components may not match, e.g. elasticity)."""
        from dealii_slod_tpu.config import ParsedFunction
        return ParsedFunction(spec, self.C, self.cfg.dim)

    # ------------------------------------------------------------------
    # Basis construction (reference compute_basis_function_candidates)
    # ------------------------------------------------------------------

    def _slod_active(self, sc: ShapeClass) -> bool:
        """SLOD stabilization gate (reference LOD.cc:563-564): skip when not
        requested, when oversampling == 0, or when the patch covers the whole
        domain (no patch-interior boundary)."""
        full_domain = sc.n_cells_local == self.grid.n_cells
        return (self.cfg.lod_stabilization and self.cfg.oversampling > 0
                and not full_domain)

    def _class_patch_fn(self, ci: int):
        """Single-patch basis function builder for shape class ``ci`` —
        traced under vmap (batched) by `_build_class_kernel` and under the
        fully-jitted pipeline step by `build_step`."""
        sc = self.topo.classes[ci]
        cfg, et, C = self.cfg, self.et, self.C
        dt = self.dtype
        slod = self._slod_active(sc)

        flat_idx = jnp.asarray(sc.assembly_flat_idx)
        int_dofs = jnp.asarray(sc.interior_dof_indices())
        edge_dofs = jnp.asarray(sc.edge_dof_indices())
        edge_nodes = jnp.asarray(sc.edge_nodes)
        PT = jnp.asarray(sc.PT, dt)
        PT_int = jnp.asarray(sc.PT_interior, dt)
        nD = sc.n_fine_dofs_local
        cD = sc.n_coarse_dofs_local
        n_nodes = sc.n_nodes_local
        Hdim = self.grid.H ** cfg.dim
        node_grid = _rev(sc.node_dims_local)
        canvas_grid = _rev(self.canvas_dims)
        thr = cfg.svd_threshold

        def slod_phi_int(A, Ainv_PT, Tinv, is99, central):
            """SLOD stabilized candidates (reference LOD.cc:596-757)."""
            mask99 = jnp.repeat(is99, C).astype(dt)            # (nE*C,)
            S_edge = A[edge_dofs[:, None], int_dofs[None, :]] * mask99[:, None]
            PT_edge = PT[edge_dofs] * mask99[:, None]
            # BD maps coarse candidate coefficients -> basis trace on the
            # patch boundary: BD = (S_b A_int^-1 PT_int - PT_b) T^-1
            # (LOD.cc:612-618; the reference realizes the minus sign by
            # PT_boundary *= -1 plus additive mmult)
            BD = (S_edge @ Ainv_PT - PT_edge) @ Tinv           # (nE*C, cD)
            cols = []
            for d in range(C):
                cen = central * C + d
                onehot = (jnp.arange(cD) == cen).astype(dt)
                colmask = 1.0 - onehot
                b0 = BD @ onehot                               # column 'cen'
                newBD = BD * colmask[None, :]
                G = newBD.T @ newBD                            # (cD, cD)
                g0 = newBD.T @ b0
                # pseudo-inverse via SVD with relative truncation
                # (compute_inverse_svd(1e-15), LOD.cc:667)
                U, sig, Vt = jnp.linalg.svd(G)
                inv_sig = jnp.where(sig > thr * sig[0], 1.0 / sig, 0.0)
                uv = U.T @ g0
                terms = (inv_sig * uv)[:, None] * Vt           # (cD, cD)
                d0 = -terms.sum(axis=0)
                # sigma-truncation conditioning loop (LOD.cc:703-725):
                # while ||d||_inf >= 0.5 add back the smallest-sigma
                # contributions; 'done' latches like the reference's break.
                def body(carry, term):
                    dvec, done = carry
                    done = done | (jnp.max(jnp.abs(dvec)) < 0.5)
                    dvec = jnp.where(done, dvec, dvec + term)
                    return (dvec, done), None
                (dvec, _), _ = jax.lax.scan(
                    body, (d0, jnp.asarray(False)), terms[::-1])
                dvec = dvec * colmask
                # candidate combination c = T^-1 (e_cen + sum_k d_k e_k)
                # (LOD.cc:727-743)
                c = Tinv @ (onehot + dvec)
                cols.append(Ainv_PT @ c)
            return jnp.stack(cols, axis=-1)                    # (nI*C, C)

        def one_patch(coef_list, is99, isdom, central, off):
            coefs = dict(zip(self.coef_names, coef_list))
            Ksub = make_subcell_matrices(et, coefs)
            A = assemble_dense(Ksub, flat_idx, nD)
            # SPD internal submatrix solve == the reference's row-cleared
            # operator + zeroed PT boundary rows (LOD.cc:512-546): boundary
            # unknowns are exactly zero, so solve on the interior block.
            A_int = A[int_dofs[:, None], int_dofs[None, :]]
            L = cholesky_factor(A_int)
            Ainv_PT = cholesky_solve(L, PT_int)                # (nI*C, cD)
            # P_tilde = P / H^dim (LOD.cc:548-553)
            T = (PT_int.T @ Ainv_PT) / Hdim
            Tinv = jnp.linalg.inv(T)
            if slod:
                phi_int = slod_phi_int(A, Ainv_PT, Tinv, is99, central)
            else:
                cen_dofs = central * C + jnp.arange(C)
                phi_int = Ainv_PT @ jnp.take(Tinv, cen_dofs, axis=1)
            # L2-normalize each basis function (LOD.cc:591, :752)
            norms = jnp.sqrt((phi_int ** 2).sum(axis=0))
            phi_int = phi_int / norms
            phi = jnp.zeros((nD, C), dt).at[int_dofs].set(phi_int)
            # premultiplied basis A_semi phi (LOD.cc:758-765): the
            # semi-constrained operator keeps patch-boundary rows but clears
            # domain-boundary rows (diag 1); phi vanishes on all boundary
            # nodes, so A_semi phi == (A phi) zeroed at domain-boundary dofs.
            Aphi = A @ phi
            dom_mask = jnp.zeros(n_nodes, bool).at[edge_nodes].set(isdom)
            Aphi = jnp.where(jnp.repeat(dom_mask, C)[:, None], 0.0, Aphi)

            # canvasize: place the patch block into the fixed-size canvas at
            # its per-patch offset
            def to_canvas(v):
                block = v.reshape(node_grid + (C, C))
                canvas = jnp.zeros(canvas_grid + (C, C), dt)
                starts = tuple(off[cfg.dim - 1 - a].astype(jnp.int32)
                               for a in range(cfg.dim)) \
                    + (jnp.int32(0), jnp.int32(0))
                canvas = jax.lax.dynamic_update_slice(canvas, block, starts)
                return canvas.reshape(self.canvas_n, C, C)

            return to_canvas(phi), to_canvas(Aphi)

        return one_patch

    def _build_class_kernel(self, ci: int):
        one_patch = self._class_patch_fn(ci)
        vfn = jax.vmap(one_patch, in_axes=([0] * len(self.coef_names),
                                           0, 0, 0, 0))

        def run(*args):
            with jax.default_matmul_precision(self.cfg.matmul_precision):
                return vfn(*args)

        return jax.jit(run)

    def _class_inputs(self, ci: int):
        """Static per-class batch inputs (NumPy): subcell gather indices
        (with the reference's cache semantics), edge flags, central cell,
        canvas offsets."""
        sc = self.topo.classes[ci]
        pids = self.topo.patches_by_class[ci]
        gsub = self.topo.global_subcell_indices(pids, sc).astype(np.int32)
        # patch-stiffness cache semantics (reference LOD.cc:354-361,
        # :433-451): with constant_coefficients, every full-size patch
        # reuses the stiffness of the *first* full-size patch — i.e. its
        # coefficient gather.  (A genuine no-op for truly constant
        # fields; bit-faithful to the reference's cache for random ones,
        # and a dedup/broadcast perf win either way.)
        if (self.cfg.constant_coefficients
                and sc.n_cells_local
                == (2 * self.cfg.oversampling + 1) ** self.cfg.dim):
            gsub = np.broadcast_to(gsub[:1], gsub.shape)
        is99_np, isdom_np = self.topo.edge_node_flags(pids, sc)
        return (pids, gsub, is99_np, isdom_np,
                self.topo.central_cell_local[pids],
                self.canvas_off[pids].astype(np.int32))

    # ------------------------------------------------------------------
    # Uniform padded kernel: one shape class, data-driven masks
    # ------------------------------------------------------------------

    def _uniform_inputs(self):
        """Per-patch inputs for the uniform kernel (NumPy): canvas-subcell
        gather indices (with the reference's full-size-patch cache
        semantics, LOD.cc:354-361), window node bounds in canvas coords,
        and domain-side flags."""
        g, topo, cfg = self.grid, self.topo, self.cfg
        sc = self.canvas_class
        anchors = self.anchor_nodes                          # (P, dim)
        coords = sc.sub_coords[None, :, :] + anchors[:, None, :]
        coords = np.clip(coords, 0, g.fine_cells_per_axis - 1)
        gsub = ravel(coords, g.fine_cell_dims).astype(np.int32)
        if cfg.constant_coefficients:
            full = (topo.patch_shape
                    == 2 * cfg.oversampling + 1).all(axis=1)
            if full.any():
                first = int(np.nonzero(full)[0][0])
                gsub[full] = gsub[first]
        nlo = self.canvas_off.astype(np.int32)               # (P, dim)
        nhi = (self.canvas_off
               + topo.patch_shape * cfg.n_subdivisions).astype(np.int32)
        return gsub, nlo, nhi, topo.side_is_domain

    def _uniform_core(self):
        """Shared per-patch closures of the uniform padded-canvas kernel:

        ``prep``   coefs+window -> assembled operators and masks,
        ``finish`` solve products -> stabilized basis canvases.

        `_uniform_patch_fn` composes them with an in-vmap Cholesky solve
        (the lax path); `_uniform_chunk_fn` splits them around the batched
        fused Pallas SPD multi-RHS kernel (ops/patch_solve.py)."""
        sc = self.canvas_class
        cfg, et, C = self.cfg, self.et, self.C
        dt = self.dtype
        # the reference skips stabilization per patch when the patch covers
        # the whole domain (LOD.cc:563-564); here that case needs no gate:
        # a full-domain patch has no 99-boundary dofs, so BD == 0 and the
        # SLOD formula degenerates exactly to the LOD candidate.
        slod = cfg.lod_stabilization and cfg.oversampling > 0
        from dealii_slod_tpu.ops.eig import jacobi_eigh_pallas
        use_jacobi = (cfg.eig_solver == "jacobi"
                      or (cfg.eig_solver == "auto"
                          and dt == jnp.float32
                          and jax.default_backend() == "tpu"))

        flat_idx = jnp.asarray(sc.assembly_flat_idx)
        PT = jnp.asarray(sc.PT, dt)
        nD = sc.n_fine_dofs_local
        cD = sc.n_coarse_dofs_local
        n_nodes = sc.n_nodes_local
        Hdim = self.grid.H ** cfg.dim
        thr = cfg.svd_threshold
        node_coords = jnp.asarray(sc.node_coords_local.astype(np.int32))
        sub_coords = jnp.asarray(sc.sub_coords.astype(np.int32))
        cell_lo = jnp.asarray(
            (cartesian_coords(sc.cell_dims_local)
             * cfg.n_subdivisions).astype(np.int32))         # (cells, dim)
        s = cfg.n_subdivisions
        cen_dofs = jnp.asarray(self.canvas_center_cell * C + np.arange(C))
        # static canvas-interior restriction: every patch's window-interior
        # dofs lie in the canvas interior (windows are canvas-aligned boxes),
        # so the SPD solve runs at (Ks-1)^dim instead of (Ks+1)^dim —
        # a ((Ks+1)/(Ks-1))^(3 dim) Cholesky-FLOP saving.  The interior is a
        # rectangular subgrid, so its extraction is a strided SLICE of the
        # grid-reshaped matrix, not a gather (gathers at (nD)^2 size were the
        # dominant HBM traffic).
        int_dofs = jnp.asarray(sc.interior_dof_indices())
        int_nodes_np = sc.interior_nodes
        int_coords = jnp.asarray(
            sc.node_coords_local[int_nodes_np].astype(np.int32))
        nI = len(int_nodes_np) * C
        PT_I = jnp.asarray(sc.PT[sc.interior_dof_indices()], dt)  # (nI, cD)
        grid_rev = _rev(sc.node_dims_local)
        inner = tuple(slice(1, -1) for _ in range(cfg.dim))

        def interior_cols(M):
            """(rows, nD) -> (rows, nI) by slicing the spatial grid axes."""
            r = M.shape[0]
            Mg = M.reshape((r,) + grid_rev + (C,))
            return Mg[(slice(None),) + inner].reshape(r, nI)

        def interior_rows_cols(M):
            Mg = M.reshape(grid_rev + (C,) + grid_rev + (C,))
            return Mg[inner + (slice(None),) + inner].reshape(nI, nI)

        def scatter_interior(v):
            """(nI, k) -> (nD, k) zero-extended (ascending-dof order, same
            as the reference's extend_vector_to_boundary_values)."""
            k = v.shape[-1]
            z = jnp.zeros(grid_rev + (C, k), dt)
            z = z.at[inner].set(v.reshape(
                tuple(g - 2 for g in grid_rev) + (C, k)))
            return z.reshape(nD, k)

        def prep(coef_list, nlo, nhi):
            """Assembled operators + masks for one patch window."""
            in_sub = ((sub_coords >= nlo) & (sub_coords <= nhi - 1)
                      ).all(axis=1)                          # (n_sub,)
            coefs = {k: c * in_sub[:, None]
                     for k, c in zip(self.coef_names, coef_list)}
            Ksub = make_subcell_matrices(et, coefs)
            A_raw = assemble_dense(Ksub, flat_idx, nD)
            # window-interior mask restricted to the static canvas interior
            node_int = ((int_coords > nlo) & (int_coords < nhi)).all(axis=1)
            m = jnp.repeat(node_int, C).astype(dt)           # (nI,)
            A_II = interior_rows_cols(A_raw)
            # zero rows/cols outside the window interior + unit diagonal:
            # the interior block is the SPD submatrix the row-cleared
            # reference operator solves (LOD.cc:537-546)
            A_solve = A_II * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            cell_valid = ((cell_lo >= nlo)
                          & (cell_lo + s <= nhi)).all(axis=1)
            cvd = jnp.repeat(cell_valid, C).astype(dt)       # (cD,)
            PT_m = PT_I * m[:, None] * cvd[None, :]
            return A_raw, A_solve, PT_m, cvd

        def finish(A_raw, Ainv_PT, T, cvd, nlo, nhi, sides_dom):
            """Solve products -> stabilized, normalized basis canvases."""
            # T is SPD: Cholesky-based explicit inverse (gauss_jordan in the
            # reference, LOD.cc:553) — LU is overhead-bound at this size
            Tinv = spd_inverse(T)
            A_cols_I = interior_cols(A_raw)                  # (nD, nI)

            node_in = ((node_coords >= nlo)
                       & (node_coords <= nhi)).all(axis=1)
            on_lo = node_coords == nlo                       # (n_nodes, dim)
            on_hi = node_coords == nhi
            isdom = (((on_lo & sides_dom[0::2])
                      | (on_hi & sides_dom[1::2])).any(axis=1) & node_in)

            if slod:
                is99 = (((on_lo & ~sides_dom[0::2])
                         | (on_hi & ~sides_dom[1::2])).any(axis=1) & node_in)
                is99d = jnp.repeat(is99, C).astype(dt)
                # S_boundary rows (unconstrained stiffness at 99-dofs,
                # LOD.cc:520-528), interior columns
                S_AiPT = (A_cols_I * is99d[:, None]) @ Ainv_PT
                PT_b = PT * is99d[:, None] * cvd[None, :]
                BD = (S_AiPT - PT_b) @ Tinv                  # (nD, cD)
                cols = []
                for d in range(C):
                    cen = self.canvas_center_cell * C + d
                    onehot = (jnp.arange(cD) == cen).astype(dt)
                    colmask = (1.0 - onehot) * cvd
                    b0 = BD[:, cen]
                    newBD = BD * colmask[None, :]
                    G = newBD.T @ newBD
                    g0 = newBD.T @ b0
                    # spectral pseudo-inverse — G is the PSD Gram matrix, so
                    # eigenpairs == singular triplets (descending reorder);
                    # same semantics as compute_inverse_svd (LOD.cc:667)
                    if use_jacobi:
                        # VMEM-resident Pallas one-sided Jacobi (ops/eig.py)
                        # with adaptive sweeps (typical patches stop ~6)
                        lam, V = jacobi_eigh_pallas(
                            G, sweeps=cfg.eig_sweeps, tol=cfg.eig_tol)
                    else:
                        lam, V = jnp.linalg.eigh(G)
                        lam = lam[::-1]
                        V = V[:, ::-1]
                    inv_sig = jnp.where(lam > thr * lam[0], 1.0 / lam, 0.0)
                    uv = V.T @ g0
                    terms = (inv_sig * uv)[:, None] * V.T
                    d0 = -terms.sum(axis=0)

                    def body(carry, term):
                        dvec, done = carry
                        done = done | (jnp.max(jnp.abs(dvec)) < 0.5)
                        dvec = jnp.where(done, dvec, dvec + term)
                        return (dvec, done), None

                    (dvec, _), _ = jax.lax.scan(
                        body, (d0, jnp.asarray(False)), terms[::-1])
                    c = Tinv @ (onehot + dvec * colmask)
                    cols.append(Ainv_PT @ c)
                phi_int = jnp.stack(cols, axis=-1)           # (nI, C)
            else:
                phi_int = Ainv_PT @ jnp.take(Tinv, cen_dofs, axis=1)
            norms = jnp.sqrt((phi_int ** 2).sum(axis=0))
            phi_int = phi_int / norms
            phi = scatter_interior(phi_int)
            # premultiplied basis (LOD.cc:758-765): phi is supported on the
            # window interior, so A_semi phi == A[:, interior] @ phi_int with
            # domain-boundary rows zeroed
            Aphi = A_cols_I @ phi_int
            Aphi = jnp.where(jnp.repeat(isdom, C)[:, None], 0.0, Aphi)
            # outputs are already canvas-aligned
            return (phi.reshape(n_nodes, C, C),
                    Aphi.reshape(n_nodes, C, C))

        def one_patch(coef_list, nlo, nhi, sides_dom):
            A_raw, A_solve, PT_m, cvd = prep(coef_list, nlo, nhi)
            L = cholesky_factor(A_solve)
            Ainv_PT = cholesky_solve(L, PT_m)                # (nI, cD)
            T = (PT_m.T @ Ainv_PT) / Hdim + jnp.diag(1.0 - cvd)
            return finish(A_raw, Ainv_PT, T, cvd, nlo, nhi, sides_dom)

        return prep, finish, one_patch

    def _uniform_patch_fn(self):
        """Single-patch basis builder on the padded canvas.  Same
        mathematics as `_class_patch_fn` (reference LOD.cc:296-768) but with
        the real window described by per-patch masks instead of per-class
        static shapes: fake subcells get zero coefficients, fake/boundary
        dofs get identity rows, fake coarse cells get identity diagonal in
        the triple product — all exactly equivalent to the per-class
        computation (validated against it in tests/test_uniform.py)."""
        return self._uniform_core()[2]

    def _use_fused_solver(self) -> bool:
        mode = self.cfg.patch_solver
        if mode == "auto":
            return (self.dtype == jnp.float32
                    and jax.default_backend() == "tpu")
        return mode == "fused"

    def _uniform_chunk_fn(self):
        """Chunk-level uniform kernel: (coef_list of (B, n_sub, nq), nlo,
        nhi, sides) -> (Phi, APhi) of (B, n_nodes, C, C).

        lax path: plain vmap of the per-patch builder.  fused path: the
        per-patch SPD multi-RHS solve is hoisted out of the vmap into ONE
        batched VMEM-resident Pallas kernel (factor + forward/backward
        multi-RHS + triple product, ops/patch_solve.py) between two vmapped
        stages; A_raw is re-assembled in stage 2 (assembly is ~100x cheaper
        than materializing the (nD, nD) matrices across the batch)."""
        nc = len(self.coef_names)
        prep, finish, one_patch = self._uniform_core()
        if not self._use_fused_solver():
            return jax.vmap(one_patch, in_axes=([0] * nc, 0, 0, 0))
        from dealii_slod_tpu.ops.patch_solve import fused_spd_multirhs
        Hdim = self.grid.H ** self.cfg.dim
        bs = self.cfg.fused_block

        vprep = jax.vmap(prep, in_axes=([0] * nc, 0, 0))
        vfinish = jax.vmap(finish)

        def cfn(coef_list, nlo, nhi, sides):
            _, A_solve, PT_m, cvd = vprep(coef_list, nlo, nhi)
            Ainv_PT, T_raw = fused_spd_multirhs(A_solve, PT_m, bs=bs)
            eye = jnp.eye(cvd.shape[-1], dtype=self.dtype)
            T = T_raw / Hdim + eye * (1.0 - cvd)[:, None, :]
            # re-assemble A_raw for the trace/premultiply stage
            A_raw, _, _, _ = vprep(coef_list, nlo, nhi)
            return vfinish(A_raw, Ainv_PT, T, cvd, nlo, nhi, sides)

        return cfn

    def _coef_windows(self, coef: jnp.ndarray) -> jnp.ndarray:
        """Patch-subcell coefficient windows (n_fine_cells, nq) ->
        (P, n_sub, nq) by structured window extraction
        (``conv_general_dilated_patches``) instead of a (P, n_sub) random
        gather — the gather was HBM-gather-bound on TPU (~0.45 s at the
        north-star config), the window op streams.  Out-of-domain subcells
        come back zero (padding), exactly matching the in-window coefficient
        mask the uniform kernel applies anyway."""
        cfg, g = self.cfg, self.grid
        dim = cfg.dim
        s = cfg.n_subdivisions
        ell = cfg.oversampling
        win = (2 * ell + 1) * s
        grid = _rev(g.fine_cell_dims)
        nq = coef.shape[-1]
        cg = jnp.moveaxis(coef.reshape(grid + (nq,)), -1, 0)[None]
        pat = jax.lax.conv_general_dilated_patches(
            cg, filter_shape=(win,) * dim, window_strides=(s,) * dim,
            padding=[(ell * s, ell * s)] * dim)
        pat = pat.reshape(nq, win ** dim, -1)          # (nq, n_sub, P)
        return jnp.transpose(pat, (2, 1, 0))

    def _use_coef_windows(self) -> bool:
        """Window extraction applies whenever the per-patch coefficient rows
        are the plain geometric windows — i.e. except under the reference's
        constant-coefficient stiffness-cache semantics, which redirect
        full-size patches to the first one's rows (LOD.cc:354-361)."""
        return (self.cfg.coef_windows
                and self.cfg.kernel_mode == "uniform"
                and not self.cfg.constant_coefficients)

    def compute_basis(self):
        """Run the basis kernels; fills ``self.Phi``/``self.APhi`` canvases
        (P, canvas_n, C, C)."""
        if self.cfg.kernel_mode == "uniform":
            return self._compute_basis_uniform()
        return self._compute_basis_classes()

    def _patch_dedup(self, nlo, nhi, sides):
        """For constant coefficient fields the basis depends only on the
        window geometry + domain-side flags: compute unique signatures once
        and broadcast (generalizes the reference's full-size-patch cache,
        LOD.cc:354-361, from 'interior patches' to every repeated geometry —
        P=N^dim patch solves collapse to O((l+2)^dim))."""
        if not (hasattr(self.problem, "is_constant")
                and self.problem.is_constant()):
            return None
        key = np.concatenate([nlo, nhi, sides.astype(np.int32)], axis=1)
        _, rep, inv = np.unique(key, axis=0, return_index=True,
                                return_inverse=True)
        return rep.astype(np.int64), inv.astype(np.int64)

    def _compute_basis_uniform(self):
        P, C = self.topo.n_patches, self.C
        chunk = self.cfg.patch_chunk or P
        if self._uniform_kernel_cache is None:
            cfn = self._uniform_chunk_fn()

            def run(*args):
                with jax.default_matmul_precision(self.cfg.matmul_precision):
                    return cfn(*args)

            self._uniform_kernel_cache = jax.jit(run)
        kernel = self._uniform_kernel_cache
        gsub, nlo, nhi, sides = self._uniform_inputs()

        dedup = self._patch_dedup(nlo, nhi, sides)
        if dedup is not None:
            rep, inv = dedup
            gsub, nlo, nhi, sides = (gsub[rep], nlo[rep], nhi[rep],
                                     sides[rep])
        B = len(nlo)

        use_windows = self._use_coef_windows() and dedup is None
        if use_windows:
            cw = {k: self._coef_windows(self.coef_q[k])
                  for k in self.coef_names}
        else:
            gsub = jnp.asarray(gsub)
        nlo_j, nhi_j = jnp.asarray(nlo), jnp.asarray(nhi)
        sides_j = jnp.asarray(sides)
        Phi = jnp.zeros((B, self.canvas_n, C, C), self.dtype)
        APhi = jnp.zeros((B, self.canvas_n, C, C), self.dtype)
        step = min(chunk, B)
        for lo in range(0, B, step):
            idx = np.minimum(np.arange(lo, lo + step), B - 1)
            jidx = jnp.asarray(idx)
            if use_windows:
                cl = [cw[k][jidx] for k in self.coef_names]
            else:
                cl = [self.coef_q[k][gsub[jidx]] for k in self.coef_names]
            phi_c, aphi_c = kernel(cl, nlo_j[jidx], nhi_j[jidx],
                                   sides_j[jidx])
            keep = min(lo + step, B) - lo
            ids = jnp.asarray(np.arange(lo, lo + keep))
            Phi = Phi.at[ids].set(phi_c[:keep].reshape(keep, -1, C, C))
            APhi = APhi.at[ids].set(aphi_c[:keep].reshape(keep, -1, C, C))
        if dedup is not None:
            jinv = jnp.asarray(inv)
            Phi = Phi[jinv]
            APhi = APhi[jinv]
        self.Phi, self.APhi = Phi, APhi
        return Phi, APhi

    def _compute_basis_classes(self):
        P, C = self.topo.n_patches, self.C
        Phi = jnp.zeros((P, self.canvas_n, C, C), self.dtype)
        APhi = jnp.zeros((P, self.canvas_n, C, C), self.dtype)
        chunk = self.cfg.patch_chunk
        for ci, sc in enumerate(self.topo.classes):
            if ci not in self._class_kernels:
                self._class_kernels[ci] = self._build_class_kernel(ci)
            kernel = self._class_kernels[ci]
            pids, gsub, is99_np, isdom_np, central, off = self._class_inputs(ci)
            gsub = jnp.asarray(gsub)
            inputs = (
                [self.coef_q[k][gsub] for k in self.coef_names],
                jnp.asarray(is99_np), jnp.asarray(isdom_np),
                jnp.asarray(central), jnp.asarray(off),
            )
            B = len(pids)
            step = B if chunk in (0, None) else min(chunk, B)
            for lo in range(0, B, step):
                hi = min(lo + step, B)
                # pad the remainder chunk to the full chunk size (avoids a
                # second compilation per class for the tail shape)
                idx = np.arange(lo, lo + step)
                idx = np.minimum(idx, B - 1)
                jidx = jnp.asarray(idx)
                args = ([c[jidx] for c in inputs[0]],) + tuple(
                    a[jidx] for a in inputs[1:])
                phi_c, aphi_c = kernel(*args)
                keep = hi - lo
                ids = jnp.asarray(pids[lo:hi])
                Phi = Phi.at[ids].set(phi_c[:keep])
                APhi = APhi.at[ids].set(aphi_c[:keep])
        self.Phi, self.APhi = Phi, APhi
        return Phi, APhi

    # ------------------------------------------------------------------
    # Coarse operator in stencil form (reference assemble_global_matrix)
    # ------------------------------------------------------------------

    def assemble_coarse_operator(self):
        """A_LOD[(q,dq),(p,dp)] = phi_q . (A phi_p) as a stencil
        (P, S, C, C) over relative window offsets (replaces the Trilinos
        Tmmult triple product, reference LOD.cc:970-972)."""
        self.A_stencil = jax.jit(self._stencil_build)(self.Phi, self.APhi)
        return self.A_stencil

    def _stencil_build(self, Phi, APhi):
        """Pure function: canvases -> stencil blocks (P, S, C, C).

        Dispatches to the cell-decomposed build (fast path) unless its
        (E, K, K, C, C) intermediate would be too large, in which case the
        offset-loop roll build is used."""
        K = (2 * self.cfg.oversampling + 1) ** self.cfg.dim
        K2 = (2 * self.cfg.oversampling + 2) ** self.cfg.dim
        t_bytes = (self.topo.n_patches * K * K2 * self.C * self.C
                   * (8 if self.dtype == jnp.float64 else 4))
        if t_bytes <= (1 << 30):
            return self._stencil_build_cells(Phi, APhi)
        return self._stencil_build_roll(Phi, APhi)

    def _stencil_build_roll(self, Phi, APhi):
        """Offset-loop stencil build:
        A_st[q, k] = sum_n phi_q[n] . Aphi_{q+delta_k}[n - delta_k*s],
        one ``lax.map`` body over the stencil offsets with the shift realized
        as roll + boundary mask."""
        cfg, C = self.cfg, self.C
        s = cfg.n_subdivisions
        Gd = self.canvas_dims
        canvas_grid = _rev(Gd)
        P = self.topo.n_patches
        Phi_f = Phi.reshape((P, self.canvas_n, C, C))
        APhi_g = APhi.reshape((P,) + canvas_grid + (C, C))
        t_rev = jnp.asarray(
            (self.stencil_offsets * s)[:, ::-1].astype(np.int32))  # (S, dim)
        iotas = [jnp.arange(int(Gd[cfg.dim - 1 - a])) for a in range(cfg.dim)]

        def body(k):
            # Aphi_p shifted by t with zero fill, realized as roll + mask on
            # the RAW canvas (gathering a zero-padded canvas per offset costs
            # (1+2R s/G)^dim times more HBM traffic — 15x in 3D at l=2)
            ap = APhi_g[self.stencil_nbr[:, k]]          # (P, grid.., C, C)
            mask = jnp.ones((), Phi.dtype)
            for a in range(cfg.dim):                     # grid axis a
                t = t_rev[k, a]
                ap = jnp.roll(ap, t, axis=1 + a)
                Ga = ap.shape[1 + a]
                m = ((iotas[a] >= t) & (iotas[a] < Ga + t)).astype(Phi.dtype)
                shape = [1] * (cfg.dim + 3)
                shape[1 + a] = Ga
                mask = mask * m.reshape(shape)
            sl = ap * mask
            blk = jnp.einsum("bncd,bnce->bde", Phi_f,
                             sl.reshape(P, self.canvas_n, C, C))
            return blk * self.stencil_valid[:, k, None, None]

        A_st = jax.lax.map(body, jnp.arange(self.n_stencil))
        return jnp.moveaxis(A_st, 0, 1)                  # (P, S, C, C)

    def _cell_tables(self):
        """Static tables for the cell-decomposed stencil build.

        Every global fine node is *owned* by exactly one coarse cell
        (own(g) = clip(g // s, 0, N-1) per axis), so
        ``A_LOD[q,p] = sum_e sum_{g owned by e} phi_q(g) Aphi_p(g)`` —
        a per-cell contraction over window-slot pairs instead of a loop
        over stencil offsets."""
        if hasattr(self, "_cell_tab"):
            return self._cell_tab
        cfg, g = self.cfg, self.grid
        ell, s, N, dim = cfg.oversampling, cfg.n_subdivisions, cfg.n_coarse, cfg.dim
        K = (2 * ell + 1) ** dim
        ks = cartesian_coords(np.full(dim, 2 * ell + 1))        # (K, dim)
        # phi vanishes on (and outside) its window edge, so every node with
        # phi_q != 0 is owned by a cell of q's window: K slots suffice for
        # the phi table.  Aphi is nonzero on the window edge, whose TOP-face
        # nodes are owned by the cell one slot beyond the canvas — the Aphi
        # table therefore uses the extended (2l+2)-slot grid, with the
        # out-of-canvas node layers masked.
        K2 = (2 * ell + 2) ** dim
        ks2 = cartesian_coords(np.full(dim, 2 * ell + 2))       # (K2, dim)
        oo = cartesian_coords(np.full(dim, s + 1))              # (O, dim)
        O = len(oo)
        cells = cartesian_coords(g.cell_dims)                   # (E, dim)

        def patch_table(slots):
            pco = cells[:, None, :] + ell - slots[None, :, :]
            pvalid = ((pco >= 0) & (pco < N)).all(-1)
            p_idx = ravel(np.clip(pco, 0, N - 1), g.cell_dims)
            node_co = slots[:, None, :] * s + oo[None, :, :]    # (Kx, O, dim)
            in_canvas = (node_co <= (2 * ell + 1) * s).all(-1)  # (Kx, O)
            cnode = ravel(np.minimum(node_co, (2 * ell + 1) * s),
                          self.canvas_dims)
            # NOTE: keep NumPy (no jnp.asarray): this cache may be built
            # while tracing, and device constants created inside a trace
            # are tracers that must not leak into later traces
            return (p_idx.astype(np.int32), pvalid,
                    cnode.astype(np.int32), in_canvas)

        p_idx1, pvalid1, cnode1, incv1 = patch_table(ks)
        p_idx2, pvalid2, cnode2, incv2 = patch_table(ks2)
        # cell seen by patch q at slot k1: e = q + ks[k1] - l
        eco = cells[:, None, :] + ks[None, :, :] - ell
        evalid = ((eco >= 0) & (eco < N)).all(-1)
        e_idx = ravel(np.clip(eco, 0, N - 1), g.cell_dims)
        # ownership: offset o belongs to cell e iff o < s per axis, except at
        # the domain top face where the cell also owns its o == s layer
        top = cells == N - 1                                     # (E, dim)
        own = np.logical_or(oo[None, :, :] < s, top[:, None, :]).all(-1)
        own = own[:, None, :]                                    # (E, 1, O)
        # slot (in the extended grid) of the neighbor p = q + delta covering
        # the same cell: e = q + ks[k1] - l = p + ks2[k2] - l => k2 = k1 - d
        k2map = np.full((K, self.n_stencil), -1, dtype=np.int64)
        for k1 in range(K):
            tgt = ks[k1][None, :] - self.stencil_offsets         # (S, dim)
            ok = ((tgt >= 0) & (tgt <= 2 * ell + 1)).all(-1)
            k2map[k1, ok] = ravel(tgt[ok], np.full(dim, 2 * ell + 2))
        self._cell_tab = dict(
            p_idx1=p_idx1, pvalid1=pvalid1, cnode1=cnode1, incv1=incv1,
            p_idx2=p_idx2, pvalid2=pvalid2, cnode2=cnode2, incv2=incv2,
            e_idx=e_idx.astype(np.int32), evalid=evalid,
            own=own, k2map=k2map, K=K, K2=K2, O=O)
        return self._cell_tab

    def _stencil_build_cells(self, Phi, APhi):
        """Cell-decomposed stencil build: one batched contraction over
        owned nodes, one row gather of the cell-pair table onto the patch
        axis, then ``dim`` small *separable* indicator contractions that
        realize the slot correlation  A_st[q, delta] = sum_k1 G2[q, k1,
        k1 - delta]  axis by axis — replacing a K-times-unrolled
        gather/accumulate loop (K = 125 in 3D at l=2) that dominated both
        compile time and HBM write traffic."""
        C = self.C
        P = self.topo.n_patches
        dim = self.cfg.dim
        kappa = 2 * self.cfg.oversampling + 1
        S1 = 2 * self.stencil_R + 1
        tab = self._cell_tables()
        K, K2, O = tab["K"], tab["K2"], tab["O"]

        def cell_table(X, which):
            # (E, Kx, O, C, C) values of the covering patches at owned nodes
            p_idx = tab[f"p_idx{which}"]
            t = X[p_idx[:, :, None], tab[f"cnode{which}"][None, :, :]]
            mask = (tab[f"pvalid{which}"][:, :, None]
                    & tab[f"incv{which}"][None, :, :]
                    & tab["own"])
            return t * mask[:, :, :, None, None]

        Pc = cell_table(Phi.reshape(P, self.canvas_n, C, C), 1)
        Ac = cell_table(APhi.reshape(P, self.canvas_n, C, C), 2)
        T = jnp.einsum("ekocd,emocf->ekmdf", Pc, Ac)     # (E, K, K2, C, C)
        # cell-pair rows onto the patch axis: G2[q, k1] = T[e(q, k1), k1]
        G2 = T[jnp.asarray(tab["e_idx"]), jnp.arange(K)[None, :]]
        G2 = G2 * tab["evalid"][:, :, None, None, None]
        # per-axis slot-match indicator: M[k, m, j] = 1 iff m == k - (j - R)
        # (the per-axis factor of the k2map relation, LOD.cc
        # compute_mmult_pattern analog); invalid slot pairs simply no-match.
        M = jnp.asarray(
            (np.arange(kappa)[:, None, None]
             - (np.arange(S1)[None, None, :] - self.stencil_R)
             == np.arange(kappa + 1)[None, :, None]).astype(self.dtype))
        # reshape flat slot axes to per-axis grids (ravel is axis-0-fastest,
        # so the reshaped order is reversed: spatial axis dim-1 first)
        X = G2.reshape((P,) + (kappa,) * dim + (kappa + 1,) * dim + (C, C))
        kL, mL, jL = "abc"[:dim], "uvw"[:dim], "ijl"[:dim]
        sub = "p" + kL + mL + "xy"
        for a in range(dim):
            out = sub.replace(kL[a], "").replace(mL[a], "")
            out = out[:-2] + jL[a] + "xy"
            X = jnp.einsum(f"{sub},{kL[a]}{mL[a]}{jL[a]}->{out}", X, M)
            sub = out
        # axes now (P, j_{dim-1}, ..., j_0, C, C): flat index axis-0-fastest
        return X.reshape(P, self.n_stencil, C, C)

    def _coarse_matvec_with(self, A_st, u: jnp.ndarray) -> jnp.ndarray:
        """Stencil matvec A_LOD u: the neighbor values u[q + delta] are
        extracted as structured windows over the coarse lattice
        (``conv_general_dilated_patches`` — one fused XLA window op) instead
        of a (P, S) random gather, which on TPU was ~20 ms per matvec
        (gather-bound) vs ~1 ms for the window form."""
        cfg, C = self.cfg, self.C
        R = self.stencil_R
        dim = cfg.dim
        grid = _rev(self.grid.cell_dims)                      # (z, y, x)
        ug = u.reshape(grid + (C,))
        ug = jnp.moveaxis(ug, -1, 0)[None]                    # (1, C, z, y, x)
        # out channel = c * S + f with filter positions raveled row-major
        # over (z, y, x), i.e. x fastest — matching the stencil_offsets
        # ravel; zero padding realizes the domain-validity mask
        patches = jax.lax.conv_general_dilated_patches(
            ug, filter_shape=(2 * R + 1,) * dim,
            window_strides=(1,) * dim, padding=[(R, R)] * dim)
        u_nb = patches.reshape(C, self.n_stencil, -1)         # (C, S, P)
        return jnp.einsum("psde,esp->pd", A_st, u_nb)

    def coarse_matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        """u: (P, C) -> A_LOD u (P, C) via stencil gather."""
        return self._coarse_matvec_with(self.A_stencil, u)

    # ------------------------------------------------------------------
    # Right-hand sides, solves
    # ------------------------------------------------------------------

    def assemble_fine_rhs(self):
        """Eliminated fine FEM right-hand side (reference LOD.cc:1050-1063):
        load vector, minus the lifting of inhomogeneous Dirichlet data, with
        zeros at constrained rows (so its norm matches the reference's
        printed 'fem rhs l2 norm')."""
        cfg = self.cfg
        f_q = jnp.asarray(self.parse(cfg.rhs)(self.qpts), self.dtype)
        load = assemble_load_vector(self.et, self.conn, f_q, self.grid.n_nodes)
        bnd = jnp.asarray(self.grid.boundary_node_mask())
        g = jnp.asarray(self.parse(cfg.bc)(self.grid.node_coords()),
                        self.dtype)
        # lifting = the GLOBAL nodal interpolant of g (g is defined on all of
        # [0,1]^dim), not extension-by-zero: the eliminated rhs then stays a
        # smooth L2 functional (~ f + div(alpha grad g)), which the LOD space
        # approximates at the theoretical rate.  Extension-by-zero (what
        # AffineConstraints elimination amounts to in the reference,
        # LOD.cc:1017-1021) concentrates the rhs in the first fine layer and
        # stalls LOD convergence (tests/test_inhomogeneous_bc.py).
        op_raw = FineOperator(self.grid, self.et, self.conn, self.coef_q)
        rhs = jnp.where(bnd[:, None], 0.0, load - op_raw._apply_raw(g))
        self.fine_bnd = bnd
        self.fine_bc_values = g
        self.fem_rhs = rhs
        return rhs

    def _two_level_precond(self, diag):
        """Additive two-level preconditioner for the fine solve:
        M^-1 r = r / diag + C A_LOD^-1 C^T r — the LOD space itself as the
        coarse correction (the TPU-native stand-in for the reference's AMG,
        LOD.cc:1074-1078, and markedly stronger at high contrast because
        the coarse space is coefficient-adapted)."""
        P, C = self.topo.n_patches, self.C
        # densify the stencil coarse operator once and factorize
        nbr = np.asarray(self.stencil_nbr)
        valid = np.asarray(self.stencil_valid)
        A_st = np.asarray(self.A_stencil)
        n = P * C
        A_dense = np.zeros((n, n), A_st.dtype)
        for k in range(self.n_stencil):
            q = np.nonzero(valid[:, k])[0]
            p = nbr[q, k]
            A_dense[(q[:, None, None] * C + np.arange(C)[None, :, None]),
                    (p[:, None, None] * C + np.arange(C)[None, None, :])] \
                = A_st[q, k]
        L = cholesky_factor(jnp.asarray(A_dense, self.dtype))

        def coarse_solve(rc):
            return cholesky_solve(L, rc.reshape(-1, 1))[:, 0].reshape(P, C)

        return self._two_level_from(coarse_solve, diag)

    def _two_level_precond_stencil(self, diag):
        """Cap-free variant of `_two_level_precond`: the coarse correction
        is a fixed-degree Chebyshev polynomial of the STENCIL operator —
        linear and SPD (a valid PCG preconditioner, unlike truncated inner
        CG), with no densification, so it scales to any patch count."""
        P, C = self.topo.n_patches, self.C
        A_st = self.A_stencil
        # spectral bounds: lambda_max by Gershgorin row sums (cheap, safe
        # upper bound); lambda_min heuristic at lambda_max / 30 — a loose
        # lower bound only softens the polynomial, it stays SPD
        lmax = float(jnp.max(jnp.sum(jnp.abs(A_st), axis=(1, 3))))
        lmin = lmax / 30.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        degree = 16

        def coarse_solve(rc):
            # standard Chebyshev iteration for A y = rc on [lmin, lmax]
            mv = lambda v: self._coarse_matvec_with(A_st, v)
            y = rc / theta
            d = y
            sigma = theta / delta
            rho = 1.0 / sigma
            for _ in range(degree - 1):
                rho_new = 1.0 / (2.0 * sigma - rho)
                d = rho_new * (2.0 / delta * (rc - mv(y)) + rho * d)
                y = y + d
                rho = rho_new
            return y

        return self._two_level_from(coarse_solve, diag)

    def _two_level_from(self, coarse_solve, diag):
        P, C = self.topo.n_patches, self.C

        def precond(r):
            rc = jnp.einsum("pncd,pnc->pd", self.Phi,
                            r[self.canvas_gidx])              # C^T r
            y = coarse_solve(rc)
            vals = jnp.einsum("pncd,pd->pnc", self.Phi, y)    # C y
            coarse = jnp.zeros_like(r).at[self.canvas_gidx].add(vals)
            coarse = jnp.where(self.fine_bnd[:, None], 0.0, coarse)
            return r / diag + coarse

        return precond

    def solve_fine_fem(self):
        """Reference fine-scale FEM solve: CG + Jacobi (replaces CG + AMG,
        LOD.cc:1066-1079; AMG has no clean TPU analog and this solve is a
        comparison baseline), optionally with the LOD-space two-level
        preconditioner (cfg.fine_preconditioner = 'two_level')."""
        op = FineOperator(self.grid, self.et, self.conn, self.coef_q,
                          dirichlet_mask=self.fine_bnd)
        d = op.diagonal()
        if (self.cfg.fine_preconditioner == "two_level"
                and hasattr(self, "A_stencil")):
            # direct coarse factor while it is small; stencil-form
            # Chebyshev correction beyond (no densification cap)
            if self.topo.n_patches * self.C <= 32768:
                precond = self._two_level_precond(d)
            else:
                precond = self._two_level_precond_stencil(d)
        else:
            precond = lambda r: r / d
        rc = self.cfg.fine_solver
        res = cg(op, self.fem_rhs, max_steps=rc.max_steps,
                 tolerance=rc.tolerance, reduce=rc.reduce,
                 precond=precond)
        # res.x is the eliminated correction (zero at Dirichlet rows); the
        # full solution re-adds the global interpolant lifting
        u = res.x + self.fine_bc_values
        self.fem_solution = u
        self.fine_cg = res
        if int(res.n_iter) >= rc.max_steps:
            # surface non-convergence like the reference's
            # SolverControl::NoConvergence (LODtools.h:434-438)
            self.log(f"WARNING: fine CG did not converge in {rc.max_steps} "
                     f"iterations (residual {float(res.residual):.3e})")
        return u

    def solve_coarse(self):
        """Coarse LOD solve (reference LOD.cc:976-1002): rhs = C^T f, then
        CG (Jacobi in place of SSOR) on the stencil operator."""
        C = self.C
        f_at_canvas = self.fem_rhs[self.canvas_gidx]          # (P, canvas, C)
        rhs_c = jnp.einsum("pncd,pnc->pd", self.Phi, f_at_canvas)
        self.coarse_rhs = rhs_c
        self.log(f"     rhs l2 norm = {float(jnp.linalg.norm(rhs_c)):.6g}")
        diag = jnp.einsum("pdd->pd",
                          self.A_stencil[:, self.center_offset_idx])
        rc = self.cfg.coarse_solver
        res = cg(self.coarse_matvec, rhs_c, max_steps=rc.max_steps,
                 tolerance=rc.tolerance, reduce=rc.reduce,
                 precond=lambda r: r / diag)
        self.coarse_solution = res.x                          # (P, C)
        self.coarse_cg = res
        self.log(f"   size of u {res.x.size}")
        return res.x

    def prolong_lod_solution(self) -> jnp.ndarray:
        """lod_solution = C u + g: scatter the u-weighted basis canvases into
        the global fine grid (reference LOD.cc:1251) and re-add the Dirichlet
        lifting that ``assemble_fine_rhs`` eliminated.

        The reference never adds the lifting back — its coarse
        ``distribute`` (LOD.cc:1001) is a no-op on DGQ0, so for g != 0 its
        LOD solution is wrong at the boundary (recorded in PARITY.md); here
        the lifting is restored so inhomogeneous problems converge."""
        vals = jnp.einsum("pncd,pd->pnc", self.Phi, self.coarse_solution)
        out = jnp.zeros((self.grid.n_nodes, self.C), self.dtype)
        out = out.at[self.canvas_gidx].add(vals)
        if hasattr(self, "fine_bc_values"):
            out = out + self.fine_bc_values
        self.lod_solution = out
        return out

    # ------------------------------------------------------------------
    # Fully-jittable pipeline step (single-chip entry + SPMD sharding)
    # ------------------------------------------------------------------

    def build_step(self, mesh=None):
        """Return a pure, jittable end-to-end step

            step(coefs: dict[str, (n_fine_cells, nq)], fem_rhs: (n_nodes, C))
                -> (coarse solution (P, C), A_stencil (P, S, C, C))

        covering basis construction -> coarse-operator assembly -> CG solve.
        With ``mesh`` given, the patch batch axis is sharded over the mesh's
        ``cfg.mesh_axis`` dimension (the reference's MPI patch
        data-parallelism, source/LOD.cc:116-118, recast as SPMD sharding —
        XLA inserts the collectives for the stencil neighbor gathers and the
        CG reductions)."""
        from jax.sharding import NamedSharding, PartitionSpec

        P = self.topo.n_patches
        C = self.C
        axis = self.cfg.mesh_axis
        n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1

        def constrain(x):
            # shard leading (patch) axis when divisible; replicate otherwise
            if mesh is None or x.shape[0] % n_dev != 0:
                return x
            spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

        chunk = self.cfg.patch_chunk

        def pad_idx(B):
            if chunk and B > chunk:
                n_chunks = -(-B // chunk)
                return n_chunks, np.minimum(np.arange(n_chunks * chunk), B - 1)
            return 1, np.arange(B)

        # each batch: (pids, gsub-or-None, pad idx, extra per-patch inputs,
        # n_chunks, B, chunk-level kernel fn); gsub None = structured
        # coefficient-window extraction inside the traced step
        nc_names = len(self.coef_names)
        batches = []
        if self.cfg.kernel_mode == "uniform":
            gsub, nlo, nhi, sides = self._uniform_inputs()
            B = self.topo.n_patches
            n_chunks, idx = pad_idx(B)
            g_j = (None if self._use_coef_windows()
                   else jnp.asarray(np.ascontiguousarray(gsub[idx])))
            batches.append(
                (jnp.asarray(np.arange(B)), g_j, jnp.asarray(idx),
                 (jnp.asarray(nlo[idx]), jnp.asarray(nhi[idx]),
                  jnp.asarray(sides[idx])),
                 n_chunks, B, self._uniform_chunk_fn()))
        else:
            for ci in range(len(self.topo.classes)):
                pids, gsub, is99, isdom, central, off = self._class_inputs(ci)
                B = len(pids)
                n_chunks, idx = pad_idx(B)
                fn_ci = self._class_patch_fn(ci)
                batches.append(
                    (jnp.asarray(pids),
                     jnp.asarray(np.ascontiguousarray(gsub[idx])),
                     jnp.asarray(idx),
                     (jnp.asarray(is99[idx]), jnp.asarray(isdom[idx]),
                      jnp.asarray(central[idx]), jnp.asarray(off[idx])),
                     n_chunks, B,
                     jax.vmap(fn_ci, in_axes=([0] * nc_names,) + (0,) * 4)))

        def step(coefs, fem_rhs):
            with jax.default_matmul_precision(self.cfg.matmul_precision):
                return _step_inner(coefs, fem_rhs)

        def _step_inner(coefs, fem_rhs):
            Phi = constrain(jnp.zeros((P, self.canvas_n, C, C), self.dtype))
            APhi = constrain(jnp.zeros((P, self.canvas_n, C, C), self.dtype))
            for pids, gsub, idx, extras, n_chunks, B, vfn in batches:
                if gsub is None:
                    cl = [self._coef_windows(coefs[k])[idx]
                          for k in self.coef_names]
                else:
                    cl = [coefs[k][gsub] for k in self.coef_names]
                if n_chunks == 1:
                    phi_c, aphi_c = vfn([constrain(c) for c in cl],
                                        *[constrain(e) for e in extras])
                else:
                    def resh(a):
                        return a.reshape((n_chunks, -1) + a.shape[1:])
                    phi_c, aphi_c = jax.lax.map(
                        lambda t: vfn(list(t[0]), *t[1:]),
                        (tuple(resh(c) for c in cl),)
                        + tuple(resh(e) for e in extras))
                    phi_c = phi_c.reshape((-1,) + phi_c.shape[2:])[:B]
                    aphi_c = aphi_c.reshape((-1,) + aphi_c.shape[2:])[:B]
                phi_c = phi_c[:B].reshape(B, -1, C, C)
                aphi_c = aphi_c[:B].reshape(B, -1, C, C)
                Phi = Phi.at[pids].set(phi_c)
                APhi = APhi.at[pids].set(aphi_c)
            A_st = constrain(self._stencil_build(Phi, APhi))
            f_at = fem_rhs[self.canvas_gidx]                  # (P, canvas, C)
            rhs_c = constrain(jnp.einsum("pncd,pnc->pd", Phi, f_at))
            diag = jnp.einsum("pdd->pd", A_st[:, self.center_offset_idx])
            rc = self.cfg.coarse_solver
            res = cg(lambda u: self._coarse_matvec_with(A_st, u), rhs_c,
                     max_steps=rc.max_steps, tolerance=rc.tolerance,
                     reduce=rc.reduce, precond=lambda r: r / diag)
            return res.x, A_st

        return step

    # ------------------------------------------------------------------
    # Coarse FEM comparison (reference LOD.cc:1103-1237)
    # ------------------------------------------------------------------

    def solve_coarse_fem(self):
        """Q1 FEM on the coarse grid (FE_Q_iso_Q1(1)), direct solve,
        interpolated to the fine grid."""
        cfg, C = self.cfg, self.C
        N = cfg.n_coarse
        gH = GridSpec(cfg.dim, N, 1, C)
        etH = ElementTensors(cfg.dim, gH.h, C)
        connH = global_connectivity(gH)
        qptsH = quad_points_global(gH)
        coefsH = {k: jnp.asarray(v, self.dtype)
                  for k, v in self.problem.coefficients(qptsH).items()}
        f_qH = jnp.asarray(self.parse(cfg.rhs)(qptsH), self.dtype)
        rhsH = assemble_load_vector(etH, jnp.asarray(connH), f_qH, gH.n_nodes)
        bndH = jnp.asarray(gH.boundary_node_mask())
        gvals = jnp.asarray(self.parse(cfg.bc)(gH.node_coords()), self.dtype)

        n_dofs = gH.n_fine_dofs
        if n_dofs <= 6000:
            # dense direct solve (reference SolverDirect, LOD.cc:1191-1195)
            m = 2 ** cfg.dim
            conn_dof = (connH[:, :, None] * C
                        + np.arange(C)[None, None, :]).reshape(len(connH), m * C)
            rows = np.repeat(conn_dof[:, :, None], m * C, axis=2)
            cols = np.repeat(conn_dof[:, None, :], m * C, axis=1)
            flat = (rows.astype(np.int64) * n_dofs + cols.astype(np.int64))
            Ksub = make_subcell_matrices(etH, coefsH)
            A = jnp.zeros(n_dofs * n_dofs, self.dtype
                          ).at[jnp.asarray(flat.reshape(-1))].add(
                              Ksub.reshape(-1)).reshape(n_dofs, n_dofs)
            constrained = jnp.repeat(bndH, C).astype(self.dtype)
            uH = dense_dirichlet_solve(A, rhsH.reshape(-1), constrained,
                                       gvals.reshape(-1)).reshape(-1, C)
        else:
            opH = FineOperator(gH, etH, connH, coefsH, dirichlet_mask=bndH)
            g_ext = jnp.where(bndH[:, None], gvals, 0.0)
            rhsE = jnp.where(bndH[:, None], 0.0, rhsH - opH._apply_raw(g_ext))
            dH = opH.diagonal()
            res = cg(opH, rhsE, max_steps=2000, tolerance=1e-12, reduce=1e-14,
                     precond=lambda r: r / dH)
            uH = jnp.where(bndH[:, None], g_ext, res.x)

        # Q1 prolongation coarse nodes -> fine nodes (FETools::interpolate,
        # LOD.cc:1201-1204)
        s = cfg.n_subdivisions
        f_coords = cartesian_coords(self.grid.node_dims)
        cell = np.minimum(f_coords // s, N - 1)
        tloc = (f_coords - cell * s) / s                      # (n_nodes, dim)
        bits = cartesian_coords(np.full(cfg.dim, 2))          # (m, dim)
        idxH = ravel(cell[:, None, :] + bits[None, :, :], gH.node_dims)
        wts = np.prod(np.where(bits[None, :, :] == 1, tloc[:, None, :],
                               1.0 - tloc[:, None, :]), axis=-1)
        uH_fine = jnp.einsum("nm,nmc->nc", jnp.asarray(wts, self.dtype),
                             uH[jnp.asarray(idxH)])
        self.coarse_fem_solution = uH
        self.coarse_fem_on_fine = uH_fine
        return uH, uH_fine

    # ------------------------------------------------------------------
    # Output (reference output_coarse_results LOD.cc:248-293, fine VTU
    # LOD.cc:1262-1377, coefficients VTU Diffusion.h:70-108, parameter dump
    # LOD.cc:60-62)
    # ------------------------------------------------------------------

    def write_outputs(self):
        from dealii_slod_tpu.utils.io import (write_coarse_grid_vtu,
                                              write_fine_grid_vtu,
                                              write_subcell_field_vtu)
        cfg = self.cfg
        out = cfg.output_directory
        name = cfg.output_name
        import os
        os.makedirs(out, exist_ok=True)

        # used parameters dump (print_parameters, LOD.cc:60-62)
        with open(os.path.join(
                out, f"used_parameters_{cfg.dim}.prm"), "w") as f:
            f.write(cfg.to_prm())

        # coefficient fields at fine-subcell resolution
        centers = (cartesian_coords(self.grid.fine_cell_dims) + 0.5) \
            * self.grid.h
        coef_cells = {k: np.asarray(f)
                      for k, f in self.problem.coefficients(centers).items()}
        write_subcell_field_vtu(
            os.path.join(out, f"{name}_coefficients.vtu"),
            self.grid, coef_cells)

        # fine fields
        node_xy = self.grid.node_coords()
        pd = {}
        if hasattr(self, "fem_solution"):
            pd["fem_reference"] = np.asarray(self.fem_solution)
        pd["exact_solution"] = self.parse(cfg.exact_solution)(node_xy)
        pd["exact_rhs"] = self.parse(cfg.rhs)(node_xy)
        if hasattr(self, "lod_solution"):
            pd["lod_solution"] = np.asarray(self.lod_solution)
        if hasattr(self, "coarse_fem_on_fine"):
            pd["fem_coarse_solution"] = np.asarray(self.coarse_fem_on_fine)
        write_fine_grid_vtu(os.path.join(out, f"{name}_fine.vtu"),
                            self.grid, pd)

        # coarse (per-cell DGQ0) fields
        if hasattr(self, "coarse_solution"):
            cell_centers = (cartesian_coords(self.grid.cell_dims) + 0.5) \
                * self.grid.H
            cd = {"LOD_solution": np.asarray(self.coarse_solution),
                  "exact_solution":
                      self.parse(cfg.exact_solution)(cell_centers)}
            write_coarse_grid_vtu(os.path.join(out, f"{name}_coarse.vtu"),
                                  self.grid, cd)

    # ------------------------------------------------------------------
    # Full pipeline
    # ------------------------------------------------------------------

    def run(self) -> Dict:
        if self.cfg.profile_dir:
            import contextlib
            with contextlib.ExitStack() as stack:
                try:
                    stack.enter_context(
                        jax.profiler.trace(self.cfg.profile_dir))
                except Exception as exc:  # profiling may be unsupported
                    self.log(f"profiler unavailable: {exc}")
                return self._run()
        return self._run()

    def _run(self) -> Dict:
        cfg = self.cfg
        self.log(f"Running LOD {self.problem.name} problem in {cfg.dim}D")
        sizes = self.topo.patch_sizes()
        self.log(f"Number of coarse cell = {self.grid.n_cells}, "
                 f"number of patches = {self.topo.n_patches} "
                 f"(locally owned: {self.topo.n_patches}) ")
        self.log(f"Patches size in ({sizes.min()}, {sizes.max()})")

        with self.timer.section("2: compute basis functions"):
            self.compute_basis()
            jax.block_until_ready(self.Phi)
        with self.timer.section("3: assemble global matrix"):
            self.assemble_coarse_operator()
            jax.block_until_ready(self.A_stencil)

        with self.timer.section("4: assemble fine FEM"):
            self.assemble_fine_rhs()
            jax.block_until_ready(self.fem_rhs)
        self.log(f"     fem rhs l2 norm = "
                 f"{float(jnp.linalg.norm(self.fem_rhs)):.6g}")

        results: Dict = {}
        conn_np = np.asarray(self.conn)
        exact = self.parse(cfg.exact_solution)

        from dealii_slod_tpu.utils import errors as _errmod

        def error_norms(*a, **k):  # noqa: F811 — filter to the configured
            d = _errmod.error_norms(*a, **k)  # norms list (LOD.h:150-156)
            return {key: d[key] for key in cfg.error_norms if key in d}

        if cfg.solve_fine_problem:
            with self.timer.section("4: solve fine FEM"):
                self.solve_fine_fem()
                jax.block_until_ready(self.fem_solution)
            self.log(f"   size of fem u {self.fem_solution.size}")
            if cfg.constant_coefficients:
                t = ConvergenceTable("errFEMh")
                t.add_row(self.grid.n_cells, self.grid.n_fine_dofs,
                          error_norms(self.grid, self.et, conn_np,
                                      np.asarray(self.fem_solution),
                                      exact=exact, qpts=self.qpts))
                results["error_FEMh_exact"] = t

        with self.timer.section("4: solve coarse LOD"):
            self.solve_coarse()
            jax.block_until_ready(self.coarse_solution)
        with self.timer.section("5: prolong + compare"):
            self.prolong_lod_solution()
            jax.block_until_ready(self.lod_solution)

        if cfg.constant_coefficients:
            t = ConvergenceTable("errLOD")
            t.add_row(self.grid.n_cells, self.grid.n_coarse_dofs,
                      error_norms(self.grid, self.et, conn_np,
                                  np.asarray(self.lod_solution),
                                  exact=exact, qpts=self.qpts))
            results["error_LOD_exact"] = t

        if cfg.solve_fine_problem:
            t = ConvergenceTable("errLOD")
            t.add_row(self.grid.n_cells, self.grid.n_coarse_dofs,
                      error_norms(self.grid, self.et, conn_np,
                                  np.asarray(self.lod_solution),
                                  other=np.asarray(self.fem_solution)))
            results["error_LOD_FEMh"] = t

        # coarse Q1 FEM comparison — the reference runs this for
        # spacedim == 2 only (LOD.cc:1103 'if constexpr (spacedim == 2)')
        if self.C == 2 or (self.C == cfg.dim and cfg.dim > 1):
            with self.timer.section("4: coarse FEM comparison"):
                self.solve_coarse_fem()
                jax.block_until_ready(self.coarse_fem_on_fine)
            if cfg.solve_fine_problem:
                t = ConvergenceTable("errFEM")
                t.add_row(self.grid.n_cells, self.grid.n_coarse_dofs,
                          error_norms(self.grid, self.et, conn_np,
                                      np.asarray(self.coarse_fem_on_fine),
                                      other=np.asarray(self.fem_solution)))
                results["error_FEMH_FEMh"] = t
            if cfg.constant_coefficients:
                t = ConvergenceTable("errFEM")
                t.add_row(self.grid.n_cells, self.grid.n_coarse_dofs,
                          error_norms(self.grid, self.et, conn_np,
                                      np.asarray(self.coarse_fem_on_fine),
                                      exact=exact, qpts=self.qpts))
                results["error_FEMH_exact"] = t

        for key, label in [("error_LOD_exact", "SLOD vs exact solution"),
                           ("error_FEMH_exact", "FEM(H) vs exact solution"),
                           ("error_FEMh_exact", "FEMh vs exact solution"),
                           ("error_FEMH_FEMh", "FEM(H) vs reference FEM(h)"),
                           ("error_LOD_FEMh", "SLOD vs reference FEM(h)")]:
            if key in results:
                self.log(label)
                self.log(str(results[key]))

        if cfg.write_output:
            with self.timer.section("6: fine output"):
                self.write_outputs()

        if self.verbose:
            self.log(self.timer.summary())
        results["coarse_solution"] = self.coarse_solution
        results["lod_solution"] = self.lod_solution
        if cfg.solve_fine_problem:
            results["fem_solution"] = self.fem_solution
        return results
