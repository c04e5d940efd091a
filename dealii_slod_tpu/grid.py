"""Structured-grid index core: lexicographic grids, patches as index windows.

This module replaces the reference's unstructured-mesh machinery with pure
integer arithmetic, following the structured ``Patch`` prototype the reference
keeps in its test utilities (reference tests/util.h:377-583, :451-475):

- deal.II ``Triangulation`` + ``GridGenerator::hyper_cube`` + ``refine_global``
  (reference source/LOD.cc:108-119)  ->  :class:`GridSpec` (a few integers).
- ``LOD::create_patches`` index-arithmetic patch extraction
  (source/LOD.cc:122-244)  ->  :class:`PatchTopology` (clipped index windows).
- ``LOD::create_mesh_for_patch`` sub-triangulation extraction with boundary-id
  tagging 0 (domain) / 99 (patch interior boundary) (source/LOD.cc:770-858)
  ->  per-class static node masks + per-patch domain-side flags.
- ``fill_dofs_indices_vector`` dof classification (include/LODtools.h:334-375)
  ->  :class:`ShapeClass` interior/edge index lists + side masks.

Everything here is host-side NumPy, computed once at setup; the device only
ever sees static index arrays and per-patch integer origins.  All index maps
are dim-generic (2D and 3D) with axis 0 fastest (x-fastest lexicographic).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np


def ravel(coords: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Flatten integer coords (..., dim) -> index, axis 0 fastest.

    ``dims`` is either a single (dim,) vector or batched (..., dim) matching
    ``coords`` (per-row box sizes, e.g. per-patch window shapes)."""
    coords = np.asarray(coords)
    dims = np.asarray(dims)
    if dims.ndim == 1:
        strides = np.concatenate([[1], np.cumprod(dims[:-1])])
    else:
        ones = np.ones(dims.shape[:-1] + (1,), dtype=dims.dtype)
        strides = np.concatenate(
            [ones, np.cumprod(dims[..., :-1], axis=-1)], axis=-1)
    return (coords * strides).sum(axis=-1)


def unravel(idx: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Inverse of :func:`ravel`: index -> coords (..., dim), axis 0 fastest."""
    idx = np.asarray(idx)
    dims = np.asarray(dims)
    out = np.empty(idx.shape + (len(dims),), dtype=np.int64)
    for k, d in enumerate(dims):
        out[..., k] = idx % d
        idx = idx // d
    return out


def cartesian_coords(dims: np.ndarray) -> np.ndarray:
    """All integer coords of a box, in lexicographic order (axis 0 fastest).

    Returns an array of shape (prod(dims), dim).
    """
    dims = np.asarray(dims)
    return unravel(np.arange(int(np.prod(dims))), dims)


def rev_dims(dims) -> tuple:
    """Spatial dims in array-axis order (axis 0 fastest => last array axis)."""
    return tuple(int(d) for d in np.asarray(dims)[::-1])


def clipped_window_index(anchor: np.ndarray, extent, dims):
    """Raveled indices (axis 0 fastest) of the product windows
    ``anchor[p] + [0, extent_d)`` with coordinates clipped to ``[0, dims_d)``.

    Returns ``(idx, valid)``: ``idx[p, k]`` int32 of shape
    ``(P, prod(extent))`` equal to ``ravel(clip(anchor[p] + coords_k))``,
    and ``valid[p, k]`` marking windows cells that were in-bounds BEFORE
    clipping.

    Memory-lean equivalent of ``ravel(np.clip(anchor[:, None, :] +
    cartesian_coords(extent)[None, :, :], 0, dims - 1), dims)``: a product
    window's raveled index separates per axis, so only per-axis ``(P,
    extent_d)`` columns and the final ``(P, K)`` output are materialized —
    never the ``(P, K, dim)`` coordinate tensor (1 GB+ at 3D refine=5,
    and np.clip over it dominated LODSolver.__init__)."""
    anchor = np.asarray(anchor)
    extent = np.asarray(extent, dtype=np.int64)
    dims = np.asarray(dims, dtype=np.int64)
    P, dim = anchor.shape
    strides = np.concatenate([[1], np.cumprod(dims[:-1])])
    cols, oks = [], []
    for d in range(dim):
        col = anchor[:, d:d + 1].astype(np.int64) + np.arange(int(extent[d]))
        oks.append((col >= 0) & (col < int(dims[d])))
        cols.append((np.minimum(np.maximum(col, 0), int(dims[d]) - 1)
                     * strides[d]).astype(np.int32))

    # native single-pass fold when available (the NumPy broadcast fold below
    # runs at ~100 MB/s and dominated the ctor at 3D refine>=5)
    try:
        from dealii_slod_tpu.utils import native as _native
        out = _native.fold_window_index(cols, oks, extent)
    except Exception:
        out = None
    if out is not None:
        return out

    # fold axis 0 fastest: combine the SLOW axes first (small (P, .) arrays),
    # so only the final fold writes the full (P, K) output once
    def fold(parts):
        acc = parts[-1]
        for p in parts[-2::-1]:
            acc = (acc[:, :, None] + p[:, None, :]).reshape(P, -1)
        return acc

    idx = fold(cols)

    def fold_and(parts):
        acc = parts[-1]
        for p in parts[-2::-1]:
            acc = (acc[:, :, None] & p[:, None, :]).reshape(P, -1)
        return acc

    return idx, fold_and(oks)


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Uniform grid of the unit hypercube [0,1]^dim.

    ``n_coarse`` coarse cells per axis (N = 2^n_global_refinements in the
    reference, source/LOD.cc:113-114), each subdivided into ``n_sub`` fine
    Q1 subcells per axis (the implicit sub-grid of FE_Q_iso_Q1,
    source/LOD.cc:87-92).  ``n_components`` solution components per node
    (1 = diffusion, dim = elasticity; 'spacedim' in the reference).
    """

    dim: int
    n_coarse: int
    n_sub: int
    n_components: int = 1

    # ---- sizes -----------------------------------------------------------
    @property
    def H(self) -> float:
        return 1.0 / self.n_coarse

    @property
    def h(self) -> float:
        return self.H / self.n_sub

    @property
    def n_cells(self) -> int:
        return self.n_coarse ** self.dim

    @property
    def fine_cells_per_axis(self) -> int:
        return self.n_coarse * self.n_sub

    @property
    def nodes_per_axis(self) -> int:
        return self.fine_cells_per_axis + 1

    @property
    def n_fine_cells(self) -> int:
        return self.fine_cells_per_axis ** self.dim

    @property
    def n_nodes(self) -> int:
        return self.nodes_per_axis ** self.dim

    @property
    def n_fine_dofs(self) -> int:
        return self.n_nodes * self.n_components

    @property
    def n_coarse_dofs(self) -> int:
        return self.n_cells * self.n_components

    # ---- index helpers ---------------------------------------------------
    @property
    def cell_dims(self) -> np.ndarray:
        return np.full(self.dim, self.n_coarse, dtype=np.int64)

    @property
    def node_dims(self) -> np.ndarray:
        return np.full(self.dim, self.nodes_per_axis, dtype=np.int64)

    @property
    def fine_cell_dims(self) -> np.ndarray:
        return np.full(self.dim, self.fine_cells_per_axis, dtype=np.int64)

    def node_coords(self) -> np.ndarray:
        """Physical coordinates of all fine nodes, (n_nodes, dim)."""
        return cartesian_coords(self.node_dims).astype(np.float64) * self.h

    def boundary_node_mask(self) -> np.ndarray:
        """Boolean (n_nodes,): node on the domain boundary ∂[0,1]^dim."""
        c = cartesian_coords(self.node_dims)
        return ((c == 0) | (c == self.fine_cells_per_axis)).any(axis=-1)


# ---------------------------------------------------------------------------
# Patch shape classes
# ---------------------------------------------------------------------------

def _trapezoid_weights_1d(s: int) -> np.ndarray:
    """Composite-trapezoid weights on s unit sub-intervals (scaled by h at
    the call site): [1/2, 1, ..., 1, 1/2].  The tensor product of these is
    the reference's (1, 2, 4)-pattern P1->P0 projection column scaled by
    h^dim/2^dim (reference include/LODtools.h:7-73 with the h^2/4 scaling
    applied at source/LOD.cc:341)."""
    w = np.ones(s + 1)
    w[0] = w[-1] = 0.5
    return w


@dataclasses.dataclass
class ShapeClass:
    """Static per-shape data shared by all patches with the same window shape.

    A patch window of ``shape`` coarse cells per axis carries a fine node grid
    of ``shape*s + 1`` nodes per axis.  All outer-layer nodes are boundary
    nodes (patch boundary id 99 or domain boundary id 0, reference
    source/LOD.cc:830-843); the strictly interior nodes form a rectangular
    sub-grid, which is what makes the internal submatrix extraction a static
    slice instead of a gather over an unstructured IndexSet.
    """

    shape: Tuple[int, ...]          # coarse cells per axis in the window
    grid: GridSpec

    def __post_init__(self):
        dim = self.grid.dim
        s = self.grid.n_sub
        D = self.grid.n_components
        shape = np.asarray(self.shape, dtype=np.int64)
        self.cell_dims_local = shape                             # coarse cells
        self.n_cells_local = int(shape.prod())
        self.node_dims_local = shape * s + 1                     # fine nodes
        self.n_nodes_local = int(self.node_dims_local.prod())
        self.sub_dims_local = shape * s                          # fine subcells
        self.n_sub_local = int(self.sub_dims_local.prod())
        self.n_coarse_dofs_local = self.n_cells_local * D
        self.n_fine_dofs_local = self.n_nodes_local * D

        node_coords = cartesian_coords(self.node_dims_local)     # (n_nodes, dim)
        self.node_coords_local = node_coords

        # --- interior / edge classification (LODtools.h:334-375) ----------
        on_low = node_coords == 0                                 # (n_nodes, dim)
        on_high = node_coords == (self.node_dims_local - 1)
        is_edge = (on_low | on_high).any(axis=-1)
        self.interior_nodes = np.nonzero(~is_edge)[0].astype(np.int32)
        self.edge_nodes = np.nonzero(is_edge)[0].astype(np.int32)
        self.n_interior = len(self.interior_nodes)
        self.n_edge = len(self.edge_nodes)
        # side incidence of each edge node: sides ordered
        # (axis0 low, axis0 high, axis1 low, axis1 high, ...)
        sides = np.empty((self.n_edge, 2 * dim), dtype=bool)
        for k in range(dim):
            sides[:, 2 * k] = on_low[self.edge_nodes, k]
            sides[:, 2 * k + 1] = on_high[self.edge_nodes, k]
        self.edge_sides = sides

        # interior nodes as a rectangular slice for scatter-back
        self.interior_dims = self.node_dims_local - 2

        # --- subcell connectivity for assembly -----------------------------
        # conn[subcell, m] = local node index of each of the 2^dim corners,
        # corner bit order: axis 0 fastest (matches element.py tensors).
        m = 2 ** dim
        sub_coords = cartesian_coords(self.sub_dims_local)       # (n_sub, dim)
        corner_bits = cartesian_coords(np.full(dim, 2))          # (m, dim)
        corner_coords = sub_coords[:, None, :] + corner_bits[None, :, :]
        self.conn = ravel(corner_coords, self.node_dims_local).astype(np.int32)
        # owning coarse cell of each subcell
        self.sub_to_cell = ravel(sub_coords // s, shape).astype(np.int32)
        # subcell coords (needed to locate the subcell inside the global grid)
        self.sub_coords = sub_coords.astype(np.int32)

        # flattened scatter indices for dense assembly:
        # A[dofI, dofJ] += Ksub[subcell, I, J]   with dof = node*D + comp
        conn_dof = (self.conn[:, :, None] * D
                    + np.arange(D)[None, None, :]).reshape(self.n_sub_local, m * D)
        nd = self.n_fine_dofs_local
        rows = np.repeat(conn_dof[:, :, None], m * D, axis=2)
        cols = np.repeat(conn_dof[:, None, :], m * D, axis=1)
        self.assembly_flat_idx = (rows.astype(np.int64) * nd
                                  + cols.astype(np.int64)).reshape(-1)

        # --- P^T projection weights (LODtools.h:7-73, LOD.cc:329-342) ------
        # PT[node, cell] = prod_k tw(node_k - cell_k*s) * h^dim,  supported on
        # the closure of the cell.  Scaled so that sum_nodes PT[:, c] = H^dim.
        tw = _trapezoid_weights_1d(s) * self.grid.h
        cell_coords = cartesian_coords(shape)                    # (n_cells, dim)
        PT = np.ones((self.n_nodes_local, self.n_cells_local))
        for k in range(dim):
            rel = node_coords[:, None, k] - cell_coords[None, :, k] * s
            inside = (rel >= 0) & (rel <= s)
            wk = np.where(inside, tw[np.clip(rel, 0, s)], 0.0)
            PT = PT * wk
        self.PT_node_cell = PT                                   # (n_nodes, n_cells)

        # component-expanded PT: dof = node*D + d  x  coarse dof = cell*D + d
        eye = np.eye(D)
        self.PT = np.einsum("nc,de->ndce", PT, eye).reshape(
            self.n_fine_dofs_local, self.n_coarse_dofs_local)
        self.PT_interior = self.PT.reshape(
            self.n_nodes_local, D, self.n_coarse_dofs_local
        )[self.interior_nodes].reshape(self.n_interior * D,
                                       self.n_coarse_dofs_local)

    # ------------------------------------------------------------------
    def interior_dof_indices(self) -> np.ndarray:
        D = self.grid.n_components
        return (self.interior_nodes[:, None] * D
                + np.arange(D)[None, :]).reshape(-1).astype(np.int32)

    def edge_dof_indices(self) -> np.ndarray:
        D = self.grid.n_components
        return (self.edge_nodes[:, None] * D
                + np.arange(D)[None, :]).reshape(-1).astype(np.int32)


def global_connectivity(grid: GridSpec) -> np.ndarray:
    """Global subcell -> node connectivity (n_fine_cells, 2^dim), axis-0
    fastest corner order.  Lightweight (no PT / class machinery) — used for
    the matrix-free global fine operator (reference fine FEM assembly,
    source/LOD.cc:1004-1094)."""
    sub_coords = cartesian_coords(grid.fine_cell_dims)
    corner_bits = cartesian_coords(np.full(grid.dim, 2))
    corner_coords = sub_coords[:, None, :] + corner_bits[None, :, :]
    return ravel(corner_coords, grid.node_dims).astype(np.int32)


# ---------------------------------------------------------------------------
# Patch topology
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PatchTopology:
    """All patches of the grid, bucketed by shape class.

    Replaces ``LOD::create_patches`` (reference source/LOD.cc:122-244): for
    each coarse cell c the patch window is the Chebyshev ball of radius
    ``oversampling`` around c, clipped at the domain boundary — exactly the
    reference's barycenter-offset test ``x_j > 0 && x_j < 1`` (LOD.cc:161,
    :168), which keeps offsets with ``0 <= c_k + l < N``.
    """

    grid: GridSpec
    oversampling: int

    def __post_init__(self):
        g = self.grid
        N, dim, ell = g.n_coarse, g.dim, self.oversampling
        self.n_patches = g.n_cells

        native = None
        try:
            from dealii_slod_tpu.utils import native as _native
            native = _native.build_patches(dim, N, ell)
        except Exception:
            native = None
        if native is not None:
            lo32, shape32, central, sides = native
            lo = lo32.astype(np.int64)
            shape = shape32.astype(np.int64)
            self.central_cell_local = central
            self.side_is_domain = sides
        else:
            centers = cartesian_coords(g.cell_dims)             # (P, dim)
            lo = np.clip(centers - ell, 0, None)
            hi = np.clip(centers + ell, None, N - 1)
            shape = (hi - lo + 1).astype(np.int64)              # (P, dim)
            self.central_cell_local = ravel(
                centers - lo, shape).astype(np.int32)
            # which patch sides lie on the domain boundary (-> boundary id 0
            # instead of 99, LOD.cc:830-843)
            fid = np.empty((self.n_patches, 2 * dim), dtype=bool)
            for k in range(dim):
                fid[:, 2 * k] = lo[:, k] == 0
                fid[:, 2 * k + 1] = hi[:, k] == N - 1
            self.side_is_domain = fid

        self.patch_lo = lo                                      # coarse coords
        self.patch_shape = shape
        self.origin_nodes = lo * g.n_sub                        # fine node coords

        # ---- shape classes ------------------------------------------------
        keys = [tuple(sh) for sh in shape]
        self.classes: List[ShapeClass] = []
        self.class_of_patch = np.empty(self.n_patches, dtype=np.int32)
        self.patches_by_class: List[np.ndarray] = []
        seen: Dict[Tuple[int, ...], int] = {}
        for p, key in enumerate(keys):
            if key not in seen:
                seen[key] = len(self.classes)
                self.classes.append(ShapeClass(key, g))
                self.patches_by_class.append([])
            ci = seen[key]
            self.class_of_patch[p] = ci
            self.patches_by_class[ci].append(p)
        self.patches_by_class = [np.asarray(v, dtype=np.int32)
                                 for v in self.patches_by_class]

        self.n_nodes_max = max(c.n_nodes_local for c in self.classes)
        self.n_cells_local_max = max(c.n_cells_local for c in self.classes)

    # ------------------------------------------------------------------
    def patch_sizes(self) -> np.ndarray:
        """Number of coarse cells per patch (for the reference's
        'Patches size in (min, max)' stat, LOD.cc:241-242)."""
        return self.patch_shape.prod(axis=1)

    def global_node_indices(self, patch_ids: np.ndarray, sc: ShapeClass) -> np.ndarray:
        """Global fine-node index of every local node, (B, n_nodes_local).

        Pure index arithmetic (cf. reference tests/util.h:451-475).
        """
        g = self.grid
        origin = self.origin_nodes[patch_ids]                   # (B, dim)
        coords = origin[:, None, :] + sc.node_coords_local[None, :, :]
        return ravel(coords, g.node_dims)

    def global_subcell_indices(self, patch_ids: np.ndarray, sc: ShapeClass) -> np.ndarray:
        """Global fine-subcell index of every local subcell, (B, n_sub_local)."""
        g = self.grid
        origin = self.origin_nodes[patch_ids]
        coords = origin[:, None, :] + sc.sub_coords[None, :, :]
        return ravel(coords, g.fine_cell_dims)

    def edge_node_flags(self, patch_ids: np.ndarray, sc: ShapeClass
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-patch classification of the class's edge nodes.

        Returns ``(is_patch_boundary, is_domain_boundary)`` of shape
        (B, n_edge) each.  A node is a *patch*-boundary (id 99) dof if at
        least one incident patch side is interior to the domain, and a
        *domain*-boundary (id 0) dof if at least one incident side lies on
        the domain boundary.  The two sets overlap at corners — deliberately,
        matching the reference (include/LODtools.h:367-369).
        """
        dom_sides = self.side_is_domain[patch_ids]              # (B, 2dim)
        inc = sc.edge_sides[None, :, :]                         # (1, n_edge, 2dim)
        is_dom = (inc & dom_sides[:, None, :]).any(axis=-1)
        is_patch = (inc & ~dom_sides[:, None, :]).any(axis=-1)
        return is_patch, is_dom
