"""Fused VMEM-resident SPD multi-RHS patch solver (Pallas TPU kernel).

Replaces the ``jnp.linalg.cholesky`` + two ``solve_triangular`` calls of the
per-patch solve (the TPU stand-in for the reference's Amesos-KLU multi-RHS
``Gauss_elimination``, include/LODtools.h:511-595).  XLA's batched Cholesky
and TRSM lower to ~1500 sequential panel micro-steps that each round-trip
the (n, n) matrix through HBM; here the whole factor + forward/backward
multi-RHS solve (+ the coarse triple product) runs on ONE VMEM residency of
the patch matrix:

    L L^T = A,    Y = L^-1 B,    X = A^-1 B = L^-T Y,    T = Y^T Y

with

- the diagonal-block factor as an in-register masked right-looking loop
  (the unavoidable length-n dependency chain, but at VMEM latencies; the
  symmetric trailing block supplies the row vector so no per-step
  transposes are needed),
- an explicit inverse of each diagonal block (forward substitution on I)
  so every panel/Schur/RHS update is an MXU matmul instead of a TRSM,
- Schur complements, panel solves and both triangular multi-RHS solves as
  static-sliced 2D MXU matmuls on refs (in-place, no full-matrix copies).

Everything inside the kernel is strictly 2D (Mosaic lowers neither batched
dots nor 1D intermediates); the small per-instance batch is a static
Python loop over ref slices.

Shapes: A (B, n, n) SPD, Bmat (B, n, k) -> X (B, n, k), T (B, k, k).
n and k are padded to multiples of the block size internally (identity
diagonal / zero right-hand sides, so padded outputs are exactly zero).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=a.dtype,
                               precision=jax.lax.Precision.HIGHEST)


def _mm(a, b):
    return _dot(a, b, ((1,), (0,)))


def _mmT(a, b):
    return _dot(a, b, ((1,), (1,)))


def _mTm(a, b):
    return _dot(a, b, ((0,), (0,)))


def _factor_block(D, nb):
    """Masked right-looking Cholesky of one (nb, nb) SPD block.

    Uses the symmetry of the trailing submatrix to read both the column
    (nb, 1) and the row (1, nb) form of the pivot axis — the rank-1 Schur
    update is then a broadcast product, no transpose."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    r_col = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    c_row = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)

    def step(k, D):
        colk = jnp.sum(jnp.where(cols == k, D, 0.0), axis=1, keepdims=True)
        rowk = jnp.sum(jnp.where(rows == k, D, 0.0), axis=0, keepdims=True)
        dkk = jnp.sum(jnp.where(r_col == k, colk, 0.0), axis=0,
                      keepdims=True)                       # (1, 1)
        inv_s = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
        lcol = jnp.where(r_col >= k, colk * inv_s, 0.0)    # (nb, 1)
        lcol_gt = jnp.where(r_col > k, lcol, 0.0)
        lrow_gt = jnp.where(c_row > k, rowk * inv_s, 0.0)  # (1, nb)
        D = D - lcol_gt * lrow_gt
        return jnp.where(cols == k, lcol, D)

    return jax.lax.fori_loop(0, nb, step, D)


def _invert_lower(L, nb):
    """Explicit inverse of one (nb, nb) lower-triangular block by forward
    substitution on the identity (row-by-row masked loop)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    c_row = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)

    def step(k, E):
        lrow = jnp.sum(jnp.where(rows == k, L, 0.0), axis=0, keepdims=True)
        lkk = jnp.sum(jnp.where(c_row == k, lrow, 0.0), axis=1,
                      keepdims=True)                       # (1, 1)
        lo = jnp.where(c_row < k, lrow, 0.0)               # (1, nb)
        acc = _mm(lo, E)                                   # (1, nb)
        ek = (c_row == k).astype(E.dtype)
        r = (ek - acc) / lkk
        return jnp.where(rows == k, r, E)

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(L))


def _fused_kernel(nb, n_blocks, bs, a_in, b_in, a_ref, b_ref, x_ref, y_ref,
                  t_ref, e_ref):
    """a_in/b_in are aliased with the a_ref/b_ref outputs (same VMEM
    buffers; only the out refs are touched).  Per batch element:
    a_ref (n, n) becomes L, b_ref (n, k) is consumed, x_ref = A^-1 B,
    y_ref = L^-1 B, t_ref = Y^T Y; e_ref scratch holds the per-block
    inverses (n, nb)."""
    del a_in, b_in
    n = nb * n_blocks

    for i in range(bs):
        # ---- factor + forward solve (right-looking, static blocks) ----
        for j in range(n_blocks):
            j0, j1 = j * nb, (j + 1) * nb
            D = _factor_block(a_ref[i, j0:j1, j0:j1], nb)
            a_ref[i, j0:j1, j0:j1] = D
            E = _invert_lower(D, nb)
            e_ref[i, j0:j1, :] = E
            Yj = _mm(E, b_ref[i, j0:j1, :])                # forward block
            y_ref[i, j0:j1, :] = Yj
            if j + 1 < n_blocks:
                L21 = _mmT(a_ref[i, j1:n, j0:j1], E)       # panel
                a_ref[i, j1:n, j0:j1] = L21
                a_ref[i, j1:n, j1:n] = (a_ref[i, j1:n, j1:n]
                                        - _mmT(L21, L21))  # Schur
                b_ref[i, j1:n, :] = b_ref[i, j1:n, :] - _mm(L21, Yj)

        # ---- backward solve: X = L^-T Y ----
        for j in range(n_blocks - 1, -1, -1):
            j0, j1 = j * nb, (j + 1) * nb
            R = y_ref[i, j0:j1, :]
            if j + 1 < n_blocks:
                R = R - _mTm(a_ref[i, j1:n, j0:j1], x_ref[i, j1:n, :])
            x_ref[i, j0:j1, :] = _mTm(e_ref[i, j0:j1, :], R)

        # ---- triple product: T = Y^T Y ----
        acc = None
        for j in range(n_blocks):
            j0, j1 = j * nb, (j + 1) * nb
            Yj = y_ref[i, j0:j1, :]
            c = _mTm(Yj, Yj)
            acc = c if acc is None else acc + c
        t_ref[i] = acc


@partial(jax.jit, static_argnames=("nb", "bs", "interpret"))
def fused_spd_multirhs(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                       bs: int = 1, interpret: bool | None = None):
    """Batched fused SPD factor + multi-RHS solve + triple product.

    A (P, n, n) SPD, B (P, n, k) -> (X = A^-1 B (P, n, k), T = Y^T Y (P, k, k))

    ``bs``: patches per kernel instance.  VMEM holds ~5 n^2-to-n*k sized
    buffers per instance (matrix in/out aliased + RHS + X + Y + scratch,
    double-buffered by the pipeline) — bs=1 fits the 16 MB VMEM at n=768.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, n0, _ = A.shape
    k0 = B.shape[-1]
    dt = A.dtype
    n = -(-n0 // nb) * nb
    # lane-dim efficiency: k padded to 128
    k = -(-k0 // 128) * 128
    Pp = -(-P // bs) * bs
    n_blocks = n // nb

    Ap = jnp.zeros((Pp, n, n), dt)
    Ap = Ap.at[:P, :n0, :n0].set(A)
    if n != n0 or Pp != P:
        # unit diagonal on padded rows/batches keeps the factor defined
        pad_diag = jnp.arange(n) >= n0
        eye_pad = jnp.where(pad_diag, 1.0, 0.0).astype(dt)
        Ap = Ap + jnp.diag(eye_pad)[None, :, :]
        if Pp != P:
            lead_eye = jnp.diag(
                jnp.where(jnp.arange(n) < n0, 1.0, 0.0).astype(dt))
            Ap = Ap.at[P:].add(lead_eye[None])
    Bp = jnp.zeros((Pp, n, k), dt).at[:P, :n0, :k0].set(B)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (Pp // bs,)
    mat_spec = pl.BlockSpec((bs, n, n), lambda i: (i, 0, 0))
    rhs_spec = pl.BlockSpec((bs, n, k), lambda i: (i, 0, 0))
    t_spec = pl.BlockSpec((bs, k, k), lambda i: (i, 0, 0))

    _, _, X, Y, T = pl.pallas_call(
        partial(_fused_kernel, nb, n_blocks, bs),
        grid=grid,
        in_specs=[mat_spec, rhs_spec],
        out_specs=(mat_spec, rhs_spec, rhs_spec, rhs_spec, t_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Pp, n, n), dt),   # L (aliased A)
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # consumed B (aliased)
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # X
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # Y
            jax.ShapeDtypeStruct((Pp, k, k), dt),   # T
        ),
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.VMEM((bs, n, nb), dt)],
        interpret=interpret,
    )(Ap, Bp)
    return X[:P, :n0, :k0], T[:P, :k0, :k0]
