"""Fused VMEM-resident SPD multi-RHS patch solver (Pallas TPU kernel).

Replaces the ``jnp.linalg.cholesky`` + two ``solve_triangular`` calls of the
per-patch solve (the TPU stand-in for the reference's Amesos-KLU multi-RHS
``Gauss_elimination``, include/LODtools.h:511-595).  XLA's batched Cholesky
and TRSM lower to ~1500 sequential panel micro-steps that each round-trip
the (n, n) matrix through HBM; here the whole factor + forward/backward
multi-RHS solve (+ the coarse triple product) runs on ONE VMEM residency of
the patch matrix:

    L L^T = A,    Y = L^-1 B,    X = A^-1 B = L^-T Y,    T = Y^T Y

per batch element, with

- the diagonal-block factor as an in-register masked right-looking loop
  (the unavoidable length-n dependency chain, but at VMEM latencies, with
  the batch dimension amortizing per-step overhead),
- an explicit inverse of each diagonal block (forward substitution on I)
  so every panel/Schur/RHS update is an MXU matmul instead of a TRSM,
- Schur complements, panel solves and both triangular multi-RHS solves as
  static-sliced MXU matmuls on refs (in-place, no full-matrix copies).

Shapes: A (B, n, n) SPD, Bmat (B, n, k) -> X, Y (B, n, k), T (B, k, k).
n and k are padded to multiples of the block size internally (identity
diagonal / zero right-hand sides, so padded outputs are exactly zero).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _factor_block(D, nb):
    """Masked right-looking Cholesky of (bs, nb, nb) SPD blocks."""
    rows = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 2)
    r1 = jax.lax.broadcasted_iota(jnp.int32, D.shape[:2], 1)

    def step(k, D):
        colk = jnp.sum(jnp.where(cols == k, D, 0.0), axis=2)   # (bs, nb)
        dkk = jnp.sum(jnp.where(r1 == k, colk, 0.0), axis=1)   # (bs,)
        inv_s = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
        l = jnp.where(r1 >= k, colk * inv_s[:, None], 0.0)     # col k of L
        lgt = jnp.where(r1 > k, l, 0.0)
        D = D - lgt[:, :, None] * lgt[:, None, :]
        return jnp.where(cols == k, l[:, :, None], D)

    return jax.lax.fori_loop(0, nb, step, D)


def _invert_lower(L, nb):
    """Explicit inverse of (bs, nb, nb) lower-triangular blocks by forward
    substitution on the identity (row-by-row masked loop)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, L.shape, 1)
    c1 = jax.lax.broadcasted_iota(jnp.int32, L.shape[:2], 1)

    def step(k, E):
        lrow = jnp.sum(jnp.where(rows == k, L, 0.0), axis=1)   # (bs, nb)
        lkk = jnp.sum(jnp.where(c1 == k, lrow, 0.0), axis=1)   # (bs,)
        lo = jnp.where(c1 < k, lrow, 0.0)
        acc = jnp.sum(lo[:, :, None] * E, axis=1)   # VPU row-matvec
        ek = (c1 == k).astype(E.dtype)
        r = (ek - acc) / lkk[:, None]
        return jnp.where(rows == k, r[:, None, :], E)

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(L))


# Mosaic's dot lowering takes 2D operands only (no batch dims): the small
# static batch is unrolled into per-element MXU dots.

def _bdot(a, b, dims):
    return jnp.stack([
        jax.lax.dot_general(a[i], b[i], (dims, ((), ())),
                            preferred_element_type=a.dtype)
        for i in range(a.shape[0])])


def _mm(a, b):
    return _bdot(a, b, ((1,), (0,)))


def _mmT(a, b):
    """a @ b^T, batched."""
    return _bdot(a, b, ((1,), (1,)))


def _mTm(a, b):
    """a^T @ b, batched."""
    return _bdot(a, b, ((0,), (0,)))


def _fused_kernel(nb, n_blocks, a_in, b_in, a_ref, b_ref, x_ref, y_ref,
                  t_ref, e_ref):
    """a_in/b_in are aliased with the a_ref/b_ref outputs (same VMEM buffer;
    only the out refs are touched).  a_ref (bs, n, n) in/out (becomes L),
    b_ref (bs, n, k) in/out (consumed), x_ref = A^-1 B, y_ref = L^-1 B,
    t_ref = Y^T Y; e_ref scratch holds the per-block inverses
    (bs, n_blocks*nb, nb)."""
    del a_in, b_in
    n = nb * n_blocks

    # ---- factor + forward solve (right-looking over static blocks) ----
    for j in range(n_blocks):
        j0, j1 = j * nb, (j + 1) * nb
        D = _factor_block(a_ref[:, j0:j1, j0:j1], nb)
        a_ref[:, j0:j1, j0:j1] = D
        E = _invert_lower(D, nb)
        e_ref[:, j0:j1, :] = E
        # forward solve on the RHS block: Y_j = E @ B_j
        Yj = _mm(E, b_ref[:, j0:j1, :])
        y_ref[:, j0:j1, :] = Yj
        if j + 1 < n_blocks:
            # panel: L21 = A21 @ E^T   (trailing rows)
            L21 = _mmT(a_ref[:, j1:n, j0:j1], E)
            a_ref[:, j1:n, j0:j1] = L21
            # Schur: A22 -= L21 @ L21^T
            a_ref[:, j1:n, j1:n] = (a_ref[:, j1:n, j1:n]
                                    - _mmT(L21, L21))
            # RHS update: B2 -= L21 @ Y_j
            b_ref[:, j1:n, :] = b_ref[:, j1:n, :] - _mm(L21, Yj)

    # ---- backward solve: X = L^-T Y ----
    for j in range(n_blocks - 1, -1, -1):
        j0, j1 = j * nb, (j + 1) * nb
        R = y_ref[:, j0:j1, :]
        if j + 1 < n_blocks:
            # R -= L[i>j, j]^T X[i>j]
            R = R - _mTm(a_ref[:, j1:n, j0:j1], x_ref[:, j1:n, :])
        Ej = e_ref[:, j0:j1, :]
        x_ref[:, j0:j1, :] = _mTm(Ej, R)

    # ---- triple product: T = Y^T Y ----
    acc = None
    for j in range(n_blocks):
        j0, j1 = j * nb, (j + 1) * nb
        Yj = y_ref[:, j0:j1, :]
        c = _mTm(Yj, Yj)
        acc = c if acc is None else acc + c
    t_ref[:] = acc


@partial(jax.jit, static_argnames=("nb", "bs", "interpret"))
def fused_spd_multirhs(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                       bs: int = 1, interpret: bool | None = None):
    """Batched fused SPD factor + multi-RHS solve + triple product.

    A (P, n, n) SPD, B (P, n, k) -> (X = A^-1 B (P, n, k), T = Y^T Y (P, k, k))

    ``bs``: patches per kernel instance (VMEM residency is ~(bs * n^2 * 4) B
    for the matrix; keep bs * n^2 * 4 well under the ~16 MB VMEM).
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
        # unit diagonal on padded rows keeps the factor well-defined
        pad_diag = jnp.arange(n) >= n0
        eye_pad = jnp.where(pad_diag, 1.0, 0.0).astype(dt)
        Ap = Ap + jnp.diag(eye_pad)[None, :, :]
        if Pp != P:
            # padded batch entries: identity matrices
            full_eye = jnp.eye(n, dtype=dt)
            Ap = Ap.at[P:].add(
                jnp.where(jnp.arange(n) < n0, 1.0, 0.0).astype(dt)
                * full_eye[None])
    Bp = jnp.zeros((Pp, n, k), dt).at[:P, :n0, :k0].set(B)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (Pp // bs,)
    mat_spec = pl.BlockSpec((bs, n, n), lambda i: (i, 0, 0))
    rhs_spec = pl.BlockSpec((bs, n, k), lambda i: (i, 0, 0))
    t_spec = pl.BlockSpec((bs, k, k), lambda i: (i, 0, 0))

    _, _, X, Y, T = pl.pallas_call(
        partial(_fused_kernel, nb, n_blocks),
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
