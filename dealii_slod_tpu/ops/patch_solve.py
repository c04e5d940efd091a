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


def _gj_invert_spd(M, nb, bs):
    """Batched in-place Gauss-Jordan (sweep) inversion of (bs, nb, nb) SPD
    blocks.  Pure 3D elementwise/reduction ops — no dots — so the nb-step
    scalar dependency chain (the latency wall of any factorization) is
    *shared across the bs patches* of the kernel instance instead of paid
    once per patch.  No pivoting: SPD pivots stay positive under sweeps."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, nb, nb), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, nb, nb), 2)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (bs, 1, nb), 2)

    def step(k, M):
        colk = jnp.sum(jnp.where(cols == k, M, 0.0), axis=2, keepdims=True)
        rowk = jnp.sum(jnp.where(rows == k, M, 0.0), axis=1, keepdims=True)
        p = jnp.sum(jnp.where(c1 == k, rowk, 0.0), axis=2, keepdims=True)
        d = 1.0 / p
        Mn = M - (colk * d) * rowk
        Mn = jnp.where(rows == k, rowk * d, Mn)
        Mn = jnp.where(cols == k, colk * d, Mn)
        return jnp.where((rows == k) & (cols == k), -d, Mn)

    # after sweeping every k the matrix holds -M^-1
    return -jax.lax.fori_loop(0, nb, step, M)


def _gj_invert_spd2(M, nb, bs):
    """`_gj_invert_spd` with 2x2 pivot BLOCKS: half the sequential sweep
    steps at ~1.7x the per-step elementwise work.  Inside the fused solve
    kernels the (bs, nb, nb) sweep operands are small (bs <= 4) and the
    chain is LATENCY-bound, so halving the step count wins there — unlike
    the standalone large-batch regime (2048, 125, 125) where the same
    transformation measured flat-to-slower (throughput-bound; ROADMAP r3
    dead ends).  The 2x2 pivot P = [[a, b], [b, c]] is inverted in closed
    form; SPD principal minors keep det = a c - b^2 > 0 under sweeps, so
    no pivoting is needed (same argument as the scalar sweep).  Requires
    even nb (the kernels use nb in {64, 128})."""
    assert nb % 2 == 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, nb, nb), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, nb, nb), 2)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (bs, 1, nb), 2)

    def step(k2, M):
        k = 2 * k2
        col0 = jnp.sum(jnp.where(cols == k, M, 0.0), axis=2, keepdims=True)
        col1 = jnp.sum(jnp.where(cols == k + 1, M, 0.0), axis=2,
                       keepdims=True)
        row0 = jnp.sum(jnp.where(rows == k, M, 0.0), axis=1, keepdims=True)
        row1 = jnp.sum(jnp.where(rows == k + 1, M, 0.0), axis=1,
                       keepdims=True)
        a = jnp.sum(jnp.where(c1 == k, row0, 0.0), axis=2, keepdims=True)
        b = jnp.sum(jnp.where(c1 == k + 1, row0, 0.0), axis=2, keepdims=True)
        c = jnp.sum(jnp.where(c1 == k + 1, row1, 0.0), axis=2, keepdims=True)
        idet = 1.0 / (a * c - b * b)
        cp0 = (col0 * c - col1 * b) * idet        # [col0 col1] @ Pi, col 0
        cp1 = (col1 * a - col0 * b) * idet
        pr0 = (row0 * c - row1 * b) * idet        # Pi @ [row0; row1], row 0
        pr1 = (row1 * a - row0 * b) * idet
        Mn = M - cp0 * row0 - cp1 * row1
        Mn = jnp.where(cols == k, cp0, Mn)
        Mn = jnp.where(cols == k + 1, cp1, Mn)
        # row writes last: they carry the -Pi pivot block (Pi @ rows would
        # put the identity there), overriding the column writes' pivot rows
        pr0 = jnp.where(c1 == k, -c * idet, jnp.where(c1 == k + 1, b * idet,
                                                      pr0))
        pr1 = jnp.where(c1 == k, b * idet, jnp.where(c1 == k + 1, -a * idet,
                                                     pr1))
        Mn = jnp.where(rows == k, pr0, Mn)
        return jnp.where(rows == k + 1, pr1, Mn)

    return -jax.lax.fori_loop(0, nb // 2, step, M)


def _fused_kernel_ldl_noalias(nb, n_blocks, bs, a_in, b_in, a_ref, b_ref,
                              t_ref):
    """No-aliasing variant: copies the inputs into the output refs in VMEM
    first, then runs the in-place LDL on the outputs.  Costs one extra
    VMEM residency of A per instance but sidesteps input/output aliasing."""
    a_ref[:] = a_in[:]
    b_ref[:] = b_in[:]
    _fused_kernel_ldl(nb, n_blocks, bs, None, None, a_ref, b_ref, t_ref)


def _fused_kernel_ldl_scratch(nb, n_blocks, bs, gj2, a_in, b_in, x_ref,
                              t_ref, a_scr):
    """Scratch-workspace variant: the factor runs on a VMEM scratch copy of
    A (the L panels are never an output — the pipeline only consumes X and
    T), and the RHS evolves in place in the X output ref.  No aliasing, no
    (P, n, n) factor writeback to HBM."""
    a_scr[:] = a_in[:]
    x_ref[:] = b_in[:]
    _fused_kernel_ldl(nb, n_blocks, bs, None, None, a_scr, x_ref, t_ref,
                      gj2=gj2)


def _fused_kernel_ldl_dma(pl, pltpu, nb, n_blocks, bs, gj2, a_hbm, b_in,
                          x_ref, t_ref, a_scr, sem):
    """Manual-DMA variant for bs > 1: A stays in HBM (``memory_space=ANY``)
    and the instance's (bs, n, n) slab is DMA'd straight into the single
    VMEM scratch — without this, the pipeline double-buffers the A block on
    top of the scratch copy and blows the 16 MB VMEM budget at bs >= 2.
    The A fetch (~10 us at bs=4) is negligible against the ~ms factor, so
    losing the automatic prefetch overlap costs nothing."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(a_hbm.at[pl.ds(i * bs, bs)], a_scr, sem)
    cp.start()
    x_ref[:] = b_in[:]
    cp.wait()
    _fused_kernel_ldl(nb, n_blocks, bs, None, None, a_scr, x_ref, t_ref,
                      gj2=gj2)


def _fused_kernel_ldl_dma2(pl, pltpu, nb, n_blocks, bs, gj2, a_hbm, b_hbm,
                           x_hbm, t_ref, a_scr, x_scr, sem_a, sem_b, sem_x):
    """Full-DMA variant for bs >= 4: A, B *and* X all stay in HBM
    (``memory_space=ANY``) and move via explicit copies into/out of single
    VMEM scratch buffers.  The pipelined BlockSpec path double-buffers every
    block-specced operand, which at bs=4 (scratch 9.4 MB + 2x2x1.6 MB RHS
    buffers) blows the 16 MB VMEM budget — with manual DMA only one copy of
    each buffer is resident (~11.5 MB)."""
    i = pl.program_id(0)
    cpa = pltpu.make_async_copy(a_hbm.at[pl.ds(i * bs, bs)], a_scr, sem_a)
    cpb = pltpu.make_async_copy(b_hbm.at[pl.ds(i * bs, bs)], x_scr, sem_b)
    cpa.start()
    cpb.start()
    cpa.wait()
    cpb.wait()
    _fused_kernel_ldl(nb, n_blocks, bs, None, None, a_scr, x_scr, t_ref,
                      gj2=gj2)
    cpx = pltpu.make_async_copy(x_scr, x_hbm.at[pl.ds(i * bs, bs)], sem_x)
    cpx.start()
    cpx.wait()


def _fused_kernel_ldl_dma_nt(pl, pltpu, nb, n_blocks, bs, gj2, a_hbm, b_hbm,
                             x_hbm, a_scr, x_scr, sem_a, sem_b, sem_x):
    """Solve-only full-DMA variant (no T output): used by the split Schur
    path where the RHS block is wide (k ~ n/2) and a (k, k) T would not fit
    VMEM; T is assembled at the XLA level from the solve results."""
    i = pl.program_id(0)
    cpa = pltpu.make_async_copy(a_hbm.at[pl.ds(i * bs, bs)], a_scr, sem_a)
    cpb = pltpu.make_async_copy(b_hbm.at[pl.ds(i * bs, bs)], x_scr, sem_b)
    cpa.start()
    cpb.start()
    cpa.wait()
    cpb.wait()
    _fused_kernel_ldl(nb, n_blocks, bs, None, None, a_scr, x_scr, None,
                      col_blocked=True, gj2=gj2)
    cpx = pltpu.make_async_copy(x_scr, x_hbm.at[pl.ds(i * bs, bs)], sem_x)
    cpx.start()
    cpx.wait()


def _fused_kernel_ldl(nb, n_blocks, bs, a_in, b_in, a_ref, b_ref, t_ref,
                      col_blocked=False, gj2=False):
    """Block-LDL^T fused factor + multi-RHS solve + triple product.

    A = L D L^T with unit-diagonal block lower L and SPD diagonal blocks D;
    the diagonal blocks are inverted by `_gj_invert_spd` (batched across the
    instance's bs patches — this removes the per-patch scalar-chain latency
    that dominated the Cholesky formulation), every panel/Schur/RHS update
    is a per-patch 2D MXU dot.

    a_ref (bs, n, n) aliased in/out: lower panels become L, diagonal blocks
    are consumed.  b_ref (bs, n, k) aliased in/out: holds B -> z = L^-1 B ->
    w = D^-1 z -> X = L^-T w = A^-1 B in place.  t_ref accumulates
    T = sum_j z_j^T D_j^-1 z_j = B^T A^-1 B (== Y^T Y of the Cholesky form);
    pass ``t_ref=None`` to skip it (the split Schur path computes T at the
    XLA level instead).
    """
    del a_in, b_in
    n = nb * n_blocks
    gj = _gj_invert_spd2 if gj2 else _gj_invert_spd

    # ---- forward: factor, z = L^-1 B, w = D^-1 z, T accumulation ----
    for j in range(n_blocks):
        j0, j1 = j * nb, (j + 1) * nb
        Dinv = gj(a_ref[:, j0:j1, j0:j1], nb, bs)
        for i in range(bs):
            zj = b_ref[i, j0:j1, :]                    # (nb, k)
            wj = _mm(Dinv[i], zj)                      # D_j^-1 z_j
            if t_ref is not None:
                c = _mTm(zj, wj)
                t_ref[i] = c if j == 0 else t_ref[i] + c
            if j + 1 < n_blocks:
                Aij = a_ref[i, j1:n, j0:j1]            # raw sub-diag panel
                W = _mm(Aij, Dinv[i])                  # L_{i>j, j}
                if col_blocked:
                    # panel-blocked trailing updates: the whole-trailing
                    # Schur temp ((n-j1)^2) and rhs temp ((n-j1) x k) blow
                    # the 16 MB scoped-VMEM budget at elasticity sizes;
                    # per 128-column panel the temps are (n, nb) / (nb, k).
                    # W stays a value so the raw Aij rows remain readable
                    # from a_ref until every panel is updated.
                    for jj in range(j + 1, n_blocks):
                        jj0, jj1 = jj * nb, (jj + 1) * nb
                        a_ref[i, j1:n, jj0:jj1] = (
                            a_ref[i, j1:n, jj0:jj1]
                            - _mmT(W, a_ref[i, jj0:jj1, j0:j1]))
                        b_ref[i, jj0:jj1, :] = (
                            b_ref[i, jj0:jj1, :]
                            - _mm(W[jj0 - j1:jj1 - j1], zj))
                    a_ref[i, j1:n, j0:j1] = W
                else:
                    a_ref[i, j1:n, j0:j1] = W
                    a_ref[i, j1:n, j1:n] = (a_ref[i, j1:n, j1:n]
                                            - _mmT(W, Aij))  # Schur
                    b_ref[i, j1:n, :] = b_ref[i, j1:n, :] - _mm(W, zj)
            b_ref[i, j0:j1, :] = wj                    # z_j -> w_j in place

    # ---- backward: X = L^-T w (in place in b_ref) ----
    for j in range(n_blocks - 2, -1, -1):
        j0, j1 = j * nb, (j + 1) * nb
        for i in range(bs):
            b_ref[i, j0:j1, :] = (b_ref[i, j0:j1, :]
                                  - _mTm(a_ref[i, j1:n, j0:j1],
                                         b_ref[i, j1:n, :]))


def _fused_kernel_ldl_pipe(pl, pltpu, nb, n_blocks, bs, a_hbm, b_hbm, x_hbm,
                           t_ref, a_scr, x_scr, sem_a, sem_b, sem_x):
    """Half-staggered LDL^T: the instance batch is split in two halves whose
    panel loops are offset so every batched Gauss-Jordan diagonal inverse
    (VPU-bound dependency chain) sits adjacent to the OTHER half's panel
    dots (MXU-bound) in program order — the units are independent pipes, so
    the scheduler can overlap them instead of serializing chain + dots.
    Same algebra and memory plan as the full-DMA ldl variant."""
    i = pl.program_id(0)
    cpa = pltpu.make_async_copy(a_hbm.at[pl.ds(i * bs, bs)], a_scr, sem_a)
    cpb = pltpu.make_async_copy(b_hbm.at[pl.ds(i * bs, bs)], x_scr, sem_b)
    cpa.start()
    cpb.start()
    cpa.wait()
    cpb.wait()
    n = nb * n_blocks
    h = bs // 2

    def gj_half(lo, hi, j):
        j0, j1 = j * nb, (j + 1) * nb
        return _gj_invert_spd(a_scr[lo:hi, j0:j1, j0:j1], nb, hi - lo)

    def dots_half(lo, hi, j, Dinv):
        j0, j1 = j * nb, (j + 1) * nb
        for ii in range(lo, hi):
            zj = x_scr[ii, j0:j1, :]
            wj = _mm(Dinv[ii - lo], zj)
            c = _mTm(zj, wj)
            t_ref[ii] = c if j == 0 else t_ref[ii] + c
            if j + 1 < n_blocks:
                Aij = a_scr[ii, j1:n, j0:j1]
                W = _mm(Aij, Dinv[ii - lo])
                a_scr[ii, j1:n, j0:j1] = W
                a_scr[ii, j1:n, j1:n] = (a_scr[ii, j1:n, j1:n]
                                         - _mmT(W, Aij))
                x_scr[ii, j1:n, :] = x_scr[ii, j1:n, :] - _mm(W, zj)
            x_scr[ii, j0:j1, :] = wj

    DA = gj_half(0, h, 0)
    for j in range(n_blocks):
        DB = gj_half(h, bs, j)          # independent of half-A dots of j
        dots_half(0, h, j, DA)
        if j + 1 < n_blocks:
            DA = gj_half(0, h, j + 1)   # half-A Schur of j just completed
        dots_half(h, bs, j, DB)

    for j in range(n_blocks - 2, -1, -1):
        j0, j1 = j * nb, (j + 1) * nb
        for ii in range(bs):
            x_scr[ii, j0:j1, :] = (x_scr[ii, j0:j1, :]
                                   - _mTm(a_scr[ii, j1:n, j0:j1],
                                          x_scr[ii, j1:n, :]))
    cpx = pltpu.make_async_copy(x_scr, x_hbm.at[pl.ds(i * bs, bs)], sem_x)
    cpx.start()
    cpx.wait()


def _fused_kernel_ldlt_dma(pl, pltpu, nb, n_blocks, n, k, bs, gj2, ah_hbm,
                           xt_ref, scr, sem):
    """Stacked transposed-RHS LDL^T: the instance's working set is ONE
    (bs, n + k, n) buffer  Ahat = [[A], [B^T]].

    Why: in the row-major RHS formulation every panel step issues 5 dots
    per patch (panel solve, Schur, RHS update, w, T-accumulate) and Mosaic
    pays ~2 us of issue overhead per dot — the kernel is op-issue-bound,
    not MXU-bound (ROADMAP round-2/3 measurements).  With B^T stacked
    *below* A the Schur update of the trailing A rows and the forward
    update of the RHS rows are THE SAME matmul:

        col_j = Ahat[j1:, j0:j1]          (raw trailing A panel over z_j^T)
        W_all = col_j D_j^-1              -> [L_panel ; w_j^T]   (1 dot)
        Ahat[j1:, j1:n] -= W_all A_panel^T                       (1 dot)

    because  b^T[:, j1:n] -= z_j^T D^-1 A_panel^T = (W z_j)^T  is exactly
    the bottom-row block of the joint update.  2 dots per (patch, panel) —
    both larger than any dot of the 5-dot form — and T = B^T X moves out
    of the kernel to one batched XLA einsum.  The backward substitution
    runs on the bottom rows in place, leaving X^T there."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(ah_hbm.at[pl.ds(i * bs, bs)], scr, sem)
    cp.start()
    cp.wait()
    m = n + k

    gj = _gj_invert_spd2 if gj2 else _gj_invert_spd
    for j in range(n_blocks):
        j0, j1 = j * nb, (j + 1) * nb
        Dinv = gj(scr[:, j0:j1, j0:j1], nb, bs)
        for b in range(bs):
            colj = scr[b, j1:m, j0:j1]            # (m - j1, nb), raw
            W_all = _mm(colj, Dinv[b])            # [L_{>j,j} ; w_j^T]
            if j + 1 < n_blocks:
                rawA = colj[:n - j1]              # raw trailing A panel
                scr[b, j1:m, j1:n] = (scr[b, j1:m, j1:n]
                                      - _mmT(W_all, rawA))
            scr[b, j1:m, j0:j1] = W_all

    # backward: X^T = w^T - X^T_{trail} L_{trail, j}  (in place in xt_ref)
    for b in range(bs):
        xt_ref[b] = scr[b, n:m, :]
    for j in range(n_blocks - 2, -1, -1):
        j0, j1 = j * nb, (j + 1) * nb
        for b in range(bs):
            xt_ref[b, :, j0:j1] = (xt_ref[b, :, j0:j1]
                                   - _mm(xt_ref[b, :, j1:n],
                                         scr[b, j1:n, j0:j1]))


def _gj_inverse_kernel(nb, bs, a_in, o_ref):
    o_ref[:] = _gj_invert_spd(a_in[:], nb, bs)


@partial(jax.jit, static_argnames=("bs", "interpret"))
def gj_inverse_pallas(A: jnp.ndarray, bs: int = 16,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Batched SPD inverse as one Pallas kernel: (B, n, n) -> (B, n, n).

    The batched Gauss-Jordan sweep shares its n-step scalar chain across
    the ``bs`` matrices of each instance — XLA's batched Cholesky + two
    triangular solves (``spd_inverse``) pays the chain per matrix and, when
    called under ``vmap`` (as the SLOD ``finish`` stage did), loses the
    batch entirely.  Intended for the small (~128) SLOD coarse blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B0, n0, _ = A.shape
    dt = A.dtype
    n = -(-n0 // 128) * 128
    # VMEM: the pipelined in+out blocks double-buffer (4 residencies of
    # bs*n^2 floats) plus the sweep's row/col temporaries.  Rather than
    # clamping bs to the default 16M scoped limit (the old 12e6/28 guard
    # landed bs=26 at n=128 — 15 sequential grid instances for the
    # elasticity Gram pivots), raise the limit via CompilerParams up to
    # a 48M budget; every instance halved is half the sequential
    # nb-step chains.
    bpe = dt.itemsize
    bs = min(bs, max(1, int(48e6 / (6 * n * n * bpe))), B0)
    resid = 6 * bs * n * n * bpe
    vmem_limit = (min(int(resid * 1.2), 100 * 2 ** 20)
                  if resid * 1.2 > 16 * 2 ** 20 else None)
    B = -(-B0 // bs) * bs
    Ap = jnp.zeros((B, n, n), dt)
    Ap = Ap.at[:B0, :n0, :n0].set(A)
    if n != n0 or B != B0:
        pad_diag = jnp.where(jnp.arange(n) >= n0, 1.0, 0.0).astype(dt)
        Ap = Ap + jnp.diag(pad_diag)[None]
        if B != B0:
            lead = jnp.diag(jnp.where(jnp.arange(n) < n0, 1.0, 0.0).astype(dt))
            Ap = Ap.at[B0:].add(lead[None])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = pl.BlockSpec((bs, n, n), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        partial(_gj_inverse_kernel, n, bs),
        grid=(B // bs,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, n, n), dt),
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit)} if vmem_limit else {}),
        interpret=interpret,
    )(Ap)
    return out[:B0, :n0, :n0]


@partial(jax.jit, static_argnames=("nb",))
def spd_inverse_schur(M: jnp.ndarray, nb: int = 128) -> jnp.ndarray:
    """Batched SPD inverse by a BLOCKED Gauss-Jordan sweep:
    (B, n, n) -> (B, n, n).

    The exact same sweep operator as the scalar `gj_inverse_pallas`
    (statistics "SWEEP"; stable without pivoting for SPD) applied to
    nb x nb pivot BLOCKS: per block, invert the pivot with the scalar
    Pallas sweep (cheap — the (B, nb, nb) leaf shares its nb-step chain
    across a large bs) and apply the rank-nb row/column/corner updates as
    batched MXU einsums at the XLA level.  The scalar sweep at the 3D
    elasticity Gram shape (B=384, n=375 -> padded 384, bs clamped to 2
    by its VMEM guard) is 192 sequential grid instances x 384 sequential
    VPU steps — measured 119 ms on the v5e, ~90 ms of the smallk
    spectral stage's real per-chunk cost; the blocked form pays n/nb
    pivot inversions + O(n^3) of MXU matmul.

    NOT the 2x2 recursive Schur inversion formula: that was measured a
    DECADE less accurate than the sweep at the jitter-floored Gram
    conditioning (residual 0.12 vs 0.013 at cond ~1e6), and
    Newton-Schulz polishing diverges there (spectral residual > 1 in the
    worst directions).  Block sweeps compose identically to scalar
    sweeps, so accuracy matches the scalar kernel by construction."""
    B0, n0, _ = M.shape
    dt = M.dtype
    if n0 <= nb:
        return gj_inverse_pallas(M)
    n = -(-n0 // nb) * nb
    if n != n0:
        # identity-extend: sweeping the block-diagonal extension inverts
        # the original block and leaves the pad decoupled
        Mp = jnp.zeros((B0, n, n), dt).at[:, :n0, :n0].set(M)
        pad_diag = jnp.where(jnp.arange(n) >= n0, 1.0, 0.0).astype(dt)
        M = Mp + jnp.diag(pad_diag)[None]
    # the rank-nb updates are cancellation-sensitive (exactly like the
    # sweep's rank-1 updates); at ambient precision "high" (3-pass bf16)
    # the residual was 10x the scalar sweep's, at HIGHEST it matches
    # (0.0089 vs 0.0128 measured at cond ~1e6) — pin it, the whole
    # matmul budget here is ~2 ms
    hi = jax.lax.Precision.HIGHEST
    for k0 in range(0, n, nb):
        k1 = k0 + nb
        P = M[:, k0:k1, k0:k1]
        Pi = gj_inverse_pallas(P, bs=64)
        colk = M[:, :, k0:k1]                              # (B, n, nb)
        rowk = M[:, k0:k1, :]                              # (B, nb, n)
        CPi = jnp.einsum("bin,bnm->bim", colk, Pi, precision=hi)
        M = M - jnp.einsum("bim,bmj->bij", CPi, rowk, precision=hi)
        M = M.at[:, :, k0:k1].set(CPi)
        M = M.at[:, k0:k1, :].set(
            jnp.einsum("bnm,bmj->bnj", Pi, rowk, precision=hi))
        M = M.at[:, k0:k1, k0:k1].set(-Pi)
    return -M[:, :n0, :n0]


def _fused_kernel_chol_noalias(nb, n_blocks, bs, a_in, b_in, a_ref, b_ref,
                               x_ref, y_ref, t_ref, e_ref):
    """No-aliasing wrapper for the Cholesky kernel: input/output aliasing
    silently corrupts VMEM on pipelined grids on some backends (observed on
    the axon-tunneled v5e at grid >= ~32: every output NaN), so the inputs
    are copied into the output refs explicitly."""
    a_ref[:] = a_in[:]
    b_ref[:] = b_in[:]
    _fused_kernel(nb, n_blocks, bs, None, None, a_ref, b_ref, x_ref, y_ref,
                  t_ref, e_ref)


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


@partial(jax.jit, static_argnames=("nb", "bs", "interpret", "gj2"))
def spd_multirhs_solve_dma(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                           bs: int = 1, interpret: bool | None = None,
                           gj2: bool = False) -> jnp.ndarray:
    """Solve-only fused kernel (no T), all operands in HBM via manual
    DMA — the building block of `fused_spd_multirhs_split` where the RHS is
    a wide (n, ~n/2 + k) block that exceeds the pipelined-BlockSpec VMEM
    budget.  A (P, n, n) SPD, B (P, n, k) -> X = A^-1 B.

    ``bs`` patches per kernel instance share the factor's length-n scalar
    chain (the latency wall); above bs=1 the scratch residency exceeds the
    default 16M scoped-VMEM limit and is raised via CompilerParams (v5e:
    128M physical)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, n0, _ = A.shape
    k0 = B.shape[-1]
    dt = A.dtype
    n = -(-n0 // nb) * nb
    k = -(-k0 // 128) * 128
    n_blocks = n // nb
    Pp = -(-P // bs) * bs
    Ap = jnp.zeros((Pp, n, n), dt)
    Ap = Ap.at[:P, :n0, :n0].set(A)
    if n != n0 or Pp != P:
        pad_diag = jnp.where(jnp.arange(n) >= n0, 1.0, 0.0).astype(dt)
        Ap = Ap + jnp.diag(pad_diag)[None]
        if Pp != P:
            lead_eye = jnp.diag(
                jnp.where(jnp.arange(n) < n0, 1.0, 0.0).astype(dt))
            Ap = Ap.at[P:].add(lead_eye[None])
    Bp = jnp.zeros((Pp, n, k), dt).at[:P, :n0, :k0].set(B)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # CPU/debug path: plain solve (the DMA kernel is TPU-only)
        return jnp.linalg.solve(Ap, Bp)[:P, :n0, :k0]
    scratch_bytes = dt.itemsize * bs * (n * n + n * k)
    vmem_limit = (min(int(scratch_bytes * 1.3), 110 * 2 ** 20)
                  if scratch_bytes * 1.3 > 16 * 2 ** 20 else None)
    X = pl.pallas_call(
        partial(_fused_kernel_ldl_dma_nt, pl, pltpu, nb, n_blocks, bs,
                gj2),
        grid=(Pp // bs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Pp, n, k), dt),
        scratch_shapes=[pltpu.VMEM((bs, n, n), dt),
                        pltpu.VMEM((bs, n, k), dt),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit)} if vmem_limit else {}),
    )(Ap, Bp)
    return X[:P, :n0, :k0]


# scoped-VMEM budget for one solve-only DMA call: scratch A (4 n^2) +
# scratch X (4 n k) must leave room for the kernel's panel temps and the
# GJ working set (~3-4 MB of the 16 MB scope)
_SOLVE_VMEM_BUDGET = int(9.5e6)


def _solve_fits(n: int, k: int, nb: int) -> bool:
    np_ = -(-n // nb) * nb
    kp = -(-k // 128) * 128
    return 4 * (np_ * np_ + np_ * kp) <= _SOLVE_VMEM_BUDGET


def _solve_rec(A: jnp.ndarray, B: jnp.ndarray, nb: int,
               bs: int = 1, gj2: bool = False) -> jnp.ndarray:
    """Solve-only A^-1 B with recursive 2x2 block-Cholesky (Schur) splits
    until each sub-solve fits the VMEM budget.  Exact algebra; the Schur
    formation / back-substitution are batched MXU matmuls at the XLA
    level.  ``bs`` batches patches per leaf-kernel instance (shared factor
    chain; scoped-VMEM limit raised inside the leaf as needed)."""
    P, n0, _ = A.shape
    k0 = B.shape[-1]
    if _solve_fits(n0, k0, nb):
        return spd_multirhs_solve_dma(A, B, nb=nb, bs=bs, gj2=gj2)
    # largest leading block whose (A11, [A12 | B1]) call fits
    n1 = 0
    for cand in range(nb, n0, nb):
        if _solve_fits(cand, (n0 - cand) + k0, nb):
            n1 = cand
    if n1 == 0:
        # RHS too wide even for the smallest block: split the RHS columns
        half = -(-k0 // 256) * 128
        return jnp.concatenate(
            [_solve_rec(A, B[:, :, :half], nb, bs, gj2),
             _solve_rec(A, B[:, :, half:], nb, bs, gj2)], axis=-1)
    A11 = A[:, :n1, :n1]
    A12 = A[:, :n1, n1:]
    A22 = A[:, n1:, n1:]
    U = _solve_rec(A11, jnp.concatenate([A12, B[:, :n1, :]], axis=-1), nb,
                   bs, gj2)
    n2 = n0 - n1
    U_A = U[:, :, :n2]                       # A11^-1 A12
    U_B = U[:, :, n2:]                       # A11^-1 B1
    S = A22 - jnp.einsum("bji,bjk->bik", A12, U_A)
    Y = B[:, n1:, :] - jnp.einsum("bji,bjk->bik", A12, U_B)
    X2 = _solve_rec(S, Y, nb, bs, gj2)
    X1 = U_B - jnp.einsum("bik,bkj->bij", U_A, X2)
    return jnp.concatenate([X1, X2], axis=1)


@partial(jax.jit, static_argnames=("nb", "bs", "gj2"))
def fused_spd_multirhs_split(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                             bs: int = 1, gj2: bool = False):
    """Fused SPD multi-RHS solve + triple product for matrices too large for
    one VMEM residency (3D elasticity: n = 3 * 729 = 2187 -> ~21 MB), by
    exact recursive 2x2 block-Cholesky (Schur-complement) splits:

        A = [[A11, A12], [A12^T, A22]],   S = A22 - A12^T A11^-1 A12

    Each sub-block runs the solve-only DMA kernel (panel-blocked trailing
    updates keep its scoped-VMEM temps small); Schur formation, the
    back-substitution and T = B^T X are large MXU matmuls at the XLA level.
    Same contract as `fused_spd_multirhs`: returns (X = A^-1 B,
    T = B^T A^-1 B).  Replaces the reference's whole-patch Amesos KLU solve
    (include/LODtools.h:511-595) at elasticity sizes."""
    X = _solve_rec(A, B, nb, bs, gj2)
    T = jnp.einsum("bik,bij->bkj", B, X)
    return X, 0.5 * (T + jnp.swapaxes(T, -1, -2))


@partial(jax.jit, static_argnames=("nb", "gj_bs"))
def panel_spd_multirhs(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                       gj_bs: int = 16):
    """Batched SPD multi-RHS solve + triple product as XLA-level
    panel-blocked LDL^T.

    A (P, n, n) SPD, B (P, n, k) -> (X = A^-1 B, T = B^T A^-1 B).

    Same contract as ``fused_spd_multirhs``/``fused_spd_multirhs_split``
    (the reference's whole-patch multi-RHS direct solve,
    include/LODtools.h:511-595), but the factorization runs OUTSIDE
    Pallas: per panel step the trailing (Schur) update and the panel
    scaling are single batched matmuls over the WHOLE patch batch —
    (P, n-j, nb) x (P, nb, n-j) MXU work at full batch width — and only
    the (nb, nb) diagonal-block inverses run in the batched Gauss-Jordan
    Pallas kernel.  ~n/nb large XLA ops per stage instead of the fused
    kernel's per-instance cascade of ~(n/nb)^2 VMEM-resident small dots,
    and no whole-matrix VMEM residency requirement — the same code path
    covers the diffusion (n=768) and 3D-elasticity (n=2187) shapes."""
    P, n0, _ = A.shape
    k = B.shape[-1]
    dt = A.dtype
    n = -(-n0 // nb) * nb
    n_blocks = n // nb
    if n != n0:
        W = jnp.zeros((P, n, n), dt).at[:, :n0, :n0].set(A)
        pad = jnp.where(jnp.arange(n) >= n0, 1.0, 0.0).astype(dt)
        W = W + jnp.diag(pad)[None]
        Z = jnp.zeros((P, n, k), dt).at[:, :n0, :].set(B)
    else:
        W, Z = A, B

    # right-looking block-LDL^T: A = L D L^T, unit block-diagonal L
    Ls, Dinvs = [], []
    for j in range(n_blocks):
        j0, j1 = j * nb, (j + 1) * nb
        D = jax.lax.slice(W, (0, j0, j0), (P, j1, j1))
        Dinv = gj_inverse_pallas(D, bs=gj_bs)
        Dinvs.append(Dinv)
        if j1 < n:
            Wj = jax.lax.slice(W, (0, j1, j0), (P, n, j1))   # (P, n-j1, nb)
            Lj = jnp.einsum("pab,pbc->pac", Wj, Dinv)
            Ls.append(Lj)
            trail = jax.lax.slice(W, (0, j1, j1), (P, n, n))
            W = jax.lax.dynamic_update_slice(
                W, trail - jnp.einsum("pab,pcb->pac", Lj, Wj), (0, j1, j1))
    # forward substitution L z = B
    for j in range(n_blocks - 1):
        j0, j1 = j * nb, (j + 1) * nb
        zj = jax.lax.slice(Z, (0, j0, 0), (P, j1, k))
        below = jax.lax.slice(Z, (0, j1, 0), (P, n, k))
        Z = jax.lax.dynamic_update_slice(
            Z, below - jnp.einsum("pab,pbk->pak", Ls[j], zj), (0, j1, 0))
    # block-diagonal solve w = D^-1 z: all panels in one batched matmul
    Dst = jnp.stack(Dinvs, axis=1)                 # (P, n_blocks, nb, nb)
    Zb = Z.reshape(P, n_blocks, nb, k)
    X = jnp.einsum("pjab,pjbk->pjak", Dst, Zb).reshape(P, n, k)
    # backward substitution L^T x = w
    for j in range(n_blocks - 2, -1, -1):
        j0, j1 = j * nb, (j + 1) * nb
        xb = jax.lax.slice(X, (0, j1, 0), (P, n, k))
        upd = (jax.lax.slice(X, (0, j0, 0), (P, j1, k))
               - jnp.einsum("pba,pbk->pak", Ls[j], xb))
        X = jax.lax.dynamic_update_slice(X, upd, (0, j0, 0))
    X = X[:, :n0, :]
    T = jnp.einsum("pik,pij->pkj", B, X)
    return X, 0.5 * (T + jnp.swapaxes(T, -1, -2))


@partial(jax.jit, static_argnames=("nb", "bs", "interpret", "algo",
                                    "gj2"))
def fused_spd_multirhs(A: jnp.ndarray, B: jnp.ndarray, nb: int = 128,
                       bs: int = 1, interpret: bool | None = None,
                       algo: str = "ldl", gj2: bool = False):
    """Batched fused SPD factor + multi-RHS solve + triple product.

    A (P, n, n) SPD, B (P, n, k) -> (X = A^-1 B (P, n, k),
    T = B^T A^-1 B (P, k, k) — the Cholesky form's Y^T Y).

    ``bs``: patches per kernel instance.  ``algo``:

    - ``"ldl"`` (default): block-LDL^T with batched Gauss-Jordan diagonal
      inverses — the nb-length scalar chain per block is *shared* across
      the bs patches, so larger bs amortizes the latency wall.  VMEM per
      instance ~ bs * (n^2 + n k + k^2) * 4 B: bs=4 fits at n=768, k=128.
    - ``"chol"``: right-looking blocked Cholesky with per-patch masked
      factor loops (the original formulation; scalar chains per patch).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if gj2 and algo in ("ldl_pipe", "ldl_noalias", "chol"):
        # ADVICE r4: these kernels hard-code the scalar GJ sweep; warn at
        # trace time instead of silently benchmarking the wrong thing
        import warnings
        warnings.warn(
            f"solver_gj2=True has no effect with algo={algo!r} (the "
            "2x2-pivot sweep is only threaded through ldl/ldlt); the "
            "scalar sweep runs", stacklevel=2)

    P, n0, _ = A.shape
    k0 = B.shape[-1]
    dt = A.dtype
    n = -(-n0 // nb) * nb
    if n % 128:
        # Mosaic rejects lane-dim slices when the padded matrix size is not
        # a multiple of the 128 tiling (e.g. nb=64, n0=162 -> n=192); fall
        # back to 128 panels, which always pad to an aligned size
        nb = 128
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

    if algo == "ldl":
        out_shape = (
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # B -> z -> w -> X
            jax.ShapeDtypeStruct((Pp, k, k), dt),   # T
        )
        if bs == 1 or interpret:
            X, T = pl.pallas_call(
                partial(_fused_kernel_ldl_scratch, nb, n_blocks, bs, gj2),
                grid=grid,
                in_specs=[mat_spec, rhs_spec],
                out_specs=(rhs_spec, t_spec),
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((bs, n, n), dt)],
                interpret=interpret,
            )(Ap, Bp)
        elif bs >= 4:
            # the factor's length-n scalar chain is paid once per INSTANCE
            # and shared by its bs patches.  Above bs=4 the scratch
            # residency exceeds the DEFAULT 16M scoped-VMEM limit — raise
            # it explicitly there (the v5e has 128M physical VMEM; the
            # per-kernel limit is a compiler default, not a hardware
            # bound).  Measured at the north-star config: bs=8 REGRESSES
            # (4325 -> 3427 patches/s) — the doubled per-instance DMA and
            # working set cost more than the halved chain count — so bs=4
            # stays the default; the raised limit exists for
            # experimentation.  None below the threshold keeps the
            # default-path kernel byte-identical (warm compile cache).
            scratch_bytes = dt.itemsize * bs * (n * n + n * k + 2 * k * k)
            vmem_limit = (min(int(scratch_bytes * 1.25), 100 * 2 ** 20)
                          if scratch_bytes * 1.25 > 16 * 2 ** 20 else None)
            X, T = pl.pallas_call(
                partial(_fused_kernel_ldl_dma2, pl, pltpu, nb, n_blocks,
                        bs, gj2),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=(pl.BlockSpec(memory_space=pltpu.ANY), t_spec),
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((bs, n, n), dt),
                                pltpu.VMEM((bs, n, k), dt),
                                pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA],
                **({"compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_limit)} if vmem_limit else {}),
                interpret=interpret,
            )(Ap, Bp)
        else:
            X, T = pl.pallas_call(
                partial(_fused_kernel_ldl_dma, pl, pltpu, nb, n_blocks,
                        bs, gj2),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), rhs_spec],
                out_specs=(rhs_spec, t_spec),
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((bs, n, n), dt),
                                pltpu.SemaphoreType.DMA],
                interpret=interpret,
            )(Ap, Bp)
        return X[:P, :n0, :k0], T[:P, :k0, :k0]

    if algo == "ldl_pipe":
        out_shape = (
            jax.ShapeDtypeStruct((Pp, n, k), dt),
            jax.ShapeDtypeStruct((Pp, k, k), dt),
        )
        if interpret or bs < 2:
            return fused_spd_multirhs(A, B, nb=nb, bs=bs,
                                      interpret=interpret, algo="ldl")
        X, T = pl.pallas_call(
            partial(_fused_kernel_ldl_pipe, pl, pltpu, nb, n_blocks, bs),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY), t_spec),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((bs, n, n), dt),
                            pltpu.VMEM((bs, n, k), dt),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(Ap, Bp)
        return X[:P, :n0, :k0], T[:P, :k0, :k0]

    if algo == "ldlt":
        # stacked transposed-RHS formulation: 2 (larger) dots per
        # (patch, panel) instead of 5, T computed outside the kernel
        if interpret:
            X = jnp.linalg.solve(Ap, Bp)[:P, :n0, :k0]
        else:
            m = n + k
            Ah = jnp.concatenate([Ap, jnp.swapaxes(Bp, 1, 2)], axis=1)
            Xt = pl.pallas_call(
                partial(_fused_kernel_ldlt_dma, pl, pltpu, nb, n_blocks,
                        n, k, bs, gj2),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((bs, k, n), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((Pp, k, n), dt),
                scratch_shapes=[pltpu.VMEM((bs, n + k, n), dt),
                                pltpu.SemaphoreType.DMA],
            )(Ah)
            X = jnp.swapaxes(Xt, 1, 2)[:P, :n0, :k0]
        T = jnp.einsum("bnk,bnj->bkj", B, X)
        return X, 0.5 * (T + jnp.swapaxes(T, -1, -2))

    if algo == "ldl_noalias":
        _, X, T = pl.pallas_call(
            partial(_fused_kernel_ldl_noalias, nb, n_blocks, bs),
            grid=grid,
            in_specs=[mat_spec, rhs_spec],
            out_specs=(mat_spec, rhs_spec, t_spec),
            out_shape=(
                jax.ShapeDtypeStruct((Pp, n, n), dt),   # L + consumed D
                jax.ShapeDtypeStruct((Pp, n, k), dt),   # B -> z -> w -> X
                jax.ShapeDtypeStruct((Pp, k, k), dt),   # T
            ),
            interpret=interpret,
        )(Ap, Bp)
        return X[:P, :n0, :k0], T[:P, :k0, :k0]

    _, _, X, Y, T = pl.pallas_call(
        partial(_fused_kernel_chol_noalias, nb, n_blocks, bs),
        grid=grid,
        in_specs=[mat_spec, rhs_spec],
        out_specs=(mat_spec, rhs_spec, rhs_spec, rhs_spec, t_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Pp, n, n), dt),   # L
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # consumed B
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # X
            jax.ShapeDtypeStruct((Pp, n, k), dt),   # Y
            jax.ShapeDtypeStruct((Pp, k, k), dt),   # T
        ),
        scratch_shapes=[pltpu.VMEM((bs, n, nb), dt)],
        interpret=interpret,
    )(Ap, Bp)
    return X[:P, :n0, :k0], T[:P, :k0, :k0]
