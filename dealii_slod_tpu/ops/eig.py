"""Batched symmetric eigensolver: parallel cyclic Jacobi.

``lax.linalg.eigh`` on TPU is the single most expensive kernel of the SLOD
pipeline (the per-patch Gram-matrix spectral pseudo-inverse,
reference source/LOD.cc:660-671).  This implements the classical two-sided
Jacobi method with the round-robin (tournament) parallel ordering: each
round applies n/2 *disjoint* Givens rotations simultaneously, realized as
batched row/column gathers + rotations + scatters — no sequential scalar
loops, only ``fori_loop`` over rounds.  Quadratic convergence: ~8-12 sweeps
reach machine precision for the n ~ O(100) matrices that arise here.

Returns eigenvalues in DESCENDING order and the corresponding eigenvectors,
matching the (reordered) jnp.linalg.eigh usage in the SLOD kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """Tournament schedule: (n-1) rounds of n/2 disjoint pairs covering all
    index pairs exactly once (n even; pad with a dummy index if odd)."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [(players[i], players[n - 1 - i]) for i in range(n // 2)]
        rounds.append([(min(a, b), max(a, b)) for a, b in pairs])
        # rotate all but the first
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, dtype=np.int32)      # (n-1, n/2, 2)


def _ring_permutation(n: int) -> np.ndarray:
    """The single permutation that advances the round-robin tournament when
    pairs are kept contiguous as (2k, 2k+1).

    Realizes the standard 'caterpillar' ordering: with slots laid out as
    top row [0, 2, 4, ...] / bottom row [1, 3, 5, ...] paired vertically,
    all players except the one in slot 0 move one position around the ring.
    Applying it (n-1) times cycles through all pairings."""
    assert n % 2 == 0
    m = n // 2
    perm = np.empty(n, dtype=np.int32)
    # ring order of slots: top row left->right, bottom row right->left
    ring = [2 * k for k in range(m)] + [2 * k + 1 for k in range(m - 1, -1, -1)]
    # slot ring[0] (= slot 0) is fixed; the others shift by one
    fixed = ring[0]
    rest = ring[1:]
    src = {dst: s for dst, s in zip(rest, rest[-1:] + rest[:-1])}
    perm[fixed] = fixed
    for dst, s in src.items():
        perm[dst] = s
    return perm


def _caterpillar_round(XT, XB, JT, JB, eps, off=None, amax2=None,
                       null_rel=1e-9):
    """One parallel Jacobi round in the (top, bottom) pair layout.

    Rows 2k / 2k+1 of the working matrix live in XT[:, k] / XB[:, k]; the
    tournament advance is the textbook caterpillar shift — static slices +
    concat only (no gathers), which is what makes this layout viable inside
    a Pallas kernel where the matrices stay VMEM-resident.

    When ``off`` is given, the maximum squared row-cosine of the round
    (max c^2 / (a b) over pairs and batch) is folded into it — the
    convergence monitor for adaptive sweep counts.  Pairs whose row-norm
    product is below ``null_rel`` times the matrix's largest row norm
    squared are EXCLUDED from the monitor (with ``amax2`` the per-matrix
    max row norm^2): numerically-null rows keep a random mutual angle
    forever (their cosine is pure rounding noise), which otherwise pins
    ``off`` near 1 and defeats the early exit — while their eigenpairs are
    below f32 resolution and get truncated by the pseudo-inverse anyway."""
    a = jnp.sum(XT * XT, axis=-1, keepdims=True)
    b = jnp.sum(XB * XB, axis=-1, keepdims=True)
    c = jnp.sum(XT * XB, axis=-1, keepdims=True)
    if off is not None:
        cos2 = (c * c) / (a * b + eps)
        if amax2 is not None:
            # pair significant iff lam_i * lam_j > null_rel * lam_max^2
            cos2 = jnp.where(a * b > (null_rel * amax2) ** 2, cos2, 0.0)
        off = jnp.maximum(off, jnp.max(cos2))
    safe_c = jnp.where(jnp.abs(c) > eps, c, 1.0)
    zeta = (b - a) / (2.0 * safe_c)
    # zero-safe sign: jnp.sign(0) == 0 would skip the rotation for pairs
    # with exactly equal row norms but nonzero coupling
    sgn = jnp.where(zeta >= 0, 1.0, -1.0).astype(zeta.dtype)
    t = sgn / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    t = jnp.where(jnp.abs(c) > eps, t, 0.0)
    cs = jax.lax.rsqrt(1.0 + t * t)
    sn = cs * t

    def rot(T, B):
        return cs * T - sn * B, sn * T + cs * B

    nT, nB = rot(XT, XB)
    jT, jB = rot(JT, JB)

    def advance(T, B):
        if T.shape[1] == 1:        # single pair: nothing to rotate through
            return T, B
        # t' = [t0, b0, t1..t_{m-2}],  b' = [b1..b_{m-1}, t_{m-1}]
        Tn = jnp.concatenate([T[:, :1], B[:, :1], T[:, 1:-1]], axis=1)
        Bn = jnp.concatenate([B[:, 1:], T[:, -1:]], axis=1)
        return Tn, Bn

    XT, XB = advance(nT, nB)
    JT, JB = advance(jT, jB)
    if off is not None:
        return XT, XB, JT, JB, off
    return XT, XB, JT, JB


@partial(jax.jit, static_argnames=("sweeps", "tol"))
def jacobi_eigh_onesided(G: jnp.ndarray, sweeps: int = 10,
                         tol: float = 0.0, null_rel: float | None = None):
    """Eigendecomposition of symmetric PSD (..., n, n) matrices by
    one-sided (Hestenes) Jacobi in the caterpillar layout.

    At convergence the rows of the working matrix X (= columns of G rotated
    by the accumulated J) are orthogonal; eigenvalues are their norms and
    eigenvectors the rows of J^T.  Returns eigenvalues descending and
    eigenvectors as columns, like jnp.linalg.eigh up to ordering.

    ``tol > 0`` enables the adaptive sweep count: stop as soon as every
    pair's squared row-cosine in the previous sweep was below ``tol``
    (``sweeps`` then acts as the maximum).  ``null_rel`` scales the
    monitor's numerically-null pair cutoff; the default is dtype-aware
    (~100x eps: 1e-9 at f32, 1e-14 at f64 — ADVICE r2: a fixed 1e-9 can
    drop significant f64 pairs in direct mode)."""
    if null_rel is None:
        null_rel = 1e-14 if G.dtype == jnp.float64 else 1e-9
    batch_shape = G.shape[:-2]
    n0 = G.shape[-1]
    G = G.reshape((-1, n0, n0))
    n = n0 + (n0 % 2)
    B = G.shape[0]
    if n != n0:
        Gp = jnp.zeros((B, n, n), G.dtype)
        G = Gp.at[:, :n0, :n0].set(G)
    m = n // 2
    eps = jnp.asarray(
        np.finfo("float64" if G.dtype == jnp.float64 else "float32").tiny
        * 1e3, G.dtype)
    XT, XB = G[:, 0::2, :], G[:, 1::2, :]
    eyeT = jnp.zeros((n, n), G.dtype).at[
        jnp.arange(n), jnp.arange(n)].set(1.0)
    JT = jnp.broadcast_to(eyeT[0::2], (B, m, n)) + 0.0
    JB = jnp.broadcast_to(eyeT[1::2], (B, m, n)) + 0.0

    if tol <= 0.0:
        def body(r, carry):
            return _caterpillar_round(*carry, eps)

        XT, XB, JT, JB = jax.lax.fori_loop(
            0, (n - 1) * sweeps, body, (XT, XB, JT, JB))
    else:
        a0 = jnp.sum(XT * XT, axis=-1, keepdims=True)
        b0 = jnp.sum(XB * XB, axis=-1, keepdims=True)
        amax2 = jnp.max(jnp.maximum(a0, b0), axis=-2, keepdims=True)

        def sweep(carry):
            XT, XB, JT, JB, it, _ = carry
            off0 = jnp.zeros((), G.dtype)

            def body(r, c2):
                return _caterpillar_round(*c2[:4], eps, off=c2[4],
                                          amax2=amax2, null_rel=null_rel)

            XT, XB, JT, JB, off = jax.lax.fori_loop(
                0, n - 1, body, (XT, XB, JT, JB, off0))
            return XT, XB, JT, JB, it + 1, off

        def cond(carry):
            it, off = carry[4], carry[5]
            return (it < sweeps) & (off > tol)

        state = (XT, XB, JT, JB, jnp.zeros((), jnp.int32),
                 jnp.asarray(jnp.inf, G.dtype))
        XT, XB, JT, JB, _, _ = jax.lax.while_loop(cond, sweep, state)
    return _finalize_onesided(XT, XB, JT, JB, n0, batch_shape)


def _finalize_onesided(XT, XB, JT, JB, n0, batch_shape):
    """Row norms -> eigenvalues; J rows -> eigenvectors; sort descending and
    drop the zero padded eigenpair if n was odd."""
    X = jnp.concatenate([XT, XB], axis=1)      # (B, n, n) rows in final order
    J = jnp.concatenate([JT, JB], axis=1)
    lam = jnp.sqrt(jnp.sum(X * X, axis=-1))    # (B, n) (PSD: sigma == lambda)
    n = X.shape[1]
    if n != n0:
        # padded coordinate: its J row is +-e_pad; identify by |J[:, :, n0:]|
        is_pad = jnp.abs(J[:, :, n0]) > 0.5
        lam = jnp.where(is_pad, -jnp.inf, lam)
    order = jnp.argsort(-lam, axis=-1)[:, :n0]
    lam = jnp.take_along_axis(lam, order, axis=-1)
    J = jnp.take_along_axis(J, order[:, :, None], axis=1)[:, :, :n0]
    V = jnp.swapaxes(J, -1, -2)                # eigenvectors as columns
    return (lam.reshape(batch_shape + (n0,)),
            V.reshape(batch_shape + (n0, n0)))


def _caterpillar_round_nj(XT, XB, aT, bB, eps, off=None, amax2=None,
                          null_rel=1e-9):
    """`_caterpillar_round` without the J accumulation and with carried row
    norms — for PSD inputs the converged rows of X = J G are
    lambda_i v_i^T directly (X X^T diagonal means (J V) Lambda^2 (J V)^T
    diagonal, so J V is a signed permutation and X = +-Lambda_perm
    V_perm^T): eigenvectors come from normalizing X's rows, and the row
    norms evolve analytically under each rotation (the per-pair trace
    identity a' = cs^2 a - 2 cs sn c + sn^2 b), so the only cross-lane
    reduction per round is the pair dot ``c`` — the reductions were the
    dominant per-round cost."""
    a, b = aT, bB
    c = jnp.sum(XT * XB, axis=-1, keepdims=True)
    if off is not None:
        cos2 = (c * c) / (a * b + eps)
        if amax2 is not None:
            cos2 = jnp.where(a * b > (null_rel * amax2) ** 2, cos2, 0.0)
        off = jnp.maximum(off, jnp.max(cos2))
    safe_c = jnp.where(jnp.abs(c) > eps, c, 1.0)
    zeta = (b - a) / (2.0 * safe_c)
    sgn = jnp.where(zeta >= 0, 1.0, -1.0).astype(zeta.dtype)
    t = sgn / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    t = jnp.where(jnp.abs(c) > eps, t, 0.0)
    cs = jax.lax.rsqrt(1.0 + t * t)
    sn = cs * t
    nT = cs * XT - sn * XB
    nB = sn * XT + cs * XB
    csnc = cs * sn * c
    a2 = cs * cs * a - 2.0 * csnc + sn * sn * b
    b2 = sn * sn * a + 2.0 * csnc + cs * cs * b

    def advance(T, B):
        if T.shape[1] == 1:
            return T, B
        Tn = jnp.concatenate([T[:, :1], B[:, :1], T[:, 1:-1]], axis=1)
        Bn = jnp.concatenate([B[:, 1:], T[:, -1:]], axis=1)
        return Tn, Bn

    XT, XB = advance(nT, nB)
    aT, bB = advance(a2, b2)
    if off is not None:
        return XT, XB, aT, bB, off
    return XT, XB, aT, bB


def _finalize_rows(XT, XB, n0, batch_shape):
    """PSD X-row finalize: eigenvalues = row norms, eigenvectors =
    normalized rows (valid because X = +-Lambda_perm V_perm^T at
    convergence); zero rows (including the odd-n pad row, which never
    rotates: its dot with any row is exactly 0) sort last and yield v = 0 —
    harmless, since their pseudo-inverse weight is truncated anyway."""
    X = jnp.concatenate([XT, XB], axis=1)      # (B, n, n)
    lam = jnp.sqrt(jnp.sum(X * X, axis=-1))    # (B, n)
    order = jnp.argsort(-lam, axis=-1)[:, :n0]
    lam_s = jnp.take_along_axis(lam, order, axis=-1)
    X_s = jnp.take_along_axis(X, order[:, :, None], axis=1)[:, :, :n0]
    V_rows = X_s / jnp.maximum(lam_s[:, :, None], 1e-30)
    V = jnp.swapaxes(V_rows, -1, -2)           # eigenvectors as columns
    return (lam_s.reshape(batch_shape + (n0,)),
            V.reshape(batch_shape + (n0, n0)))


def jacobi_vmem_limit(B: int, block: int, m: int, n: int,
                      itemsize: int) -> int:
    """Scoped-VMEM limit (bytes) for the `jacobi_eigh_pallas` kernel.

    Two contributions, both tile-padded to the TPU T(8,128) layout:

    1. In-kernel residency: 2 input + 2 output (block, m, n) arrays kept
       VMEM-resident across all rounds, plus rotation temporaries (x1.25).
       Uses ``block`` (the per-grid-step shape), not the full batch
       (ADVICE r4: estimating from B overestimated by B/block).
    2. The relayout stack hazard: XLA may stack-allocate the layout-
       conversion copy of each operand/result it deems small (<= 16M) in
       scoped VMEM *on top of* the kernel's own residency.  Whether it
       does depends on global compilation context — the r4 driver crash
       compiled the exact shape (f32[256,16,32]) that the builder's own
       session had compiled green hours earlier, after unrelated kernels
       changed the surrounding HLO.  Measured total there: 22.78M where
       the in-kernel estimate alone was 10.5M.

    Because (2) is context-dependent, the limit is returned for EVERY
    shape (callers set it unconditionally — never ``None``); the +16M
    headroom term covers the frame and keeps the limit at least the
    compiler default.  Capped at 110M (v5e: 128M physical).

    Pinned against measured compiler residencies in
    tests/test_vmem_gates.py."""
    pad_m = -(-m // 8) * 8
    pad_n = -(-n // 128) * 128
    full = B * pad_m * pad_n * itemsize
    blk = block * pad_m * pad_n * itemsize
    resid = int(4 * blk * 1.25)
    stack = 4 * full if full <= 16 * 2 ** 20 else 0
    return min(resid + stack + 16 * 2 ** 20, 110 * 2 ** 20)


def jacobi_eigh_pallas(G: jnp.ndarray, sweeps: int = 12, block: int = 16,
                       tol: float = 0.0, null_rel: float | None = None):
    """One-sided Jacobi eigensolver as a Pallas TPU kernel (PSD inputs).

    The (top, bottom) working arrays stay **VMEM-resident across all
    (n-1)*sweeps rounds** — HBM traffic is exactly one load of G and one
    store of the results, vs O(rounds) full-matrix round trips for the XLA
    while-loop formulation.  Rounds are pure VPU work (row dots, rotations)
    plus static slice/concat shuffles (the caterpillar), so no
    gathers/scatters reach Mosaic.  No Jacobi-rotation accumulator is
    carried: for PSD G the converged rows ARE lambda_i v_i^T
    (`_finalize_rows`), which halves the per-round work.

    ``tol > 0``: adaptive sweep count — each block stops as soon as every
    significant pair's squared row-cosine in its previous sweep fell below
    ``tol`` (``sweeps`` is the maximum).  ``null_rel``: see
    `jacobi_eigh_onesided` (dtype-aware default)."""
    if null_rel is None:
        null_rel = 1e-14 if G.dtype == jnp.float64 else 1e-9
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = G.shape[:-2]
    n0 = G.shape[-1]
    G = G.reshape((-1, n0, n0)) if G.ndim != 2 else G[None]
    n = n0 + (n0 % 2)
    B0 = G.shape[0]
    block = min(block, B0)   # also makes the wrapper vmap-friendly (B0=1)
    B = -(-B0 // block) * block
    # This kernel keeps its per-block operands + results VMEM-resident
    # (memory_space=VMEM block specs — the whole point: rounds never
    # touch HBM).  The scoped-VMEM limit is set UNCONDITIONALLY: the r4
    # round-close bench crashed at compile time on a shape whose
    # conditional gate said "fits the 16M default" — the compiler's
    # context-dependent relayout stack allocation pushed the true
    # residency to 22.78M (see jacobi_vmem_limit).  Cache-key stability
    # is worth less than compiling at all.
    vmem_limit = jacobi_vmem_limit(B, block, n // 2, n, G.dtype.itemsize)
    if n != n0 or B != B0:
        Gp = jnp.zeros((B, n, n), G.dtype)
        G = Gp.at[:B0, :n0, :n0].set(G)
    m = n // 2
    eps = float(
        np.finfo("float64" if G.dtype == jnp.float64 else "float32").tiny
        * 1e3)
    XT0, XB0 = G[:, 0::2, :], G[:, 1::2, :]
    rounds = (n - 1) * sweeps

    def kernel(xt_ref, xb_ref, xto_ref, xbo_ref):
        XT = xt_ref[:]
        XB = xb_ref[:]
        a0 = jnp.sum(XT * XT, axis=-1, keepdims=True)
        b0 = jnp.sum(XB * XB, axis=-1, keepdims=True)
        # carried norms are refreshed EXACTLY at every sweep boundary: the
        # analytic updates drift for rows spanning ~10 orders of magnitude
        # (cancellation in cs^2 a - 2 cs sn c + sn^2 b), and stale norms
        # steer later rotations wrong
        if tol <= 0.0:
            def sweep_f(s, carry):
                XT, XB = carry[:2]
                aT = jnp.sum(XT * XT, axis=-1, keepdims=True)
                bB = jnp.sum(XB * XB, axis=-1, keepdims=True)

                def body(r, c2):
                    return _caterpillar_round_nj(*c2, eps)

                XT, XB, _, _ = jax.lax.fori_loop(
                    0, n - 1, body, (XT, XB, aT, bB))
                return XT, XB

            XT, XB = jax.lax.fori_loop(0, sweeps, sweep_f, (XT, XB))
        else:
            amax2 = jnp.max(jnp.maximum(a0, b0), axis=-2, keepdims=True)

            def sweep(carry):
                XT, XB, it, _ = carry
                aT = jnp.sum(XT * XT, axis=-1, keepdims=True)
                bB = jnp.sum(XB * XB, axis=-1, keepdims=True)
                off0 = jnp.zeros((), XT.dtype)

                def body(r, c2):
                    return _caterpillar_round_nj(*c2[:4], eps, off=c2[4],
                                                 amax2=amax2,
                                                 null_rel=null_rel)

                XT, XB, aT, bB, off = jax.lax.fori_loop(
                    0, n - 1, body, (XT, XB, aT, bB, off0))
                return XT, XB, it + 1, off

            def cond(carry):
                return (carry[2] < sweeps) & (carry[3] > tol)

            XT, XB, _, _ = jax.lax.while_loop(
                cond, sweep,
                (XT, XB, jnp.zeros((), jnp.int32),
                 jnp.asarray(np.finfo(np.float32).max, XT.dtype)))
        xto_ref[:] = XT
        xbo_ref[:] = XB

    on_tpu = jax.default_backend() == "tpu"
    spec = pl.BlockSpec((block, m, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM if on_tpu else None)
    out = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[spec, spec],
        out_specs=(spec,) * 2,
        out_shape=tuple(jax.ShapeDtypeStruct((B, m, n), G.dtype)
                        for _ in range(2)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=not on_tpu,
    )(XT0, XB0)
    XT, XB = (o[:B0] for o in out)
    return _finalize_rows(XT, XB, n0, batch_shape)


@partial(jax.jit, static_argnames=("sweeps", "tol", "null_rel"))
def weig_pallas(ZT: jnp.ndarray, YT: jnp.ndarray, sweeps: int = 8,
                tol: float = 0.0, null_rel: float | None = None):
    """Fused W-build + (k, k) one-sided Jacobi eig in ONE Pallas kernel
    (VERDICT r4 #4): W = Z^T Y is built in-kernel from the transposed
    factors (per-batch-element MXU nt-dots, fori_loop over the batch) and
    the caterpillar sweep cascade runs on the VMEM-resident result —
    no HBM materialization of W, no stride-2 XT/XB prep in XLA, no
    relayout stack pairs, one launch instead of two.

    ZT (B, k, n) — the subspace block TRANSPOSED (rows = vectors), k even;
    YT (B, k, n) — (G Z)^T in the same layout.  For SPD G the converged
    rows are lambda v^T exactly as in `jacobi_eigh_pallas` (W = Z^T G Z is
    symmetric up to f32 roundoff in Y; one-sided Jacobi computes the SVD
    of the slightly-nonsymmetric build, which agrees with the symmetric
    eig to that roundoff).  Returns (eigenvalues descending (B, k),
    eigenvectors as columns (B, k, k))."""
    if null_rel is None:
        null_rel = 1e-14 if ZT.dtype == jnp.float64 else 1e-9
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, k, n0 = ZT.shape
    assert k % 2 == 0 and YT.shape == ZT.shape
    kh = k // 2
    dt = ZT.dtype
    n = -(-n0 // 128) * 128
    if n != n0:
        ZT = jnp.pad(ZT, ((0, 0), (0, 0), (0, n - n0)))
        YT = jnp.pad(YT, ((0, 0), (0, 0), (0, n - n0)))
    ZeT, ZoT = ZT[:, 0::2], ZT[:, 1::2]        # (B, kh, n)
    eps = float(np.finfo("float64" if dt == jnp.float64 else "float32").tiny
                * 1e3)
    on_tpu = jax.default_backend() == "tpu"

    def kernel(zet_ref, zot_ref, yt_ref, xt_ref, xb_ref):
        def build(i, _):
            y = yt_ref[i]                                    # (k, n)
            nt = (((1,), (1,)), ((), ()))
            xt_ref[i] = jax.lax.dot_general(
                zet_ref[i], y, nt, preferred_element_type=dt)
            xb_ref[i] = jax.lax.dot_general(
                zot_ref[i], y, nt, preferred_element_type=dt)
            return 0
        jax.lax.fori_loop(0, B, build, 0)
        XT = xt_ref[:]
        XB = xb_ref[:]
        a0 = jnp.sum(XT * XT, axis=-1, keepdims=True)
        b0 = jnp.sum(XB * XB, axis=-1, keepdims=True)
        if tol <= 0.0:
            def sweep_f(s, carry):
                XT, XB = carry[:2]
                aT = jnp.sum(XT * XT, axis=-1, keepdims=True)
                bB = jnp.sum(XB * XB, axis=-1, keepdims=True)

                def body(r, c2):
                    return _caterpillar_round_nj(*c2, eps)

                XT, XB, _, _ = jax.lax.fori_loop(
                    0, k - 1, body, (XT, XB, aT, bB))
                return XT, XB

            XT, XB = jax.lax.fori_loop(0, sweeps, sweep_f, (XT, XB))
        else:
            amax2 = jnp.max(jnp.maximum(a0, b0), axis=-2, keepdims=True)

            def sweep(carry):
                XT, XB, it, _ = carry
                aT = jnp.sum(XT * XT, axis=-1, keepdims=True)
                bB = jnp.sum(XB * XB, axis=-1, keepdims=True)
                off0 = jnp.zeros((), XT.dtype)

                def body(r, c2):
                    return _caterpillar_round_nj(*c2[:4], eps, off=c2[4],
                                                 amax2=amax2,
                                                 null_rel=null_rel)

                XT, XB, aT, bB, off = jax.lax.fori_loop(
                    0, k - 1, body, (XT, XB, aT, bB, off0))
                return XT, XB, it + 1, off

            def cond(carry):
                return (carry[2] < sweeps) & (carry[3] > tol)

            XT, XB, _, _ = jax.lax.while_loop(
                cond, sweep,
                (XT, XB, jnp.zeros((), jnp.int32),
                 jnp.asarray(np.finfo(np.float32).max, XT.dtype)))
        xt_ref[:] = XT
        xb_ref[:] = XB

    ms = pltpu.VMEM if on_tpu else None
    in_specs = [pl.BlockSpec((B, kh, n), lambda: (0, 0, 0), memory_space=ms),
                pl.BlockSpec((B, kh, n), lambda: (0, 0, 0), memory_space=ms),
                pl.BlockSpec((B, k, n), lambda: (0, 0, 0), memory_space=ms)]
    out_spec = pl.BlockSpec((B, kh, k), lambda: (0, 0, 0), memory_space=ms)
    # residency: 2 x (B, kh, n) + (B, k, n) inputs + 2 x (B, kh, k->n pad)
    # outputs (all tile-padded) — unconditional limit (r4 lesson)
    pad_k = -(-k // 128) * 128
    resid = (4 * B * kh * n + 2 * B * k * n
             + 4 * B * -(-kh // 8) * 8 * pad_k) * dt.itemsize
    vmem_limit = min(int(resid * 1.25) + 16 * 2 ** 20, 110 * 2 ** 20)
    XT, XB = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, kh, k), dt)
                        for _ in range(2)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=not on_tpu,
    )(ZeT, ZoT, YT)
    return _finalize_rows(XT, XB, k, (B,))


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(G: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of symmetric (..., n, n) matrices.

    Ring/caterpillar formulation: pairs are always the contiguous slots
    (2k, 2k+1), so each round is two batched block-rotations (pure
    elementwise math on reshaped views — no gathers/scatters) followed by
    one static ring permutation of rows+columns.  Returns (eigenvalues
    (..., n) descending, eigenvectors (..., n, n) with ``V[..., :, k]`` the
    k-th eigenvector), like ``jnp.linalg.eigh`` up to ordering."""
    batch_shape = G.shape[:-2]
    n0 = G.shape[-1]
    G = G.reshape((-1, n0, n0))
    n = n0 + (n0 % 2)                              # pad to even
    if n != n0:
        B = G.shape[0]
        Gp = jnp.zeros((B, n, n), G.dtype)
        G = Gp.at[:, :n0, :n0].set(G)
    B = G.shape[0]
    m = n // 2
    perm = jnp.asarray(_ring_permutation(n))
    R = n - 1

    def round_body(r, carry):
        A, V = carry
        d = jnp.diagonal(A, axis1=-2, axis2=-1)    # (B, n)
        app = d[:, 0::2]                           # (B, m)
        aqq = d[:, 1::2]
        A4 = A.reshape(B, m, 2, m, 2)
        apq = jnp.diagonal(A4[:, :, 0, :, 1], axis1=1, axis2=2)  # (B, m)
        # Givens rotation annihilating A[2k, 2k+1]
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(tau.dtype)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # rows
        A2 = A.reshape(B, m, 2, n)
        Ap, Aq = A2[:, :, 0, :], A2[:, :, 1, :]
        A = jnp.stack([c[:, :, None] * Ap - s[:, :, None] * Aq,
                       s[:, :, None] * Ap + c[:, :, None] * Aq],
                      axis=2).reshape(B, n, n)
        # columns
        A3 = A.reshape(B, n, m, 2)
        Ap, Aq = A3[..., 0], A3[..., 1]
        A = jnp.stack([c[:, None, :] * Ap - s[:, None, :] * Aq,
                       s[:, None, :] * Ap + c[:, None, :] * Aq],
                      axis=3).reshape(B, n, n)
        # eigenvector columns
        V3 = V.reshape(B, n, m, 2)
        Vp, Vq = V3[..., 0], V3[..., 1]
        V = jnp.stack([c[:, None, :] * Vp - s[:, None, :] * Vq,
                       s[:, None, :] * Vp + c[:, None, :] * Vq],
                      axis=3).reshape(B, n, n)
        # advance the tournament (static permutation)
        A = A[:, perm][:, :, perm]
        V = V[:, :, perm]
        return (A, V)

    V0 = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), (B, n, n)) + 0.0
    A, V = jax.lax.fori_loop(0, R * sweeps, round_body, (G, V0))
    lam = jnp.diagonal(A, axis1=-2, axis2=-1)
    if n != n0:
        # the padded row/col is decoupled (zero): its rotations are
        # identity; drop the padded eigenpair (eigenvalue exactly 0 with a
        # unit vector supported on the pad slot)
        keep_rows = jnp.asarray(np.arange(n0))
        pad_col = jnp.argmin(
            jnp.sum(V[:, :n0, :] ** 2, axis=1), axis=-1)      # (B,)
        mask = jnp.arange(n)[None, :] != pad_col[:, None]     # (B, n)
        order0 = jnp.argsort(~mask, axis=-1)                  # real cols first
        lam = jnp.take_along_axis(lam, order0, axis=-1)[:, :n0]
        V = jnp.take_along_axis(V, order0[:, None, :], axis=-1)[:, :n0, :n0]
    order = jnp.argsort(-lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return (lam.reshape(batch_shape + (n0,)),
            V.reshape(batch_shape + (n0, n0)))


def _mgs_kernel(k, passes, bs, x_in, q_ref):
    """Row-wise modified Gram-Schmidt on (bs, kp, n) blocks: row j is the
    j-th vector.  The k-step chain is shared across the bs instances (all
    ops are full-block elementwise/reductions, like the batched GJ sweep).
    Padded rows are zero in and stay exactly zero out (0 * rsqrt(eps))."""
    X = x_in[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)

    def step(j, X):
        rowj = jnp.sum(jnp.where(rows == j, X, 0.0), axis=1, keepdims=True)
        nrm = jax.lax.rsqrt(jnp.sum(rowj * rowj, axis=2, keepdims=True)
                            + 1e-30)
        q = rowj * nrm                                  # (bs, 1, n)
        coef = jnp.sum(X * q, axis=2, keepdims=True)    # (bs, kp, 1)
        X = jnp.where(rows > j, X - coef * q, X)
        return jnp.where(rows == j, q, X)

    for _ in range(passes):
        X = jax.lax.fori_loop(0, k, step, X)
    q_ref[:] = X


def mgs_stack_hazard(bytes_padded: int) -> bool:
    """True when a (padded) mgs operand of this size sits in the window
    where XLA stack-allocates the relayout operand+result PAIR in scoped
    VMEM and blows the 16M limit (measured: f32[192,32,384] = 9.4M and
    f32[128,32,384] = 6.3M both produced a 17.80M scoped allocation).
    `mgs_qr_pallas` recursively splits the batch out of this window.
    Pinned against those measurements in tests/test_vmem_gates.py."""
    return 4 * 2 ** 20 < bytes_padded <= 16 * 2 ** 20


@partial(jax.jit, static_argnames=("bs", "passes", "interpret"))
def mgs_qr_pallas(X: jnp.ndarray, bs: int = 64, passes: int = 2,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Batched thin-Q orthonormalization (B, n, k) -> Q, one Pallas kernel.

    Replaces ``jnp.linalg.qr(X)[0]`` inside the smallk inverse subspace
    iteration: XLA's blocked Householder QR costs ~3 ms per (256, 125, 32)
    call on this chip (sequential panel micro-steps); two-pass modified
    Gram-Schmidt with the column chain shared across the instance batch is
    ~VPU-free at this size.  MGS2 orthogonality error is ~eps * cond of the
    post-pass-1 block, ample for the subspace iteration (the iterate's
    conditioning is bounded by the jitter-floored 1/lambda spread).  Same
    contract as Householder thin-Q up to column signs / rank-deficient
    completions (a numerically-null column yields a zero column, not a
    random orthonormal completion)."""
    from jax.experimental import pallas as pl

    B0, n0, k0 = X.shape
    dt = X.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        return jnp.linalg.qr(X)[0]
    n = -(-n0 // 128) * 128
    kp = -(-k0 // 8) * 8
    # XLA stack-allocates the relayout copy of a pallas operand it deems
    # small enough (<= 16M), but forgets the result buffer: the operand +
    # result stack PAIR blows the 16M scoped-VMEM limit at compile time
    # well below a 16M single operand (measured: f32[192,32,384] (9.4M)
    # AND f32[128,32,384] (6.3M) both -> "Scoped allocation with size
    # 17.80M" — the pair plus the frame).  Larger operands get a proper
    # HBM relayout.  Split the batch below the danger window (recursing
    # until each piece's pair + frame fits).
    bytes_padded = X.dtype.itemsize * (-(-B0 // bs) * bs) * kp * n
    if mgs_stack_hazard(bytes_padded) and B0 > 1:
        half = B0 // 2
        return jnp.concatenate(
            [mgs_qr_pallas(X[:half], bs=bs, passes=passes,
                           interpret=interpret),
             mgs_qr_pallas(X[half:], bs=bs, passes=passes,
                           interpret=interpret)], axis=0)
    bs = min(bs, B0)
    Bp = -(-B0 // bs) * bs
    Xt = jnp.zeros((Bp, kp, n), dt)
    Xt = Xt.at[:B0, :k0, :n0].set(jnp.swapaxes(X, 1, 2))
    spec = pl.BlockSpec((bs, kp, n), lambda i: (i, 0, 0))
    Q = pl.pallas_call(
        partial(_mgs_kernel, k0, passes, bs),
        grid=(Bp // bs,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, kp, n), dt),
    )(Xt)
    return jnp.swapaxes(Q[:B0, :k0, :n0], 1, 2)


def smallk_truncated_dvec(G: jnp.ndarray, g0: jnp.ndarray, k: int = 32,
                          power_steps: int = 3, small_sweeps: int = 8,
                          jitter: float | None = None,
                          small_tol: float = 0.0,
                          weig: bool = False) -> jnp.ndarray:
    """SLOD stabilization coefficients without a full eigendecomposition.

    Computes the reference's truncated-pseudo-inverse solve + sigma-
    truncation conditioning loop (compute_inverse_svd + the ||d||_inf < 0.5
    while-loop, reference source/LOD.cc:667-725) from two observations:

    1. At float32 the spectrum is regularized by a relative ``jitter``
       (~100x dtype eps, same as `jacobi_eigh_factor`) that floors every
       eigenvalue above the 1e-15 relative SVD cutoff — the truncation
       branch of compute_inverse_svd never fires and the full pseudo-
       inverse action is exactly the Tikhonov solve
       ``d0 = -(G + delta I)^-1 g0`` (one batched Gauss-Jordan inverse; see
       ADVICE r2 on the changed truncation semantics, documented here).
    2. The conditioning loop removes contributions from the *smallest*
       spectral directions upward, and each removal is a projection:
       ``d <- d - v_i (v_i^T d0)`` (since the direction's pseudo-inverse
       term is exactly its component in d0).  Measured on the bench config
       (512 real Grams, f64 semantics), the loop removes 0 directions for
       508/512 patches and at most 53 — so only the smallest ``k``
       eigenvectors are ever needed, obtained here by inverse subspace
       iteration reusing the explicit inverse (batched matmuls + two
       (k, k) Jacobi eigensolves — MXU/VPU-cheap), instead of the full
       (n, n) Jacobi sweep cascade that dominated the round-2 bench.

    G (B, n, n) SPD batch, g0 (B, n).  Returns dvec (B, n) — the reference
    loop's final coefficient vector (latched like the reference ``break``).

    Cap exhaustion: if the truncation loop would remove more than ``k``
    directions (only reachable at float64, where the jitter floor does not
    stop it early), the scan runs out of candidates while ``||d||inf >=
    0.5`` and returns the k-removed vector with no diagnostic — callers
    wanting exact reference semantics at float64 must pass ``k = n``
    (BasisKernels does).
    """
    from dealii_slod_tpu.ops.patch_solve import spd_inverse_schur

    B, n, _ = G.shape
    dt = G.dtype
    if jitter is None:
        jitter = 1e-13 if dt == jnp.float64 else 1e-6
    d = jnp.diagonal(G, axis1=-2, axis2=-1)
    dmax = jnp.max(jnp.abs(d), axis=-1)                    # (B,)
    # full-domain patches have no 99-boundary trace: G == 0 identically and
    # the correct stabilization is dvec == 0 (the SLOD formula degenerates
    # to the plain LOD candidate, reference LOD.cc:563-564).  Keep the
    # batch computation finite with a unit stand-in scale and mask the
    # result — without this the zero jitter makes the inverse singular.
    ok = dmax > 0
    delta = jitter * jnp.where(ok, dmax, 1.0)
    eyeN = jnp.eye(n, dtype=dt)
    Gj = G + delta[:, None, None] * eyeN
    Ginv = spd_inverse_schur(Gj)
    d0 = -jnp.einsum("bij,bj->bi", Ginv, g0)
    d0 = jnp.where(ok[:, None], d0, 0.0)
    k = min(int(k), n)
    k -= k % 2
    if k <= 0:
        return d0

    def colnorm(Z):
        return Z * jax.lax.rsqrt(jnp.sum(Z * Z, axis=1, keepdims=True)
                                 + 1e-30)

    # NOTE on k == n (small Grams, e.g. 2D elasticity cD = 50): the SAME
    # inverse-subspace machinery is used — the inverse powers order the
    # block into the ascending eigenbasis with accuracy set by the INVERSE
    # (small directions dominate it), so W is near-diagonal and the small
    # eig is benign.  A forward Jacobi eig of Gj instead resolves small
    # eigenpairs only to ~eps * lam_max (additive) and measurably breaks
    # the removal scan (0.85 rel field error vs 3e-6 with this path).
    #
    # deterministic shared orthonormal start (host-side constant)
    rng = np.random.default_rng(0)
    Z0 = np.linalg.qr(rng.standard_normal((n, k)))[0]
    Z = jnp.broadcast_to(jnp.asarray(Z0, dt), (B, n, k)) + 0.0

    # Householder-QR orthonormalization every step: the inverse's 1/lambda
    # ratios span many decades, so one application rank-collapses a random
    # block; Gram-based re-orthonormalization (Cholesky/Newton-Schulz/
    # spectral) cannot restore rank — it never leaves the collapsed column
    # space — while QR's Q is exactly orthonormal by construction and the
    # repopulated directions converge on the next steps.
    for _ in range(max(1, power_steps)):
        Z = mgs_qr_pallas(jnp.einsum("bij,bjk->bik", Ginv, Z))
    # one kernel instance for the whole batch: the (n-1)*sweeps rotation
    # rounds are op-issue-bound at k=32 (each round is ~20 small VPU ops
    # regardless of batch width), so splitting the batch into 128-wide
    # blocks multiplied the round count by ceil(B/128) for no VPU saving.
    # The kernel sets its scoped-VMEM limit unconditionally (r4 fix).
    # ``small_tol > 0`` enables the adaptive sweep monitor: W comes out of
    # the inverse subspace iteration near-diagonal, so the sweep cascade
    # converges in far fewer than the fixed ``small_sweeps`` rounds.
    # ``weig``: build W in-kernel from the transposed factors and run the
    # sweeps in the same launch (`weig_pallas`) — skips the HBM W, the
    # symmetrization and the stride-2 XT/XB prep.
    if weig:
        ZT = jnp.swapaxes(Z, 1, 2)                         # (B, k, n)
        YT = jnp.einsum("bkj,bji->bki", ZT, Gj)            # (G Z)^T
        lw, U = weig_pallas(ZT, YT, sweeps=small_sweeps, tol=small_tol)
    else:
        W = jnp.einsum("bik,bij,bjl->bkl", Z, Gj, Z)
        W = 0.5 * (W + jnp.swapaxes(W, -1, -2))
        lw, U = jacobi_eigh_pallas(W, sweeps=small_sweeps, tol=small_tol,
                                   block=min(W.shape[0], 1024))
    V = colnorm(jnp.einsum("bik,bkl->bil", Z, U))          # descending lam
    proj = jnp.einsum("bik,bi->bk", V, d0)                 # (B, k)

    # ascending-sigma removal scan with the reference's latched break
    Vs = jnp.moveaxis(V, -1, 0)[::-1]                      # (k, B, n) ascending
    ps = jnp.moveaxis(proj, -1, 0)[::-1]                   # (k, B)

    def body(carry, vp):
        dvec, done = carry
        v, p = vp
        done = done | (jnp.max(jnp.abs(dvec), axis=-1) < 0.5)
        dvec = jnp.where(done[:, None], dvec, dvec - v * p[:, None])
        return (dvec, done), None

    (dvec, _), _ = jax.lax.scan(body, (d0, jnp.zeros((B,), bool)), (Vs, ps))
    return jnp.where(ok[:, None], dvec, 0.0)


def jacobi_eigh_factor(G: jnp.ndarray, sweeps: int = 12, block: int = 16,
                       tol: float = 0.0, jitter: float | None = None,
                       null_rel: float | None = None):
    """Factor-form spectral decomposition of PSD matrices (f32-robust).

    One-sided Jacobi applied to G itself resolves small eigenpairs only to
    ~eps * lam_max (additive), which is catastrophic for the 1/lambda-
    amplified SLOD pseudo-inverse at float32 (measured ~100x worse pinv
    action than LAPACK eigh).  Running the SAME kernel on the transposed
    Cholesky factor L^T of the (relatively ``jitter``-regularized) G works
    on the square root of the dynamic range (Demmel-Veselic): row norms
    are sigma(L) = sqrt(lambda), and the normalized rows are the right
    singular vectors of L^T = eigenvectors of G = L L^T.  Measured ~10x
    better end-to-end f32 accuracy at equal cost (the batched (n, n)
    Cholesky is negligible against the sweeps).

    Returns (eigenvalues descending, eigenvectors as columns).  ``jitter``
    defaults to ~100x the dtype epsilon (1e-6 at f32, 1e-13 at f64) so the
    regularization sits at the precision's noise floor."""
    if jitter is None:
        jitter = 1e-13 if G.dtype == jnp.float64 else 1e-6
    d = jnp.diagonal(G, axis1=-2, axis2=-1)
    dmax = jnp.max(jnp.abs(d), axis=-1, keepdims=True)
    delta = (jitter * dmax)[..., None]
    n = G.shape[-1]
    L = jnp.linalg.cholesky(G + delta * jnp.eye(n, dtype=G.dtype))
    s, U = jacobi_eigh_pallas(jnp.swapaxes(L, -1, -2), sweeps=sweeps,
                              tol=tol, block=block, null_rel=null_rel)
    return s * s, U
