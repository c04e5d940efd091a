"""Chunk-level Pallas boundary-trace product == per-patch scan path.

The C>1 SLOD trace stage has two implementations: the vmapped
`finish_pre` (banded `stencil_apply` scan, the reference-form baseline)
and the chunk-level `trace_S_chunk` (VMEM-resident Pallas stencil
kernel, the TPU production path).  Same algebra (reference
boundary-trace rows, source/LOD.cc:520-528) — the Gram matrices and
projections must agree to f.p. roundoff.  On CPU the kernel runs in
pallas interpret mode (same routing the production chunk fn uses)."""

import numpy as np
import jax
import jax.numpy as jnp

from dealii_slod_tpu.config import SLODConfig
from dealii_slod_tpu.models import ElasticityProblem, LODSolver


def _chunk_inputs(solver, B):
    gsub, nlo, nhi, sides = solver._uniform_inputs()
    cwins = {k: np.asarray(solver._coef_windows(solver.coef_q[k]))
             for k in solver.coef_names}
    sl = slice(0, B)
    coef_l = [jnp.asarray(cwins[k][sl]) for k in solver.coef_names]
    return (coef_l, jnp.asarray(nlo[sl]), jnp.asarray(nhi[sl]),
            jnp.asarray(sides[sl]))


def test_trace_pallas_matches_scan_elasticity_2d():
    cfg = SLODConfig(dim=2, n_global_refinements=3, n_subdivisions=2,
                     oversampling=1, lod_stabilization=True,
                     constant_coefficients=False, coef_seed=3,
                     rhs="1; 1", bc="0; 0", dtype="float64")
    solver = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
    prep, finish, one_patch = solver._uniform_core()
    finish_pre = solver._finish_split[0]
    assert solver._trace_chunk is not None
    trace_chunk, pre_from_S = solver._trace_chunk

    B = 16  # mix of clipped (domain-boundary) and interior windows
    coef_l, nlo, nhi, sides = _chunk_inputs(solver, B)
    nc = len(solver.coef_names)
    vprep = jax.vmap(prep, in_axes=([0] * nc, 0, 0))
    A_rows_I, A_solve, PT_m, cvd = vprep(coef_l, nlo, nhi)
    Ainv_PT = jnp.linalg.solve(A_solve, PT_m)
    Hdim = solver.grid.H ** cfg.dim
    T = (jnp.einsum("bik,bij->bkj", PT_m, Ainv_PT) / Hdim
         + jnp.eye(cvd.shape[-1])[None] * (1.0 - cvd)[:, None, :])
    Tinv = jnp.linalg.inv(T)

    # path A: per-patch banded scan (finish_pre)
    G_a, g0_a = jax.vmap(finish_pre)(A_rows_I, Ainv_PT, Tinv, cvd,
                                     nlo, nhi, sides)

    # path B: chunk-level Pallas stencil kernel (interpret mode on CPU)
    S99, is99d = trace_chunk(A_rows_I, Ainv_PT, nlo, nhi, sides)
    G_b, g0_b = jax.vmap(pre_from_S)(S99, Tinv, cvd, is99d)
    # different summation order: roundoff-level disagreement relative to
    # the large Gram entries
    np.testing.assert_allclose(np.asarray(G_a), np.asarray(G_b),
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g0_a), np.asarray(g0_b),
                               rtol=1e-12, atol=1e-9)


def test_trace_pallas_ktile_split():
    """k > 128 forces multiple lane tiles in the kernel grid; the
    non-128-multiple k exercises the zero-pad + slice-off path."""
    from dealii_slod_tpu.ops.assembly import stencil_trace_pallas
    rng = np.random.default_rng(0)
    B, nx, C, k = 3, 5, 2, 150
    nN = nx * nx
    offs = np.array([dx + dy * nx for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    shiftN = 1 + nx
    band = jnp.asarray(rng.standard_normal((B, nN, 9, C, C)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((B, C, nN, k)), jnp.float32)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (shiftN, shiftN), (0, 0)))
    S = stencil_trace_pallas(band.reshape(B, nN, 9 * C * C), Xp, shiftN,
                             tuple(int(o) for o in offs), interpret=True)
    # brute force (wrap-around rows included — the kernel reproduces the
    # raw shifted product; zero-band nulling is an assembly property)
    Xpn = np.asarray(Xp)
    ref = np.zeros((B, C, nN, k), np.float32)
    for o, f in enumerate(offs):
        s0 = shiftN + int(f)
        for c in range(C):
            for d in range(C):
                w = np.asarray(band)[:, :, o, c, d]
                ref[:, c] += w[:, :, None] * Xpn[:, d, s0:s0 + nN, :]
    np.testing.assert_allclose(np.asarray(S), ref, rtol=2e-5, atol=1e-4)


def test_trace_pallas_roll_impl_padding_path():
    """impl="roll" (ADVICE r4: previously only exercised by manual TPU
    runs): in interpret mode the roll kernel body falls back to the slice
    kernel, but the caller-side 8-alignment padding of the node axis
    (nNq = ceil(nNp/8)*8, plus the slice-off) is the roll-only code path
    this pins — outputs must be identical to impl="slice"."""
    from dealii_slod_tpu.ops.assembly import stencil_trace_pallas
    rng = np.random.default_rng(1)
    B, nx, C, k = 2, 5, 2, 70
    nN = nx * nx
    offs = np.array([dx + dy * nx for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    shiftN = 1 + nx
    band = jnp.asarray(rng.standard_normal((B, nN, 9 * C * C)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((B, C, nN, k)), jnp.float32)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (shiftN, shiftN), (0, 0)))
    assert Xp.shape[2] % 8 != 0   # the padding path must actually fire
    args = (band, Xp, shiftN, tuple(int(o) for o in offs))
    S_slice = stencil_trace_pallas(*args, interpret=True, impl="slice")
    S_roll = stencil_trace_pallas(*args, interpret=True, impl="roll")
    np.testing.assert_array_equal(np.asarray(S_roll), np.asarray(S_slice))


def test_trace_pallas_c1_impl_matches_slice():
    """impl="c1" (C == 1 whole-offset-unrolled kernel, static slice
    starts): identical outputs to the generic slice kernel, including the
    k-tile pad/slice-off path and the c1roll 8-alignment padding."""
    from dealii_slod_tpu.ops.assembly import stencil_trace_pallas
    rng = np.random.default_rng(5)
    B, nx, k = 3, 5, 150
    nN = nx * nx
    offs = np.array([dx + dy * nx for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    shiftN = 1 + nx
    band = jnp.asarray(rng.standard_normal((B, nN, 9)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((B, 1, nN, k)), jnp.float32)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (shiftN, shiftN), (0, 0)))
    args = (band, Xp, shiftN, tuple(int(o) for o in offs))
    S_slice = stencil_trace_pallas(*args, interpret=True, impl="slice")
    for impl in ("c1", "c1roll"):
        S_c1 = stencil_trace_pallas(*args, interpret=True, impl=impl)
        # same accumulation ORDER, but the single unrolled chain gets
        # FMA-contracted differently than the per-grid-revisit adds —
        # last-ulp-only disagreement
        np.testing.assert_allclose(np.asarray(S_c1), np.asarray(S_slice),
                                   rtol=3e-7, atol=3e-6)


def test_trace_pallas_unroll_impl_matches_slice():
    """impl="unroll"/"unrollslice" (C-generic whole-offset-unrolled
    kernel) matches the offset-grid slice kernel, C=2, k-tiled."""
    from dealii_slod_tpu.ops.assembly import (stencil_trace_pallas,
                                              trace_unroll_fits)
    rng = np.random.default_rng(9)
    B, nx, C, k = 2, 5, 2, 150
    nN = nx * nx
    offs = np.array([dx + dy * nx for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    shiftN = 1 + nx
    band = jnp.asarray(rng.standard_normal((B, nN, 9 * C * C)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((B, C, nN, k)), jnp.float32)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (shiftN, shiftN), (0, 0)))
    assert trace_unroll_fits(nN, Xp.shape[2], k, C, 9)
    args = (band, Xp, shiftN, tuple(int(o) for o in offs))
    S_slice = stencil_trace_pallas(*args, interpret=True, impl="slice")
    for impl in ("unroll", "unrollslice"):
        S_u = stencil_trace_pallas(*args, interpret=True, impl=impl)
        np.testing.assert_allclose(np.asarray(S_u), np.asarray(S_slice),
                                   rtol=3e-7, atol=3e-6)


def test_trace_unroll_fits_bench_shapes():
    """The 3D elasticity chunk shape must fit the unrolled kernel's frame
    budget (that's the shape the adoption targets); an absurd one must
    not."""
    from dealii_slod_tpu.ops.assembly import (_unroll_resid,
                                              trace_unroll_fits)
    # 3D elasticity: nN=1331, C=3, 27 offsets, k-tile 128
    assert trace_unroll_fits(1331, 1331 + 2 * 157, 384, 3, 27)
    # refine-anything with a huge canvas: must refuse
    assert not trace_unroll_fits(12167, 12167 + 2 * 157, 384, 3, 27)
    # pin vs the measured compiler residency (r5 s1: 90.70M at
    # nN=1331, nNp=1600, kt=128, C=3 — the first unroll A/B OOMed at an
    # 88.22M limit from the pre-calibration nN-based estimate)
    limit = _unroll_resid(1331, 1600, 128, 3, 27, 4) * 1.25 + 16 * 2 ** 20
    assert limit > 90.70 * 2 ** 20
    assert limit <= 110 * 2 ** 20


def test_diffusion_pipeline_trace_c1_equals_scan_e2e():
    """C=1 end-to-end: trace_kernel="on" + trace_impl="c1" equals the
    default banded scan through the full diffusion basis pipeline."""
    from dealii_slod_tpu.models import DiffusionProblem

    kw = dict(dim=2, n_global_refinements=3, n_subdivisions=2,
              oversampling=1, lod_stabilization=True,
              constant_coefficients=False, coef_seed=7,
              rhs="1", bc="0", dtype="float32")

    def run(mode, impl):
        cfg = SLODConfig(trace_kernel=mode, trace_impl=impl, **kw)
        s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
        s.compute_basis()
        return np.asarray(s.Phi), np.asarray(s.APhi)

    phi_scan, aphi_scan = run("off", "slice")
    phi_c1, aphi_c1 = run("on", "c1")
    np.testing.assert_allclose(phi_c1, phi_scan, atol=1e-6)
    np.testing.assert_allclose(aphi_c1, aphi_scan, atol=1e-5)


def test_diffusion_pipeline_trace_pallas_equals_scan_e2e():
    """C=1: trace_kernel="on" (pallas, interpret on CPU) equals "off"
    (banded scan) through the full diffusion basis pipeline — the
    routing the TPU bench config takes under trace_kernel="auto"."""
    from dealii_slod_tpu.models import DiffusionProblem

    kw = dict(dim=2, n_global_refinements=3, n_subdivisions=2,
              oversampling=1, lod_stabilization=True,
              constant_coefficients=False, coef_seed=7,
              rhs="1", bc="0", dtype="float32")

    def run(mode):
        cfg = SLODConfig(trace_kernel=mode, **kw)
        s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
        s.compute_basis()
        assert (s._trace_chunk is not None) == (mode == "on")
        return np.asarray(s.Phi), np.asarray(s.APhi)

    phi_scan, aphi_scan = run("off")
    phi_pal, aphi_pal = run("on")
    np.testing.assert_allclose(phi_pal, phi_scan, atol=1e-6)
    np.testing.assert_allclose(aphi_pal, aphi_scan, atol=1e-5)


def test_elasticity_pipeline_trace_pallas_equals_scan_e2e():
    """End-to-end: the fused_split chunk path with the Pallas trace routed
    in equals the same path with the per-patch scan (kernel disabled) —
    same algebra, CPU f32."""
    kw = dict(dim=2, n_global_refinements=2, n_subdivisions=2,
              oversampling=1, lod_stabilization=True,
              constant_coefficients=False, coef_seed=2,
              rhs="1; 1", bc="0; 0", dtype="float32")

    def run(disable_kernel):
        cfg = SLODConfig(patch_solver="fused_split", **kw)
        s = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
        if disable_kernel:
            core = s._uniform_core

            def patched(*a, **k):
                out = core(*a, **k)
                s._trace_chunk = None
                return out

            s._uniform_core = patched
        s.compute_basis()
        return np.asarray(s.Phi), np.asarray(s.APhi)

    phi_scan, aphi_scan = run(True)
    phi_pal, aphi_pal = run(False)
    np.testing.assert_allclose(phi_pal, phi_scan, atol=1e-6)
    np.testing.assert_allclose(aphi_pal, aphi_scan, atol=1e-5)
