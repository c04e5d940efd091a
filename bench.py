"""Benchmark: 3D Poisson SLOD basis construction + coarse solve throughput.

North-star config (BASELINE.md): 4096 patches (16^3 coarse mesh), l=2
oversampling, high-contrast random coefficients — patches/sec through
Q_iso_Q1 assembly + batched internal Cholesky multi-RHS solve + SLOD
boundary-trace spectral pseudo-inverse + coarse stencil assembly + coarse
CG solve.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver's target is 4096 patches assembled+decomposed+solved in < 1 s on a
v5p-8, i.e. 4096 patches/s.  ``vs_baseline`` is measured rate / 4096.

The JSON line also carries an analytic FLOP model (``detail.flops_model``),
achieved ``tflops`` and ``mfu`` vs the chip's bf16 peak — the reference's
TimerOutput measurement contract (source/LOD.cc:16-19) upgraded to
hardware-utilization terms.

Prints ONE JSON line.  Override the config via env vars BENCH_DIM,
BENCH_REFINE, BENCH_SUB, BENCH_ELL, BENCH_CHUNK, BENCH_PROBLEM, BENCH_REPS,
BENCH_PREC (matmul precision: "high" 3-pass bf16 default, "default" 1-pass).
"""

import json
import os
import time

import jax
import jax.numpy as jnp


# bf16 MXU peak TFLOP/s per chip, by device-kind substring
_PEAK_TFLOPS = [
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0), ("v5", 459.0),
    ("v6e", 918.0), ("v4", 275.0), ("v3", 123.0),
]


def chip_peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", str(device)).lower()
    for sub, peak in _PEAK_TFLOPS:
        if sub in kind:
            return peak
    return 197.0


def flops_model(dim, ell, s, C, P, n_stencil, slod=True, eig_sweeps=8,
                cg_iters=40, spec_mode="jacobi", smallk=32, smallk_power=3,
                banded=True):
    """Analytic FLOPs of the end-to-end step (per the pipeline stages in
    models/lod.py one_patch + stencil build + coarse CG).  Counts multiply-
    adds as 2 FLOPs; Cholesky n^3/3, TRSM n^2 k per triangle.

    ``spec_mode`` selects the spectral-stage cost: "jacobi" charges the
    full one-sided Jacobi sweep cascade; "smallk" charges the production
    path (ops/eig.smallk_truncated_dvec: batched Gauss-Jordan inverse +
    inverse subspace iteration on the smallest ``smallk`` directions) —
    ~10x fewer FLOPs, so the reported MFU stays honest.

    ``banded`` charges the production assembly_mode="banded" path: the
    trace/premultiply products run through the nodal-stencil
    ``stencil_apply`` (2 * nN * 3^dim * C^2 per column — 27x fewer FLOPs
    than the dense (nI, nD) product the r3 model charged), plus the
    ``bands_to_dense_mm`` placement-matmul embedding of the solve block.
    Cross-checked against XLA cost_analysis (tests/test_flops_model.py)."""
    kappa = 2 * ell + 1
    nNn = (kappa * s + 1) ** dim             # canvas nodes per patch
    nIn = (kappa * s - 1) ** dim             # interior nodes per patch
    nI = nIn * C                             # interior dofs per patch
    nD = nNn * C                             # canvas dofs per patch
    cD = kappa ** dim * C                    # coarse dofs per patch
    n_sub = (kappa * s) ** dim
    nq = 2 ** dim
    m = nq * C
    O = 3 ** dim
    per_patch = {
        "assembly": 2 * n_sub * nq * m * m,
        "cholesky": nI ** 3 // 3,
        "trsm_multirhs": 2 * nI * nI * cD,
        "triple_product": 2 * nI * cD * cD,
        "T_inverse": 3 * cD ** 3 + cD ** 3 // 3,
    }
    if banded:
        # bands_to_dense_mm: einsum("nocd,ow->cdnw") over the interior
        # grid, w = nIn + 1 (ops/assembly.py:220-244)
        per_patch["band_embed"] = 2 * C * C * nIn * O * (nIn + 1)
    if slod:
        trace = ((2 * nNn * O * C * C * cD      # S_AiPT via stencil_apply
                  if banded else 2 * nD * nI * cD)
                 + 2 * nD * cD * cD)            # BD = (.) @ Tinv
        per_patch.update({
            "slod_trace_products": trace,
            # ONE shared F = BD^T BD; per-component Grams are 0/1 diagonal
            # maskings of F (models/basis.py finish_pre)
            "slod_gram": 2 * nD * cD * cD + C * 3 * cD * cD,
            "slod_candidates": C * (2 * cD * cD + 2 * nI * cD),
            # premultiplied basis A @ phi (k = C columns)
            "premultiply": (2 * nNn * O * C * C * C if banded
                            else 2 * nD * nI * C),
        })
        if spec_mode == "smallk":
            kk = min(smallk, cD)
            per_patch["slod_spectral"] = C * (
                2 * cD ** 3                        # Gauss-Jordan inverse
                + (smallk_power + 1) * 2 * cD * cD * kk   # subspace matmuls
                + smallk_power * 2 * cD * kk * kk  # MGS2 orthonormalization
                + 2 * cD * kk * kk                 # W = Z^T G Z reduction
                + 7 * 8 * kk ** 3                  # (k, k) Jacobi eig
                + 4 * cD * kk)                     # projections + scan
        else:
            per_patch["slod_spectral"] = C * 7 * eig_sweeps * cD ** 3
    K, K2, O = kappa ** dim, (kappa + 1) ** dim, (s + 1) ** dim
    global_flops = {
        "stencil_cell_pairs": 2 * P * K * K2 * O * C * C,
        "stencil_correlation": 2 * P * (kappa ** 2) * ((kappa + 1) ** 2)
        * (2 * min(2 * ell, 10) + 1) * C * C * dim,
        "coarse_cg": 2 * cg_iters * P * n_stencil * C * C,
    }
    stages = {k: v * P for k, v in per_patch.items()}
    stages.update(global_flops)
    return stages


def _probe_backend(timeout_s: int = 240) -> None:
    """Fail fast when the tunneled TPU is unreachable.

    A dead axon tunnel hangs ``jax.devices()`` forever at the chip claim
    (the relay port still accepts TCP), which would hang the whole bench
    run; probe device init in a bounded subprocess first and exit with a
    clear message instead.  Skipped when a platform override is active or
    BENCH_SKIP_PROBE=1."""
    import subprocess
    import sys
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        _emit_stale_or_exit(
            f"bench: TPU backend init hung >{timeout_s}s (axon tunnel "
            "down?); aborting instead of hanging. Set BENCH_PLATFORM=cpu "
            "for a host-backend run or BENCH_SKIP_PROBE=1 to wait anyway.")
    except subprocess.CalledProcessError as exc:
        _emit_stale_or_exit(
            "bench: TPU backend init failed:\n"
            + exc.stderr.decode(errors="replace")[-2000:])


def _emit_stale_or_exit(msg: str) -> None:
    """The chip is unreachable.  If a previous successful TPU run persisted
    its JSON line (BENCH_SELF.json, written by main() after every on-chip
    measurement), print THAT line — explicitly marked ``"stale": true`` with
    its recording timestamp — so a measured number stays on record through a
    tunnel outage (VERDICT r3 #1); otherwise exit with the probe message."""
    import sys
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SELF.json")
    try:
        with open(path) as fh:
            rec = json.load(fh)
    except (OSError, ValueError):
        raise SystemExit(msg)
    rec["stale"] = True
    rec.setdefault("provenance", "")
    rec["provenance"] = ("TPU unreachable at bench time; this line replays "
                         "the last successful on-chip measurement "
                         f"(recorded {rec.get('self_recorded_at')}). "
                         + rec["provenance"])
    print(msg, file=sys.stderr)
    print(json.dumps(rec))
    raise SystemExit(0)


def main():
    # Orchestrator / worker split: without _BENCH_KNOBS this process never
    # touches the device — it walks the degradation ladder spawning one
    # SUBPROCESS per attempt, so a failed attempt's device footprint
    # (executables, captured constants, transferred arrays, the backend
    # client itself) is released by process exit before the retry.  The
    # in-process cleanup this replaces (clear_caches + live-array delete)
    # was measured insufficient: after a refine-5 compile OOM every
    # retry died RESOURCE_EXHAUSTED fetching an 8 MB array
    # (r05 s3, bench_el5b.log).
    if os.environ.get("_BENCH_KNOBS") is None:
        _orchestrate()
        return
    knobs = json.loads(os.environ["_BENCH_KNOBS"])
    # BENCH_PLATFORM=cpu forces the host backend *programmatically* — the
    # axon site package overrides the JAX_PLATFORMS environment variable,
    # so an env-only override silently still targets the tunneled TPU
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    elif os.environ.get("BENCH_SKIP_PROBE") != "1":
        _probe_backend()
    # persistent compilation cache: repeat driver runs skip the multi-minute
    # remote TPU compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    _run(**knobs)


def _orchestrate():
    """Walk the degradation ladder, one subprocess per attempt.

    The round MUST close with a parsed JSON line (VERDICT r4 #2: rounds
    3 AND 4 closed rc=1 — tunnel outage, then a compile-time kernel
    exception that the old remote_compile-only retry did not catch).
    Degradation ladder: (1) the real config; (2) halved patch chunk
    (HBM-pressure class); (3) + XLA eig instead of the Pallas Jacobi
    kernel (the r4 failure class); (4) + full XLA patch solver (no
    custom Pallas anywhere — slow, but it is a *measured* number).
    Anything surviving all four replays the persisted BENCH_SELF.json
    marked stale.  A worker that itself replays stale (probe failure)
    exits 0 with the stale line — accepted as-is, no further attempts."""
    import subprocess
    import sys
    ladder = [
        {},
        {"chunk_div": 2},
        {"chunk_div": 2, "eig_lax": True},
        {"chunk_div": 2, "eig_lax": True, "solver_lax": True},
    ]
    timeout_s = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", 5400))
    last_err = "no attempt produced output"
    for knobs in ladder:
        env = dict(os.environ, _BENCH_KNOBS=json.dumps(knobs))
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {knobs} exceeded {timeout_s:.0f}s"
            print(f"bench: {last_err}", file=sys.stderr)
            continue
        if res.stderr:
            print(res.stderr[-4000:], file=sys.stderr)
        line = next((ln for ln in reversed(res.stdout.splitlines())
                     if ln.startswith("{")), None)
        if res.returncode == 0 and line:
            print(line)
            return
        last_err = (res.stderr or res.stdout or "")[-4000:]
        print(f"bench: attempt with knobs {knobs} failed (rc="
              f"{res.returncode})", file=sys.stderr)
    _emit_stale_or_exit(
        "bench: all degraded attempts failed; last error:\n" + last_err)


def _run(chunk_div: int = 1, eig_lax: bool = False,
         solver_lax: bool = False):
    # Test-only fault injection (tests/test_bench_resilience.py): since
    # every ladder attempt runs in its own subprocess, the resilience
    # tests cannot monkeypatch _run — they inject failures through the
    # environment instead, so the REAL orchestrator/worker path is what
    # gets exercised.  BENCH_FAULT='{"always": true}' fails every
    # attempt; '{"unless": "eig_lax"}' fails any attempt whose knobs do
    # not set eig_lax.
    fault = os.environ.get("BENCH_FAULT")
    if fault:
        spec = json.loads(fault)
        knobs = {"chunk_div": chunk_div > 1, "eig_lax": eig_lax,
                 "solver_lax": solver_lax}
        if spec.get("always") or not knobs.get(spec.get("unless", "")):
            raise RuntimeError("BENCH_FAULT injected failure")
    from dealii_slod_tpu.config import ReductionControl, SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    problem = os.environ.get("BENCH_PROBLEM", "diffusion")

    # measured-winner knob defaults: ADOPTED.json (written by
    # scripts/adopt.py from the unattended A/B queue) provides per-problem
    # BENCH_* defaults; explicit env vars still win.  This lets the
    # watcher-run measurement session promote a winning knob to the
    # driver's round-close bench without a code edit.
    adopted = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "ADOPTED.json")) as fh:
            adopted = json.load(fh).get(problem, {})
    except Exception:
        pass

    def env(k, default):
        return os.environ.get(k, adopted.get(k, default))

    dim = int(env("BENCH_DIM", 3))
    refine = int(env("BENCH_REFINE", 4))
    sub = int(env("BENCH_SUB", 2))
    ell = int(env("BENCH_ELL", 2))
    # elasticity triples the per-patch component count; at the 3D refine-3
    # config chunk=256 exceeds the v5e's 15.75G HBM by ~37M (measured OOM,
    # r4 session) — halve the default there so the elasticity bench fits.
    # At refine>=5 (32768 patches) the per-chunk dense-canvas temps put
    # chunk=128 ~1.6G over HBM (measured, r05 s3) — halve again.
    # Diffusion north star (3D refine-4): chunk=128 beats 256 since the
    # identity gather/scatter skips landed (4704.4 vs 4522.4 patches/s,
    # both chip-measured 5-rep runs, r05 s3) — fewer live per-chunk temps
    # win over amortizing the chunk-map overhead across fewer steps.
    # Other diffusion configs keep the measured-best 256.
    chunk = max(32, int(env("BENCH_CHUNK",
                            64 if (problem == "elasticity" and dim == 3
                                   and refine >= 5)
                            else 128 if (problem == "elasticity"
                                         and dim == 3)
                            else 128 if (dim == 3 and refine == 4)
                            else 256)) // chunk_div)
    reps = int(env("BENCH_REPS", 5))
    degraded = []
    if chunk_div > 1:
        degraded.append(f"chunk/{chunk_div}")
    if eig_lax:
        degraded.append("eig_solver=lax")
    if solver_lax:
        degraded.append("patch_solver=lax")

    cfg = SLODConfig(
        dim=dim, n_global_refinements=refine, n_subdivisions=sub,
        oversampling=ell, lod_stabilization=True,
        constant_coefficients=False, coef_seed=0, coef_refinement=5,
        rhs="1", bc="0", dtype="float32", patch_chunk=chunk,
        solve_fine_problem=False,
        coarse_solver=ReductionControl(500, 1e-6, 1e-6),
        eig_sweeps=int(env("BENCH_EIG_SWEEPS", 12)),
        eig_tol=float(env("BENCH_EIG_TOL", 3e-6)),
        eig_solver="lax" if eig_lax else env("BENCH_EIG_SOLVER", "auto"),
        patch_solver="lax" if solver_lax else env("BENCH_SOLVER", "auto"),
        smallk_dirs=int(env("BENCH_SMALLK", 32)),
        smallk_power=int(env("BENCH_POWER", 3)),
        # adaptive W-stage sweeps, same monitor threshold convention as
        # eig_tol above (library default stays exact/0.0); measured
        # 4333 -> 4372 alone, part of the 4493.6 adopted combo (r5 s1)
        smallk_tol=float(env("BENCH_SMALLK_TOL", 3e-6)),
        smallk_weig=env("BENCH_WEIG", "0") == "1",
        fused_algo=env("BENCH_ALGO", "ldl"),
        solver_gj2=env("BENCH_GJ2", "0") == "1",
        trace_impl=env("BENCH_TRACE_IMPL", "slice"),
        trace_kernel=env("BENCH_TRACE_KERNEL", "auto"),
        fused_nb=int(env("BENCH_NB", 64)),
        fused_block=int(env("BENCH_BS", 4)),
        panel_nb=int(env("BENCH_PANEL_NB", 128)),
        split_bs=int(env("BENCH_SPLIT_BS", 4)),
        panel_gj_bs=int(env("BENCH_GJBS", 16)),
        coef_windows=env("BENCH_COEF_WINDOWS", "1") == "1",
        window_chunk=env("BENCH_WINDOW_CHUNK", "auto"),
        matmul_precision=env("BENCH_PREC", "high"),
        coarse_solve=env("BENCH_COARSE", "cg"),
        stencil_side_budget_mb=int(env("BENCH_SIDE_MB", 2048)),
    )
    if problem == "elasticity":
        from dealii_slod_tpu.models import ElasticityProblem
        cfg.rhs = "; ".join(["1"] * dim)
        prob = ElasticityProblem(cfg)
    else:
        prob = DiffusionProblem(cfg)
    solver = LODSolver(cfg, prob, verbose=False)
    P = solver.topo.n_patches

    solver.assemble_fine_rhs()
    step = jax.jit(solver.build_step())

    import numpy as np

    def pipeline():
        u, A_st = step(solver.coef_q, solver.fem_rhs)
        # fetch to host: on the axon backend block_until_ready does NOT
        # wait for the computation, so timings must materialize the value
        u_np = np.asarray(u)
        # never time garbage: a non-finite or identically-zero solution
        # means the pipeline silently diverged (NaN basis -> CG no-op)
        assert np.isfinite(u_np).all(), "bench pipeline produced non-finite"
        assert np.abs(u_np).max() > 0, "bench pipeline produced zero solution"
        return u_np, u

    # warm-up / compile — the tunneled remote-compile helper occasionally
    # fails transiently (HTTP 500); retry before giving up
    for attempt in range(3):
        try:
            t0 = time.perf_counter()
            _, u_dev = pipeline()
            compile_s = time.perf_counter() - t0
            break
        except Exception as exc:
            if attempt == 2 or "remote_compile" not in str(exc):
                raise
            time.sleep(5.0)

    # timed runs (fetch-inclusive; the fetched array is P floats — small)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pipeline()
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = sorted(times)[len(times) // 2]
    rate = P / best

    cg_iters = 40
    # resolve the spectral mode the pipeline ACTUALLY runs, mirroring
    # basis.py exactly (ADVICE r3): "auto" = smallk only at float32 on TPU,
    # and the hoisted smallk/jacobi split only exists on the non-lax
    # patch-solver path — the in-vmap (lax) builder uses full eigh.
    spec_mode = cfg.eig_solver
    if spec_mode == "auto":
        spec_mode = ("smallk" if (solver.dtype == jnp.float32
                                  and jax.default_backend() == "tpu")
                     else "lapack")
    if spec_mode in ("smallk", "jacobi") \
            and solver._fused_solver_mode() == "lax":
        spec_mode = "lapack"
    stages = flops_model(dim, ell, sub, solver.C, P, solver.n_stencil,
                         slod=True, eig_sweeps=8, cg_iters=cg_iters,
                         spec_mode=spec_mode, smallk=cfg.smallk_dirs,
                         smallk_power=cfg.smallk_power,
                         banded=cfg.assembly_mode == "banded")
    if solver._use_direct_coarse():
        # coarse_solve="direct": dense Cholesky + 2 TRSVs instead of CG
        n = P * solver.C
        stages["coarse_cg"] = n ** 3 // 3 + 2 * 2 * n * n
    total_flops = sum(stages.values())
    tflops = total_flops / best / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    metric = (f"{dim}d_slod_{problem}_patches_per_sec"
              if problem != "diffusion" else f"{dim}d_slod_patches_per_sec")

    out = {
        "metric": metric,
        "value": round(rate, 2),
        "unit": "patches/s",
        "vs_baseline": round(rate / 4096.0, 4),
        "detail": {
            "patches": P, "dim": dim, "oversampling": ell,
            "n_subdivisions": sub, "coarse_cells_per_axis": 2 ** refine,
            "wall_s": round(best, 4), "wall_median_s": round(median, 4),
            "reps": reps, "compile_s": round(compile_s, 2),
            "tflops": round(tflops, 3),
            "mfu": round(tflops / peak, 5),
            "peak_tflops_bf16": peak,
            "flops_model": {k: int(v) for k, v in stages.items()},
            "flops_total": int(total_flops),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    if degraded:
        out["detail"]["degraded"] = degraded
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "peak_bytes_in_use" in ms:
            out["detail"]["peak_hbm_gb"] = round(
                ms["peak_bytes_in_use"] / 2 ** 30, 3)
    except Exception:
        pass
    line = json.dumps(out)
    print(line)
    # persist the latest successful measurement so a number is always on
    # record even if the TPU tunnel is down when the driver runs bench.py
    # at round close (VERDICT r3 #1).  Only NORTH-STAR-config runs refresh
    # the record: an elasticity/2D/refine-5/accuracy-knob A/B from the
    # measurement queue must not become the replayed headline number.
    # degraded-ladder runs never refresh the headline record (ADVICE r4:
    # the committed BENCH_SELF.json must represent default-config perf)
    default_knobs = (not degraded
                     and all(os.environ.get(k) is None for k in
                             ("BENCH_SMALLK", "BENCH_POWER", "BENCH_PREC",
                              "BENCH_EIG_SWEEPS", "BENCH_EIG_TOL",
                              "BENCH_GJ2", "BENCH_ALGO", "BENCH_NB",
                              "BENCH_TRACE_IMPL", "BENCH_SOLVER",
                              "BENCH_EIG_SOLVER", "BENCH_CHUNK",
                              "BENCH_SMALLK_TOL", "BENCH_TRACE_KERNEL",
                              "BENCH_WEIG", "BENCH_SIDE_MB")))
    north_star = (metric == "3d_slod_patches_per_sec" and refine == 4
                  and ell == 2 and sub == 2 and default_knobs)
    # side records (VERDICT r4 #6): default-knob non-diffusion problems
    # (the C>1 elasticity path) get their own auditable persisted trail
    side = (problem != "diffusion" and default_knobs
            and dim == 3 and ell == 2 and sub == 2)
    if jax.default_backend() == "tpu" and (north_star or side):
        fname = ("BENCH_SELF.json" if north_star
                 else f"BENCH_SELF_{problem}_refine{refine}.json")
        try:
            import datetime
            stamped = dict(out)
            stamped["self_recorded_at"] = \
                datetime.datetime.now().isoformat(timespec="seconds")
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), fname), "w") as fh:
                fh.write(json.dumps(stamped, indent=1) + "\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
