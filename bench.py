"""Benchmark: 3D Poisson SLOD basis construction + coarse solve throughput.

North-star config (BASELINE.md): 4096 patches (16^3 coarse mesh), l=2
oversampling, high-contrast random coefficients — patches/sec through
Q_iso_Q1 assembly + batched internal Cholesky multi-RHS solve + SLOD
boundary-trace SVD + coarse stencil assembly + coarse CG solve.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver's target is 4096 patches assembled+decomposed+solved in < 1 s on a
v5p-8, i.e. 4096 patches/s.  ``vs_baseline`` is measured rate / 4096.

Prints ONE JSON line.  Override the config via env vars BENCH_DIM,
BENCH_REFINE, BENCH_SUB, BENCH_ELL, BENCH_CHUNK.
"""

import json
import os
import time

import jax


def main():
    # persistent compilation cache: repeat driver runs skip the multi-minute
    # remote TPU compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dealii_slod_tpu.config import ReductionControl, SLODConfig
    from dealii_slod_tpu.models import DiffusionProblem, LODSolver

    dim = int(os.environ.get("BENCH_DIM", 3))
    refine = int(os.environ.get("BENCH_REFINE", 4))
    sub = int(os.environ.get("BENCH_SUB", 2))
    ell = int(os.environ.get("BENCH_ELL", 2))
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    problem = os.environ.get("BENCH_PROBLEM", "diffusion")

    cfg = SLODConfig(
        dim=dim, n_global_refinements=refine, n_subdivisions=sub,
        oversampling=ell, lod_stabilization=True,
        constant_coefficients=False, coef_seed=0, coef_refinement=5,
        rhs="1", bc="0", dtype="float32", patch_chunk=chunk,
        solve_fine_problem=False,
        coarse_solver=ReductionControl(500, 1e-6, 1e-6),
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
        return np.asarray(u)

    # warm-up / compile
    t0 = time.perf_counter()
    pipeline()
    compile_s = time.perf_counter() - t0

    # timed runs (fetch-inclusive)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        pipeline()
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = P / best

    print(json.dumps({
        "metric": f"{dim}d_slod_{problem}_patches_per_sec" if problem != "diffusion" else f"{dim}d_slod_patches_per_sec",
        "value": round(rate, 2),
        "unit": "patches/s",
        "vs_baseline": round(rate / 4096.0, 4),
        "detail": {
            "patches": P, "dim": dim, "oversampling": ell,
            "n_subdivisions": sub, "coarse_cells_per_axis": 2 ** refine,
            "wall_s": round(best, 4), "compile_s": round(compile_s, 2),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
