"""f32-TPU vs f64-CPU accuracy of the end-to-end step (VERDICT r1 #5).

Runs the same config twice — float32 on the default backend and float64 on
CPU — and prints relative errors of the coarse solution, stencil operator
and basis canvases.

Usage:
    python scripts/accuracy.py [refine] [ell]          # both runs + report
    python scripts/accuracy.py [refine] [ell] f32      # only the f32 run
    python scripts/accuracy.py [refine] [ell] f64      # only the f64 run
    python scripts/accuracy.py [refine] [ell] report   # only the comparison
    ACC_PROBLEM=elasticity python scripts/accuracy.py 2 2   # 3D elasticity
"""
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

refine = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ell = int(sys.argv[2]) if len(sys.argv) > 2 else 2
what = sys.argv[3] if len(sys.argv) > 3 else "all"
problem = os.environ.get("ACC_PROBLEM", "diffusion")

CHILD = """
import sys
dtype, force_cpu = sys.argv[1], sys.argv[2] == "cpu"
import jax
if force_cpu:
    jax.config.update("jax_platforms", "cpu")
if dtype == "float64":
    jax.config.update("jax_enable_x64", True)
import numpy as np
sys.path.insert(0, {here!r})
from dealii_slod_tpu.config import ReductionControl, SLODConfig
from dealii_slod_tpu.models import DiffusionProblem, LODSolver
cfg = SLODConfig(dim=3, n_global_refinements={refine}, n_subdivisions=2,
                 oversampling={ell}, lod_stabilization=True,
                 constant_coefficients=False, coef_seed=0, coef_refinement=5,
                 rhs="1", bc="0", dtype=dtype, patch_chunk=256,
                 solve_fine_problem=False,
                 matmul_precision=__import__("os").environ.get(
                     "ACC_PRECISION", "high"),
                 eig_sweeps=12, eig_tol=1e-9,
                 coarse_solver=ReductionControl(1000, 1e-12, 1e-10))
if {problem!r} == "elasticity":
    from dealii_slod_tpu.models import ElasticityProblem
    cfg.rhs = "; ".join(["1"] * cfg.dim)
    s = LODSolver(cfg, ElasticityProblem(cfg), verbose=False)
else:
    s = LODSolver(cfg, DiffusionProblem(cfg), verbose=False)
s.compute_basis(); s.assemble_coarse_operator(); s.assemble_fine_rhs()
s.solve_coarse()
u = s.prolong_lod_solution()   # PHYSICAL (basis-gauge-invariant) field:
# the sigma-truncation's discrete ||d||<0.5 decisions may differ between
# precisions, giving a different-but-equivalent stabilized basis; coarse
# coefficient vectors are therefore not comparable across dtypes
assert np.isfinite(np.asarray(s.Phi)).all(), "non-finite basis"
np.save(f"/tmp/acc_{{dtype}}.npy", np.asarray(u, np.float64))
np.save(f"/tmp/acc_A_{{dtype}}.npy", np.asarray(s.A_stencil, np.float64))
print("done", dtype)
"""


def run(dtype, force_cpu):
    code = CHILD.format(here=HERE, refine=refine, ell=ell,
                        problem=problem)
    subprocess.run([sys.executable, "-c", code, dtype,
                    "cpu" if force_cpu else "dev"], check=True, cwd=HERE)


if what in ("all", "f32"):
    run("float32", False)
if what in ("all", "f64"):
    run("float64", True)
if what in ("all", "report"):
    u32 = np.load("/tmp/acc_float32.npy")
    u64 = np.load("/tmp/acc_float64.npy")
    A32 = np.load("/tmp/acc_A_float32.npy")
    A64 = np.load("/tmp/acc_A_float64.npy")
    rel = lambda a, b: float(np.abs(a - b).max() / np.abs(b).max())
    print(f"lod solution rel err (fine field): {rel(u32, u64):.3e}")
    print(f"stencil operator rel err (gauge-dependent diagnostic): "
          f"{rel(A32, A64):.3e}")
