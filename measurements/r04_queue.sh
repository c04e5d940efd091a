#!/bin/bash
# Sequential TPU measurement session (one process at a time on the chip).
cd /root/repo
L=/tmp/tpu_session
R=/root/repo/measurements/r04_tpu_session
mkdir -p $L $R
run() {
  echo "=== start $(date +%H:%M:%S)" | tee -a $L/summary.log
  n=$1; t=$2; shift 2
  timeout $t "$@" > $L/$n.log 2>&1
  rc=$?
  tail -2 $L/$n.log | tee -a $L/summary.log
  echo "=== $n rc=$rc $(date +%H:%M:%S)" | tee -a $L/summary.log
  # persist into the repo so the end-of-round commit captures results even
  # if the session fires unattended
  cp $L/$n.log $R/ 2>/dev/null
  cp $L/summary.log $R/ 2>/dev/null
}
run bench_default   900 python bench.py
run bench_coarse_dir 900 env BENCH_COARSE=direct python bench.py
run solverbench_dif 900 python scripts/solverbench.py 729 125 256
run bench_panel     900 env BENCH_SOLVER=panel python bench.py
run bench_elast     1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
run bench_elast_pan 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel python bench.py
run stagebench3     900 python scripts/stagebench3.py
run solverbench_ela 1200 python scripts/solverbench.py 2187 375 64
run stagebench3_ela 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python scripts/stagebench3.py
run accuracy_f32    1200 python scripts/accuracy.py 3 2 f32
run accuracy_ela    1800 env ACC_PROBLEM=elasticity python scripts/accuracy.py 2 2
run bench_refine5   1800 env BENCH_REFINE=5 python bench.py
# cheap knob A/Bs (each is a cold compile ~230s + a few timed reps)
run bench_smallk16  900 env BENCH_SMALLK=16 python bench.py
run bench_power2    900 env BENCH_POWER=2 python bench.py
run bench_chunk512  900 env BENCH_CHUNK=512 python bench.py
run bench_ela_c128  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_CHUNK=128 python bench.py
run bench_ela_pnb256 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_PANEL_NB=256 python bench.py
run bench_ela_gj32  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_GJBS=32 python bench.py
run bench_bs2       900 env BENCH_BS=2 python bench.py
run bench_2d_dif    900 env BENCH_DIM=2 BENCH_REFINE=6 python bench.py
run bench_2d_ela    900 env BENCH_DIM=2 BENCH_REFINE=6 BENCH_PROBLEM=elasticity python bench.py
run bench_prec_def  900 env BENCH_PREC=default python bench.py
run bench_ela_prec 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_PREC=default python bench.py
run acc_prec_def   1200 env ACC_PRECISION=default python scripts/accuracy.py 3 2
run mc_3d          1200 env MC_DIM=3 MC_REFINE=4 MC_SAMPLES=16 python examples/monte_carlo.py
run serve_3d        900 env MR_DIM=3 MR_REFINE=4 MR_RHS=32 python examples/multi_rhs.py
run hlo_audit       900 python scripts/hlo_audit.py
# promote exact-algebra (accuracy-neutral) knob winners to bench defaults.
# Done at the END so the A/B runs above were not contaminated by earlier
# adoptions; accuracy-affecting knobs (SMALLK/POWER/PREC/EIG_*) are NEVER
# auto-adopted.
adopt() { python scripts/adopt.py "$@" 2>&1 | tee -a $L/summary.log; }
adopt $L/bench_default.log $L/bench_coarse_dir.log diffusion BENCH_COARSE direct
adopt $L/bench_default.log $L/bench_panel.log     diffusion BENCH_SOLVER panel
adopt $L/bench_default.log $L/bench_chunk512.log  diffusion BENCH_CHUNK 512
adopt $L/bench_default.log $L/bench_bs2.log       diffusion BENCH_BS 2
adopt $L/bench_elast.log $L/bench_elast_pan.log   elasticity BENCH_SOLVER panel
adopt $L/bench_elast.log $L/bench_ela_c128.log    elasticity BENCH_CHUNK 128
adopt $L/bench_elast_pan.log $L/bench_ela_pnb256.log elasticity BENCH_PANEL_NB 256
adopt $L/bench_elast_pan.log $L/bench_ela_gj32.log  elasticity BENCH_GJBS 32
run bench_final     900 python bench.py
# rollback guard: if the COMBINED adopted config regressed vs the plain
# default run, drop the adoptions and restore the known-good cache entry
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os
sys.path.insert(0, "scripts")
from adopt import last_json_line
base = last_json_line("/tmp/tpu_session/bench_default.log")
fin = last_json_line("/tmp/tpu_session/bench_final.log")
if base and fin and not fin.get("stale") and float(fin["value"]) < float(base["value"]) * 0.99 \
        and os.path.exists("ADOPTED.json"):
    os.rename("ADOPTED.json", "ADOPTED.rolled_back.json")
    print(f"rollback: combined adopted config {fin['value']} < default {base['value']}; ADOPTED.json removed")
else:
    print(f"adoption guard ok: final {fin and fin.get('value')} vs default {base and base.get('value')}")
PYEOF
run bench_post_guard 900 python bench.py
run bench_elast_final 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
echo "ALL DONE $(date)" | tee -a $L/summary.log
cp $L/summary.log $R/
git add measurements BENCH_SELF.json ADOPTED.json ADOPTED.rolled_back.json 2>/dev/null; \
  git -c user.name=distsys-graft -c user.email=graft@local \
  commit -q -m "measurements: r4 TPU session results (auto-committed by the watcher queue)" 2>/dev/null
echo "repo copy + commit done" >> $L/summary.log
