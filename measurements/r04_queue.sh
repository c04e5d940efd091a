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
run bench_2d_dif    900 env BENCH_DIM=2 BENCH_REFINE=6 python bench.py
run bench_2d_ela    900 env BENCH_DIM=2 BENCH_REFINE=6 BENCH_PROBLEM=elasticity python bench.py
run bench_prec_def  900 env BENCH_PREC=default python bench.py
run bench_ela_prec 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_PREC=default python bench.py
run acc_prec_def   1200 env ACC_PRECISION=default python scripts/accuracy.py 3 2
run mc_3d          1200 env MC_DIM=3 MC_REFINE=4 MC_SAMPLES=16 python examples/monte_carlo.py
run serve_3d        900 env MR_DIM=3 MR_REFINE=4 MR_RHS=32 python examples/multi_rhs.py
run hlo_audit       900 python scripts/hlo_audit.py
run bench_final     900 python bench.py
echo "ALL DONE $(date)" | tee -a $L/summary.log
cp $L/summary.log $R/
git add measurements BENCH_SELF.json 2>/dev/null && \
  git -c user.name=distsys-graft -c user.email=graft@local \
  commit -q -m "measurements: r4 TPU session results (auto-committed by the watcher queue)" 2>/dev/null
echo "repo copy + commit done" >> $L/summary.log
