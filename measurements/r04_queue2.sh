#!/bin/bash
# Resumed r4 TPU measurement session (the first queue was interrupted after
# solverbench_dif by a session restart; critical block results are in
# measurements/r04_tpu_session).  One process at a time on the chip.
#
# Priorities: elasticity A/Bs first (r3 VERDICT #2: >=2x 156.8 patches/s),
# then the refine-5 scale datapoint (VERDICT #5), then the exploration tail
# and the second adoption pass.  Baselines: bench_final1 (diffusion, 4325.02)
# and bench_elast_c128 (elasticity chunk=128 default, 225.96).
cd /root/repo
L=/tmp/tpu_session
R=/root/repo/measurements/r04_tpu_session
mkdir -p $L $R
# restore prior-session logs so adoption baselines resolve
for f in $R/*.log; do
  b=$(basename "$f"); [ -f "$L/$b" ] || cp "$f" "$L/$b"
done
run() {
  echo "=== start $(date +%H:%M:%S)" | tee -a $L/summary.log
  n=$1; t=$2; shift 2
  timeout $t "$@" > $L/$n.log 2>&1
  rc=$?
  tail -2 $L/$n.log | tee -a $L/summary.log
  echo "=== $n rc=$rc $(date +%H:%M:%S)" | tee -a $L/summary.log
  cp $L/$n.log $R/ 2>/dev/null
  cp $L/summary.log $R/ 2>/dev/null
}
adopt() { python scripts/adopt.py "$@" 2>&1 | tee -a $L/summary.log; }
kommit() {
  for f in measurements BENCH_SELF.json ADOPTED.json ADOPTED.rolled_back.json; do
    [ -e "$f" ] && git add "$f" 2>/dev/null
  done
  git -c user.name=distsys-graft -c user.email=graft@local \
    commit -q -m "$1" 2>/dev/null
}

# ---- elasticity block (VERDICT #2) ----------------------------------------
run bench_elast_pan 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel python bench.py
adopt $L/bench_elast_c128.log $L/bench_elast_pan.log elasticity BENCH_SOLVER panel
run bench_ela_pnb256 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_PANEL_NB=256 python bench.py
run bench_ela_gj32  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_GJBS=32 python bench.py
if grep -q '"BENCH_SOLVER": "panel"' ADOPTED.json 2>/dev/null; then
  adopt $L/bench_elast_pan.log $L/bench_ela_pnb256.log elasticity BENCH_PANEL_NB 256
  adopt $L/bench_elast_pan.log $L/bench_ela_gj32.log  elasticity BENCH_GJBS 32
fi
run bench_ela_c64   1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_CHUNK=64 python bench.py
adopt $L/bench_elast_c128.log $L/bench_ela_c64.log elasticity BENCH_CHUNK 64
run stagebench3_ela 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python scripts/stagebench3.py
run solverbench_ela 1200 python scripts/solverbench.py 2187 375 64
kommit "measurements: r4 queue2 elasticity block (panel/chunk A/Bs, stage breakdown)"

# ---- scale datapoint (VERDICT #5) ------------------------------------------
run bench_refine5   1800 env BENCH_REFINE=5 python bench.py
kommit "measurements: r4 queue2 refine-5 scale datapoint (32768 patches)"

# ---- exploration tail -------------------------------------------------------
run stagebench3     900 python scripts/stagebench3.py
run accuracy_f32   1200 python scripts/accuracy.py 3 2 f32
run accuracy_ela   1800 env ACC_PROBLEM=elasticity python scripts/accuracy.py 2 2
run bench_smallk16  900 env BENCH_SMALLK=16 python bench.py
run bench_power2    900 env BENCH_POWER=2 python bench.py
run bench_chunk512  900 env BENCH_CHUNK=512 python bench.py
run bench_bs2       900 env BENCH_BS=2 python bench.py
run bench_pan_gj64  900 env BENCH_SOLVER=panel BENCH_GJBS=64 python bench.py
run bench_2d_dif    900 env BENCH_DIM=2 BENCH_REFINE=6 python bench.py
run bench_2d_ela    900 env BENCH_DIM=2 BENCH_REFINE=6 BENCH_PROBLEM=elasticity python bench.py
run bench_prec_def  900 env BENCH_PREC=default python bench.py
run bench_ela_prec 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_PREC=default python bench.py
run acc_prec_def   1200 env ACC_PRECISION=default python scripts/accuracy.py 3 2
run mc_3d          1200 env MC_DIM=3 MC_REFINE=4 MC_SAMPLES=16 python examples/monte_carlo.py
run mc_3d_logn     1200 env MC_DIM=3 MC_REFINE=4 MC_SAMPLES=16 MC_FIELD=lognormal python examples/monte_carlo.py
run serve_3d        900 env MR_DIM=3 MR_REFINE=4 MR_RHS=32 python examples/multi_rhs.py
run hlo_audit       900 python scripts/hlo_audit.py
kommit "measurements: r4 queue2 exploration tail"

# ---- second adoption pass (exact-algebra knobs only) ------------------------
DBASE=$L/bench_final1.log
adopt $DBASE $L/bench_chunk512.log  diffusion BENCH_CHUNK 512
if grep -q '"diffusion"' ADOPTED.json 2>/dev/null && \
   grep -q '"BENCH_SOLVER": "panel"' ADOPTED.json 2>/dev/null; then
  adopt $L/bench_panel.log $L/bench_pan_gj64.log diffusion BENCH_GJBS 64
else
  adopt $DBASE $L/bench_bs2.log     diffusion BENCH_BS 2
fi
run bench_final2    900 python bench.py
# rollback guard: the stage-2 diffusion combination must not regress
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os, json
sys.path.insert(0, "scripts")
from adopt import last_json_line
ref = last_json_line("/tmp/tpu_session/bench_final1.log")
fin = last_json_line("/tmp/tpu_session/bench_final2.log")
if ref and fin and not fin.get("stale") and float(fin["value"]) < float(ref["value"]) * 0.99 \
        and os.path.exists("ADOPTED.json"):
    data = json.load(open("ADOPTED.json"))
    dropped = data.pop("diffusion", None)
    if data:
        json.dump(data, open("ADOPTED.json", "w"), indent=1)
    else:
        os.remove("ADOPTED.json")
    print(f"rollback-2: diffusion {fin['value']} < final1 {ref['value']}; diffusion adoptions dropped ({dropped})")
else:
    print(f"guard-2 ok: final2 {fin and fin.get('value')} vs final1 {ref and ref.get('value')}")
PYEOF
run bench_post_guard 900 python bench.py
run bench_elast_final 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
# elasticity guard: the combined elasticity adoptions must not regress
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os, json
sys.path.insert(0, "scripts")
from adopt import last_json_line
base = last_json_line("/tmp/tpu_session/bench_elast_c128.log")
fin = last_json_line("/tmp/tpu_session/bench_elast_final.log")
if base and fin and not fin.get("stale") and float(fin["value"]) < float(base["value"]) * 0.99 \
        and os.path.exists("ADOPTED.json"):
    data = json.load(open("ADOPTED.json"))
    dropped = data.pop("elasticity", None)
    if data:
        json.dump(data, open("ADOPTED.json", "w"), indent=1)
    else:
        os.remove("ADOPTED.json")
    print(f"rollback-ela: {fin['value']} < default {base['value']}; elasticity adoptions dropped ({dropped})")
else:
    print(f"guard-ela ok: elast_final {fin and fin.get('value')} vs default {base and base.get('value')}")
PYEOF
python scripts/session_report.py $L $R/REPORT.md 2>&1 | tee -a $L/summary.log
echo "ALL DONE $(date)" | tee -a $L/summary.log
cp $L/summary.log $R/
kommit "measurements: r4 queue2 results (second adoption pass + finals)"
echo "repo copy + commit done" >> $L/summary.log
