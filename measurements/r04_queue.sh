#!/bin/bash
# Sequential TPU measurement session (one process at a time on the chip).
#
# Structure: a CRITICAL block first (default benches + the two highest-value
# A/Bs + adoption + a cache-warming final) reaches a fully-adopted,
# driver-ready state within ~1.5 h of the tunnel returning; the exploration
# tail (solver/stage breakdowns, accuracy, scale datapoint, cheap knob A/Bs)
# follows; a second adoption pass + final benches close the session.
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
adopt() { python scripts/adopt.py "$@" 2>&1 | tee -a $L/summary.log; }
kommit() {
  for f in measurements BENCH_SELF.json ADOPTED.json ADOPTED.rolled_back.json; do
    [ -e "$f" ] && git add "$f" 2>/dev/null
  done
  git -c user.name=distsys-graft -c user.email=graft@local \
    commit -q -m "$1" 2>/dev/null
}

# ---- critical block -------------------------------------------------------
run bench_default   900 python bench.py
run bench_coarse_dir 900 env BENCH_COARSE=direct python bench.py
run bench_elast     1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
run bench_elast_pan 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel python bench.py
run bench_panel     900 env BENCH_SOLVER=panel python bench.py
adopt $L/bench_default.log $L/bench_coarse_dir.log diffusion BENCH_COARSE direct
adopt $L/bench_default.log $L/bench_panel.log     diffusion BENCH_SOLVER panel
adopt $L/bench_elast.log $L/bench_elast_pan.log   elasticity BENCH_SOLVER panel
run bench_final1    900 python bench.py
# rollback guard 1: combined adopted diffusion config must not regress
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os, json
sys.path.insert(0, "scripts")
from adopt import last_json_line
base = last_json_line("/tmp/tpu_session/bench_default.log")
fin = last_json_line("/tmp/tpu_session/bench_final1.log")
regressed = (base and fin and not fin.get("stale")
             and float(fin["value"]) < float(base["value"]) * 0.99)
if regressed and os.path.exists("ADOPTED.json"):
    # problem-scoped: only the diffusion section regressed; keep the
    # independently A/B-validated elasticity adoptions
    data = json.load(open("ADOPTED.json"))
    dropped = data.pop("diffusion", None)
    json.dump({"diffusion": dropped}, open("ADOPTED.rolled_back.json", "w"),
              indent=1)
    if data:
        json.dump(data, open("ADOPTED.json", "w"), indent=1)
    else:
        os.remove("ADOPTED.json")
    open("/tmp/tpu_session/GUARD1_ROLLBACK", "w").write("1")
    print(f"rollback-1: diffusion {fin['value']} < default {base['value']}; diffusion adoptions dropped ({dropped})")
else:
    print(f"guard-1 ok: final1 {fin and fin.get('value')} vs default {base and base.get('value')}")
PYEOF
cp ADOPTED.json $L/ADOPTED.stage1.json 2>/dev/null
run bench_elast_f1  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
kommit "measurements: r4 TPU critical block (default + coarse-direct + elasticity panel A/Bs, adoption)"

# ---- exploration tail -----------------------------------------------------
run solverbench_dif 900 python scripts/solverbench.py 729 125 256
run stagebench3     900 python scripts/stagebench3.py
run solverbench_ela 1200 python scripts/solverbench.py 2187 375 64
run stagebench3_ela 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python scripts/stagebench3.py
run accuracy_f32    1200 python scripts/accuracy.py 3 2 f32
run accuracy_ela    1800 env ACC_PROBLEM=elasticity python scripts/accuracy.py 2 2
run bench_refine5   1800 env BENCH_REFINE=5 python bench.py
# cheap knob A/Bs (each is a cold compile ~230s + a few timed reps).
# NOTE: these run with stage-1 adoptions as their defaults; their adopt()
# baselines below are re-run pins against the matching stage-1 config.
run bench_smallk16  900 env BENCH_SMALLK=16 python bench.py
run bench_power2    900 env BENCH_POWER=2 python bench.py
run bench_chunk512  900 env BENCH_CHUNK=512 python bench.py
run bench_bs2       900 env BENCH_BS=2 python bench.py
run bench_ela_c128  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_CHUNK=128 python bench.py
run bench_ela_pnb256 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_PANEL_NB=256 python bench.py
run bench_ela_gj32  1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 BENCH_SOLVER=panel BENCH_GJBS=32 python bench.py
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

# ---- second adoption pass -------------------------------------------------
# exact-algebra (accuracy-neutral) knobs only; accuracy-affecting knobs
# (SMALLK/POWER/PREC/EIG_*) are NEVER auto-adopted.  Baselines: final1
# (stage-1 adopted diffusion config), bench_elast(_pan) for elasticity.
DBASE=$L/bench_final1.log
[ -f $L/GUARD1_ROLLBACK ] && DBASE=$L/bench_default.log
adopt $DBASE $L/bench_chunk512.log  diffusion BENCH_CHUNK 512
# gj_bs only matters on the panel path
if grep -q '"BENCH_SOLVER": "panel"' ADOPTED.json 2>/dev/null; then
  adopt $L/bench_panel.log $L/bench_pan_gj64.log diffusion BENCH_GJBS 64
fi
# BENCH_BS only affects the fused solver: a panel adoption makes the bs2
# run a duplicate config, so skip the (noise-measuring) adopt there
if ! grep -q '"BENCH_SOLVER": "panel"' ADOPTED.json 2>/dev/null; then
  adopt $DBASE $L/bench_bs2.log     diffusion BENCH_BS 2
fi
adopt $L/bench_elast_f1.log $L/bench_ela_c128.log elasticity BENCH_CHUNK 128
adopt $L/bench_elast_pan.log $L/bench_ela_pnb256.log elasticity BENCH_PANEL_NB 256
adopt $L/bench_elast_pan.log $L/bench_ela_gj32.log  elasticity BENCH_GJBS 32
run bench_final2    900 python bench.py
# rollback guard 2: the stage-2 combination must not regress vs stage 1
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os, json
sys.path.insert(0, "scripts")
from adopt import last_json_line
rolled1 = os.path.exists("/tmp/tpu_session/GUARD1_ROLLBACK")
ref = (last_json_line("/tmp/tpu_session/bench_default.log") if rolled1
       else (last_json_line("/tmp/tpu_session/bench_final1.log")
             or last_json_line("/tmp/tpu_session/bench_default.log")))
fin = last_json_line("/tmp/tpu_session/bench_final2.log")
if ref and fin and not fin.get("stale") and float(fin["value"]) < float(ref["value"]) * 0.99:
    # restore the stage-1 DIFFUSION section only (elasticity untouched:
    # its own guard runs after bench_elast_final)
    cur = json.load(open("ADOPTED.json")) if os.path.exists("ADOPTED.json") else {}
    st1 = (json.load(open("/tmp/tpu_session/ADOPTED.stage1.json"))
           if os.path.exists("/tmp/tpu_session/ADOPTED.stage1.json") else {})
    if rolled1 or "diffusion" not in st1:
        cur.pop("diffusion", None)
    else:
        cur["diffusion"] = st1["diffusion"]
    if cur:
        json.dump(cur, open("ADOPTED.json", "w"), indent=1)
    elif os.path.exists("ADOPTED.json"):
        os.remove("ADOPTED.json")
    print(f"rollback-2: stage-2 diffusion {fin['value']} < {ref['value']}; diffusion section restored to stage-1")
else:
    print(f"guard-2 ok: final2 {fin and fin.get('value')} vs baseline {ref and ref.get('value')}")
PYEOF
run bench_post_guard 900 python bench.py
run bench_elast_final 1200 env BENCH_PROBLEM=elasticity BENCH_REFINE=3 python bench.py
# elasticity guard: the combined elasticity adoptions must not regress
python - << 'PYEOF' 2>&1 | tee -a $L/summary.log
import sys, os, json
sys.path.insert(0, "scripts")
from adopt import last_json_line
base = last_json_line("/tmp/tpu_session/bench_elast.log")
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
kommit "measurements: r4 TPU session results (auto-committed by the watcher queue)"
echo "repo copy + commit done" >> $L/summary.log
