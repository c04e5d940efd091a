"""Promote a measured A/B winner to a bench default (ADOPTED.json).

Usage:
    python scripts/adopt.py BASE_LOG CAND_LOG PROBLEM KNOB VALUE [MARGIN]

Reads the LAST JSON line of each bench log (the ``python bench.py`` stdout
capture).  If the candidate's ``value`` (patches/s) beats the base by more
than MARGIN (default 2%), merges ``{PROBLEM: {KNOB: VALUE}}`` into
ADOPTED.json at the repo root — which bench.py consults for per-problem
BENCH_* defaults (explicit env vars still win).  This is how the unattended
measurement queue promotes a winning knob to the driver's round-close bench
without a code edit.  Stale-replayed lines (``"stale": true``) never adopt.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_json_line(path: str):
    rec = None
    with open(path, errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if "value" in cand:
                    rec = cand
    return rec


def main():
    base_log, cand_log, problem, knob, value = sys.argv[1:6]
    margin = float(sys.argv[6]) if len(sys.argv) > 6 else 0.02
    base = last_json_line(base_log)
    cand = last_json_line(cand_log)
    if not base or not cand:
        print(f"adopt: missing JSON line (base={bool(base)} "
              f"cand={bool(cand)}); no adoption")
        return
    if base.get("stale") or cand.get("stale"):
        print("adopt: stale replay in inputs; no adoption")
        return
    b, c = float(base["value"]), float(cand["value"])
    if c <= b * (1.0 + margin):
        print(f"adopt: {knob}={value} [{problem}] NOT adopted "
              f"({c:.1f} vs {b:.1f} patches/s, margin {margin:.0%})")
        return
    path = os.path.join(ROOT, "ADOPTED.json")
    data = {}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    data.setdefault(problem, {})[knob] = value
    data[problem][f"{knob}__evidence"] = (
        f"{c:.1f} vs {b:.1f} patches/s "
        f"({os.path.basename(cand_log)} vs {os.path.basename(base_log)})")
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"adopt: {knob}={value} [{problem}] ADOPTED "
          f"({c:.1f} vs {b:.1f} patches/s) -> {path}")


if __name__ == "__main__":
    main()
