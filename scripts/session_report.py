"""Condense a TPU measurement session directory into one markdown report.

Usage: python scripts/session_report.py [session_dir] [out_md]
Defaults: /tmp/tpu_session -> measurements/r04_tpu_session/REPORT.md

For every *.log in the session dir: extract the LAST bench JSON line
(metric/value/mfu/peak HBM) if present, else the last few non-empty lines
(stage tables, accuracy output).  The queue calls this at the end so an
unattended session leaves a readable artifact in the repo.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from adopt import last_json_line  # single bench-log JSON parser


def tail_lines(path, n=8):
    with open(path, errors="replace") as fh:
        lines = [ln.rstrip() for ln in fh if ln.strip()]
    return lines[-n:]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session"
    out = (sys.argv[2] if len(sys.argv) > 2
           else "measurements/r04_tpu_session/REPORT.md")
    logs = sorted(glob.glob(os.path.join(src, "*.log")))
    bench_rows, other = [], []
    for lg in logs:
        name = os.path.basename(lg)[:-4]
        if name == "summary":
            continue
        rec = last_json_line(lg)
        if rec:
            d = rec.get("detail", {})
            bench_rows.append(
                (name, rec.get("metric", ""), rec.get("value", ""),
                 rec.get("vs_baseline", ""), d.get("wall_s", ""),
                 d.get("mfu", ""), d.get("peak_hbm_gb", ""),
                 "STALE" if rec.get("stale") else ""))
        else:
            other.append((name, tail_lines(lg)))
    lines = ["# TPU session report", ""]
    if bench_rows:
        lines += ["## Bench JSON lines", "",
                  "| run | metric | patches/s | vs_baseline | wall s | MFU "
                  "| peak HBM GB | flags |",
                  "|---|---|---|---|---|---|---|---|"]
        for r in bench_rows:
            lines.append("| " + " | ".join(str(x) for x in r) + " |")
        lines.append("")
    for name, tl in other:
        lines += [f"## {name}", "", "```"] + tl + ["```", ""]
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(bench_rows)} bench rows, "
          f"{len(other)} other logs)")


if __name__ == "__main__":
    main()
