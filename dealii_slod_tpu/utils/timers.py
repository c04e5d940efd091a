"""Stage wall-clock timers — TPU-native replacement for the reference's
``dealii::TimerOutput`` sections ("1: Create Patches", "2: compute basis
function", ..., source/LOD.cc:16-19 and enter_subsection calls).  Sections
synchronize the device (``block_until_ready``) so the numbers are honest."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync: object = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mark(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return ""
        width = max(len(k) for k in self.totals)
        lines = ["+---------------------------------------------+",
                 "| wall-clock timing summary                   |",
                 "+---------------------------------------------+"]
        total = sum(self.totals.values())
        for k in sorted(self.totals):
            lines.append(f"| {k:<{width}} | {self.counts[k]:4d} | "
                         f"{self.totals[k]:10.4f}s |")
        lines.append(f"| {'TOTAL':<{width}} |      | {total:10.4f}s |")
        lines.append("+---------------------------------------------+")
        return "\n".join(lines)
