"""Wall-cycle accounting (reference: src/gromacs/timing/wallcycle.cpp:483,759
— hierarchical region counters printed as the run performance table)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Wallcycle:
    def __init__(self):
        self.t: Dict[str, float] = defaultdict(float)
        self.n: Dict[str, int] = defaultdict(int)
        self._start = time.time()

    @contextlib.contextmanager
    def region(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.t[name] += time.perf_counter() - t0
            self.n[name] += 1

    def report(self) -> str:
        total = time.time() - self._start
        lines = ["", " R E A L   C Y C L E   A N D   T I M E   A C C O U N T I N G",
                 "", f" {'Activity':<24}{'Count':>10}{'Seconds':>12}{'%':>8}"]
        for k in sorted(self.t, key=lambda k: -self.t[k]):
            lines.append(f" {k:<24}{self.n[k]:>10}{self.t[k]:>12.3f}"
                         f"{100.0 * self.t[k] / max(total, 1e-9):>8.1f}")
        lines.append(f" {'total wall':<24}{'':>10}{total:>12.3f}{100.0:>8.1f}")
        return "\n".join(lines)

    def ns_per_day(self, nsteps: int, dt_ps: float) -> float:
        wall = self.t.get("step", time.time() - self._start)
        if wall <= 0:
            return 0.0
        return nsteps * dt_ps / 1000.0 / wall * 86400.0
