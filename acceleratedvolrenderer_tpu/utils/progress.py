"""Progress reporting with ETA.

Reference: src/pbrt/util/progressreporter.h:46 (ProgressReporter — console
bar, ETA, optional CUDA-event GPU timing).  Here: a plain host-side bar;
device timing comes from block_until_ready intervals (the closest analogue
of CUDA events under XLA's async dispatch).
"""
from __future__ import annotations

import sys
import time


class ProgressReporter:
    def __init__(self, total: int, title: str = "Rendering", quiet: bool = False,
                 stream=None):
        self.total = max(int(total), 1)
        self.title = title
        self.quiet = quiet
        self.stream = stream or sys.stderr
        self.done = 0
        self.t0 = time.time()
        self._last_print = 0.0

    def update(self, n: int = 1):
        self.done += n
        now = time.time()
        if self.quiet or (now - self._last_print < 0.25 and self.done < self.total):
            return
        self._last_print = now
        frac = self.done / self.total
        elapsed = now - self.t0
        eta = elapsed / frac * (1 - frac) if frac > 0 else 0.0
        width = 28
        filled = int(width * frac)
        bar = "+" * filled + "-" * (width - filled)
        self.stream.write(
            f"\r{self.title}: [{bar}] {100 * frac:5.1f}%  "
            f"({elapsed:.1f}s|{eta:.1f}s)"
        )
        self.stream.flush()

    def finish(self):
        self.done = self.total
        if not self.quiet:
            elapsed = time.time() - self.t0
            self.stream.write(
                f"\r{self.title}: done in {elapsed:.1f}s" + " " * 30 + "\n")
            self.stream.flush()

    @property
    def elapsed(self):
        return time.time() - self.t0
