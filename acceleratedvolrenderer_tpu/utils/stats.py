"""Render statistics — counters, distributions, reporting.

Reference: src/pbrt/util/stats.h (STAT_COUNTER :88, STAT_PERCENT,
STAT_INT_DISTRIBUTION, STAT_PIXEL_COUNTER :150; thread-local accumulation,
printed with --stats; per-pixel stat images via --pixelstats).

TPU-native: counters are named on-device int64 accumulators carried as a
dict-of-arrays pytree next to the film; "thread-local accumulation + merge"
becomes masked `jnp.sum` per wave + scalar adds (and a psum under
shard_map).  Per-pixel counters are (H, W) int32 planes written as EXR via
falsecolor.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np


class StatsAccumulator:
    """Host-side registry; device code returns per-wave dicts of scalars or
    (H, W) planes which are accumulated here."""

    def __init__(self):
        self.counters: Dict[str, int] = defaultdict(int)
        self.distributions: Dict[str, list] = defaultdict(list)
        self.pixel_planes: Dict[str, np.ndarray] = {}
        self.ratios: Dict[str, list] = defaultdict(lambda: [0, 0])

    def count(self, name: str, n):
        self.counters[name] += int(n)

    def percent(self, name: str, num, denom):
        r = self.ratios[name]
        r[0] += int(num)
        r[1] += int(denom)

    def distribution(self, name: str, values):
        self.distributions[name].append(np.asarray(values))

    def pixel_counter(self, name: str, plane):
        plane = np.asarray(plane)
        if name in self.pixel_planes:
            self.pixel_planes[name] = self.pixel_planes[name] + plane
        else:
            self.pixel_planes[name] = plane.copy()

    def report(self) -> str:
        """Formatted like pbrt's --stats output (category/name columns)."""
        lines = ["Statistics:"]
        by_cat = defaultdict(list)
        for name, v in sorted(self.counters.items()):
            cat, _, label = name.partition("/")
            by_cat[cat].append(f"    {label:<42} {v:>16,d}")
        for name, (num, den) in sorted(self.ratios.items()):
            cat, _, label = name.partition("/")
            pct = 100.0 * num / den if den else 0.0
            by_cat[cat].append(
                f"    {label:<42} {num:>12,d} / {den:,d} ({pct:.2f}%)")
        for name, chunks in sorted(self.distributions.items()):
            cat, _, label = name.partition("/")
            v = np.concatenate([c.reshape(-1) for c in chunks])
            by_cat[cat].append(
                f"    {label:<42} avg {v.mean():.3f} "
                f"(min {v.min():.3g}, max {v.max():.3g})")
        for cat in sorted(by_cat):
            lines.append(f"  {cat}")
            lines.extend(by_cat[cat])
        return "\n".join(lines)

    def write_pixel_stats(self, prefix: str):
        from . import image

        for name, plane in self.pixel_planes.items():
            safe = name.replace("/", "_").replace(" ", "_")
            image.write_exr(f"{prefix}_{safe}.exr",
                            plane.astype(np.float32), channel_names=("Y",))


GLOBAL_STATS = StatsAccumulator()
