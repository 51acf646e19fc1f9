"""Diagnostics: per-stage timing, hash histograms, tracking confidence.

The analog of the reference's cross-cutting instrumentation
(/root/reference/DepthSensingCUDA/Source/TimingLog.h:21-77,
CUDAHistogramHashSDF.h:17-90, ICPErrorLog.h:16-58).
"""

from __future__ import annotations

import dataclasses
import math
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import MapConfig
from . import blockmap
from .blockmap import MapState, TOMBSTONE, _probe_slot
from .geometry import INVALID_KEY


class TimingLog:
    """Per-stage wall-clock accumulators + windowed whole-frame stats.

    Mirrors TimingLog's static accumulators and the 128-sample benchmark
    window (TimingLog.h:6,21-77). ``sync`` forces device completion before
    reading the clock (the reference brackets stages with
    cudaDeviceSynchronize, CUDASceneRepHashSDF.h:248-278).
    """

    def __init__(self, window: int = 128):
        self.window = window
        self.stage_total: Dict[str, float] = defaultdict(float)
        self.stage_count: Dict[str, int] = defaultdict(int)
        self.frame_times: List[float] = []
        self._t0: Dict[str, float] = {}
        self._frame_t0: Optional[float] = None

    def start(self, stage: str):
        self._t0[stage] = time.perf_counter()

    def stop(self, stage: str, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0.pop(stage)
        self.stage_total[stage] += dt
        self.stage_count[stage] += 1
        return dt

    def frame_start(self):
        self._frame_t0 = time.perf_counter()

    def frame_stop(self):
        dt = time.perf_counter() - self._frame_t0
        self.frame_times.append(dt)
        if len(self.frame_times) > self.window:
            self.frame_times.pop(0)
        return dt

    def averages(self) -> Dict[str, float]:
        """Per-stage mean seconds (printed each frame when verbose,
        TimingLog.h:21-47)."""
        return {k: self.stage_total[k] / max(self.stage_count[k], 1)
                for k in self.stage_total}

    def benchmark(self) -> Dict[str, float]:
        """Windowed whole-frame stats (TimingLog.h:48-76)."""
        if not self.frame_times:
            return {}
        a = np.asarray(self.frame_times)
        return {
            "frames": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "min_ms": float(a.min() * 1e3),
            "max_ms": float(a.max() * 1e3),
            "stddev_ms": float(a.std() * 1e3),
            "fps": float(1.0 / a.mean()),
        }

    def report(self) -> str:
        lines = ["stage averages (ms):"]
        for k, v in sorted(self.averages().items()):
            lines.append(f"  {k:24s} {v*1e3:9.2f}")
        b = self.benchmark()
        if b:
            lines.append(
                f"frame window: {b['mean_ms']:.1f} ms avg "
                f"({b['fps']:.2f} fps), min {b['min_ms']:.1f}, "
                f"max {b['max_ms']:.1f}, stddev {b['stddev_ms']:.1f}")
        return "\n".join(lines)


def hash_histogram(state: MapState, cfg: MapConfig) -> Dict[str, np.ndarray]:
    """Probe-chain-length histogram + occupancy (key 'H',
    CUDAHistogramHashSDF.h:26-90: bucket occupancy + list lengths with an
    OK/FAIL consistency checksum; here the open-addressing analogs)."""
    keys = state.block_key
    allocated = keys != INVALID_KEY

    # probe distance of every allocated key (chain length analog)
    found = jnp.zeros(keys.shape, bool)
    dist = jnp.zeros(keys.shape, jnp.int32)
    for r in range(cfg.max_probes):
        slots = _probe_slot(keys, r, cfg.table_size)
        hit = (state.table_key[slots] == keys) & allocated & ~found
        dist = jnp.where(hit, r, dist)
        found |= hit
    bin_idx = jnp.where(allocated,
                        jnp.where(found, dist, cfg.max_probes),
                        cfg.max_probes + 1)      # unallocated -> dropped
    hist = jnp.zeros((cfg.max_probes + 1,), jnp.int32).at[bin_idx].add(
        1, mode="drop")

    tk = state.table_key
    n_used = jnp.sum(((tk != INVALID_KEY) & (tk != TOMBSTONE))
                     .astype(jnp.int32))
    n_alloc = jnp.sum(allocated.astype(jnp.int32))
    n_unreachable = jnp.sum((allocated & ~found).astype(jnp.int32))
    return {
        "probe_histogram": np.asarray(hist),
        "table_used": int(n_used),
        "table_size": cfg.table_size,
        "load_factor": float(n_used) / cfg.table_size,
        "allocated_blocks": int(n_alloc),
        "tombstones": int(state.n_tombstones),
        # the reference prints OK/FAIL on its checksum (:82-88)
        "consistent": bool(n_used == n_alloc) and int(n_unreachable) == 0,
    }


@dataclasses.dataclass
class LinearSystemConfidence:
    """Per-solve confidence record (ICPErrorLog.h:16-58)."""

    sum_residual: float = 0.0
    sum_weight: float = 0.0
    num_corr: int = 0
    condition: float = 0.0
    matrix_condition: float = 0.0
    tracking_lost: bool = False

    def is_tracking_lost(self) -> bool:
        """The reference's aggregate heuristics (ICPErrorLog.h:38-50):
        condition > 150, sum residual > 2000, or relative error > 1.5."""
        if self.condition > 150.0:
            return True
        if self.sum_residual > 2000.0:
            return True
        if self.num_corr > 0 and \
                self.sum_residual / max(self.num_corr, 1) > 1.5:
            return True
        return False


class ICPErrorLog:
    """Per-frame, per-level solve records (ICPErrorLog.h:60-152)."""

    def __init__(self):
        self.frames: List[List[LinearSystemConfidence]] = []

    def new_frame(self):
        self.frames.append([])

    def record(self, conf: LinearSystemConfidence):
        if not self.frames:
            self.new_frame()
        self.frames[-1].append(conf)

    def last(self) -> Optional[LinearSystemConfidence]:
        if self.frames and self.frames[-1]:
            return self.frames[-1][-1]
        return None

    def record_frame_levels(self, level_stats) -> List[LinearSystemConfidence]:
        """Record one frame's device-side per-level stats.

        ``level_stats``: the engine's ``FrameDiagnostics.icp_level_stats``
        ([levels, 4] = mean_residual, condition, corr_count, sum_weight,
        row 0 = finest) — the on-device analog of the per-level
        LinearSystemConfidence the reference fills in
        CUDACameraTrackingMultiRes.cpp:312-319. Coarse-to-fine order is
        preserved in the record list (coarsest first, like the reference's
        per-level logging).
        """
        self.new_frame()
        arr = np.asarray(level_stats, np.float64)
        for res, cond, corr, sum_w in arr[::-1]:      # coarse -> fine
            self.record(LinearSystemConfidence(
                sum_residual=float(res * sum_w),
                sum_weight=float(sum_w),
                num_corr=int(corr),
                condition=float(cond),
                matrix_condition=float(cond)))
        return self.frames[-1]

    def report_last(self) -> str:
        """One line per level for the last frame (printed like the
        reference's per-frame ICP log)."""
        if not self.frames or not self.frames[-1]:
            return "icp: (no records)"
        lines = []
        n = len(self.frames[-1])
        for i, c in enumerate(self.frames[-1]):
            mean = c.sum_residual / max(c.sum_weight, 1e-12)
            lines.append(
                f"  icp L{n - 1 - i}: res={mean:.3e} cond={c.condition:8.2f}"
                f" corr={c.num_corr:6d} lost={c.is_tracking_lost()}")
        return "\n".join(lines)


class ConvergenceAnalysis:
    """Residual-vs-iteration curves (ConvergenceAnalysis.h): record per-
    iteration residuals and dump a plottable table."""

    def __init__(self):
        self.curves: List[List[float]] = []

    def new_curve(self):
        self.curves.append([])

    def record(self, residual: float):
        if not self.curves:
            self.new_curve()
        self.curves[-1].append(residual)

    def record_frame(self, iter_residuals):
        """Record the engine's ``FrameDiagnostics.icp_iter_residuals``
        ([levels, max_iters], NaN-padded) as one curve per level."""
        arr = np.asarray(iter_residuals, np.float64)
        for row in arr[::-1]:                          # coarse -> fine
            self.new_curve()
            for r in row:
                if not math.isnan(r):
                    self.record(float(r))

    def save(self, path: str):
        with open(path, "w") as f:
            f.write("# iteration residual (one curve per column)\n")
            n = max((len(c) for c in self.curves), default=0)
            for i in range(n):
                row = [f"{c[i]:.6e}" if i < len(c) else ""
                       for c in self.curves]
                f.write("\t".join([str(i)] + row) + "\n")


def memory_report(state: MapState, cfg: MapConfig) -> Dict[str, float]:
    """Device-memory accounting (Util.h printMemoryUseMB analog)."""
    def mb(arr):
        return arr.size * arr.dtype.itemsize / 1e6

    return {
        "pool_mb": mb(state.sdf) + mb(state.weight) + mb(state.color),
        "table_mb": mb(state.table_key) + mb(state.table_val),
        "block_keys_mb": mb(state.block_key),
        "voxels_total": state.sdf.size,
        "blocks_capacity": cfg.num_blocks,
    }
