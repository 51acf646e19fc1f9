"""Diagnostics: timing log, hash histogram, confidence heuristics."""

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, diagnostics, integrate
from voxelhashing_tpu.config import CameraConfig, MapConfig
from voxelhashing_tpu.io.synthetic import Scene, render_depth

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
CFG = MapConfig(voxel_size=0.02, num_blocks=4096, table_size=16384,
                max_active_blocks=4096)


class TestTimingLog:
    def test_stage_and_frame_stats(self):
        log = diagnostics.TimingLog(window=4)
        for _ in range(6):
            log.frame_start()
            log.start("integrate")
            log.stop("integrate")
            log.frame_stop()
        assert log.stage_count["integrate"] == 6
        b = log.benchmark()
        assert b["frames"] == 4            # windowed
        assert b["fps"] > 0
        assert "integrate" in log.report()


class TestHashHistogram:
    def test_consistent_after_fusion(self):
        depth, _ = render_depth(np.eye(4, dtype=np.float32), CAM,
                                Scene(wall_z=2.0, floor_y=None, spheres=()))
        state = blockmap.create(CFG)
        state, _ = integrate.allocate_from_depth(
            state, jnp.asarray(depth), jnp.eye(4), CAM, CFG)
        h = diagnostics.hash_histogram(state, CFG)
        assert h["consistent"]
        assert h["allocated_blocks"] > 0
        assert h["probe_histogram"].sum() == h["allocated_blocks"]
        # with a 4x oversized table most chains resolve at probe 0
        assert h["probe_histogram"][0] > 0.8 * h["allocated_blocks"]

    def test_empty_map(self):
        state = blockmap.create(CFG)
        h = diagnostics.hash_histogram(state, CFG)
        assert h["consistent"] and h["allocated_blocks"] == 0


class TestConfidence:
    def test_lost_heuristics(self):
        c = diagnostics.LinearSystemConfidence(condition=200.0)
        assert c.is_tracking_lost()
        c = diagnostics.LinearSystemConfidence(sum_residual=3000.0)
        assert c.is_tracking_lost()
        c = diagnostics.LinearSystemConfidence(
            condition=50.0, sum_residual=1.0, num_corr=1000)
        assert not c.is_tracking_lost()

    def test_error_log(self):
        log = diagnostics.ICPErrorLog()
        log.new_frame()
        log.record(diagnostics.LinearSystemConfidence(num_corr=5))
        assert log.last().num_corr == 5

    def test_convergence_save(self, tmp_path):
        ca = diagnostics.ConvergenceAnalysis()
        ca.new_curve()
        ca.record(1.0)
        ca.record(0.5)
        p = str(tmp_path / "conv.tsv")
        ca.save(p)
        assert "5.000000e-01" in open(p).read()


class TestMemoryReport:
    def test_sizes(self):
        state = blockmap.create(CFG)
        m = diagnostics.memory_report(state, CFG)
        assert m["pool_mb"] > 0 and m["blocks_capacity"] == CFG.num_blocks
