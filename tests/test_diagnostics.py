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


class TestEvaluationMetrics:
    def test_rpe_zero_on_identical(self):
        import numpy as np
        from voxelhashing_tpu import evaluation
        from voxelhashing_tpu.io.synthetic import make_trajectory
        poses = [np.asarray(p) for p in make_trajectory(6)]
        t, r = evaluation.rpe_rmse(poses, poses)
        assert t < 1e-7 and r < 1e-6

    def test_rpe_measures_relative_offset(self):
        """A constant per-step translation slip of d shows up as RPE
        trans ~= d; a global offset does NOT (relative metric)."""
        import numpy as np
        from voxelhashing_tpu import evaluation
        gt = []
        for i in range(6):
            p = np.eye(4)
            p[0, 3] = 0.1 * i
            gt.append(p)
        est = [p.copy() for p in gt]
        for i, p in enumerate(est):
            p[0, 3] += 0.002 * i          # accumulating slip: 2 mm/frame
        t, r = evaluation.rpe_rmse(est, gt)
        assert abs(t - 0.002) < 1e-9
        assert r < 1e-6
        # global offset: ATE sees it (unaligned), RPE does not
        off = [p.copy() for p in gt]
        for p in off:
            p[1, 3] += 0.5
        t2, _ = evaluation.rpe_rmse(off, gt)
        assert t2 < 1e-9
        assert evaluation.ate_rmse(off, gt, align=False) > 0.4

    def test_erode_depth_kills_outliers_keeps_interior(self):
        import numpy as np
        import jax.numpy as jnp
        from voxelhashing_tpu.ops.image import erode_depth
        d = np.full((20, 20), 2.0, np.float32)
        d[10, 10] = 3.0                   # isolated depth outlier
        out = np.asarray(erode_depth(jnp.asarray(d)))
        assert not np.isfinite(out[10, 10])        # outlier invalidated
        assert np.isfinite(out[5, 5])              # smooth interior kept
        # pixels at an invalid border die too (frac_req violated)
        d2 = np.full((20, 20), 2.0, np.float32)
        d2[:, 10:] = np.nan
        out2 = np.asarray(erode_depth(jnp.asarray(d2)))
        assert not np.isfinite(out2[5, 10])
        assert np.isfinite(out2[5, 2])
