"""Tracking stress suite: hard synthetic scenarios (VERDICT r1 item 2).

The reference validates tracking only by replaying real sensor dumps; with
no datasets in this environment, these scenarios reproduce the failure
modes real sequences contain:

* occlusion-heavy clutter with realistic Kinect-style noise (disparity
  quantisation + edge dropout),
* 5x faster camera motion,
* textureless-wall degeneracy, where tracking MUST be declared lost
  (condition-number gate), the frame skipped without integration, and
  tracking recover once structure reappears,
* record -> .sens -> replay determinism.

ATE numbers from this suite are published in BASELINE.md.
"""

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import engine, evaluation
from voxelhashing_tpu.config import (CameraConfig, EngineConfig, FilterConfig,
                                     MapConfig, TrackerConfig)
from voxelhashing_tpu.io.synthetic import (Scene, clutter_scene,
                                           kinect_noise, make_trajectory,
                                           render_depth, wall_only_scene)

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
CFG = EngineConfig(
    camera=CAM,
    map=MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                  num_blocks=16384, table_size=65536,
                  max_active_blocks=16384, world_blocks=1024),
    tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                          max_inner_iter=(1, 1),
                          dist_thres=(0.15, 0.15), normal_thres=(0.9, 0.9),
                          angle_trans_thres=(1.0, 1.0),
                          dist_trans_thres=(1.0, 1.0),
                          residual_early_out=(1e-9, 1e-9)),
    filter=FilterConfig(depth_filter=True),   # bilateral on: noisy input
)


def run_frames(frames, cfg=CFG, init_pose=None):
    """Run depth/color frames through the engine; returns (est, diags)."""
    step = engine.make_step(cfg, donate=False)
    state = engine.create(cfg, initial_pose=init_pose)
    est, diags = [], []
    for d, c in frames:
        state, diag = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                           jnp.asarray(c))
        est.append(np.asarray(state.pose))
        diags.append(diag)
    return est, diags, state


def render_seq(scene, poses, noisy=False):
    frames = []
    for i, p in enumerate(poses):
        d, c = render_depth(p, CAM, scene)
        if noisy:
            d = kinect_noise(d, CAM, seed=i)
        frames.append((d, c))
    return frames


# ATE bounds = 1.5x the max of the measured round-4/round-5 values per
# scenario (BASELINE.md stress table; r3<->r4 showed legitimate
# allocation-order shifts of up to 1.8x, so the envelope spans both) —
# the next shift that doubles a scenario's ATE fails loudly instead of
# hiding under a loose 20 mm blanket. Regenerate the measured column with
# scripts/measure_stress_ate.py when a legitimate change moves the floor.
import pytest


class TestClutterOcclusion:
    @pytest.mark.parametrize("noisy,bound_m", [
        (True, 0.0036),    # measured 2.4 mm (r4) / 2.1 (r5)
        (False, 0.0056),   # measured 3.7 mm (r4) / 2.1 (r5)
    ])
    def test_clutter_occlusion(self, noisy, bound_m):
        """Occlusion-heavy scene, exact and Kinect-noise variants."""
        poses = make_trajectory(10)
        frames = render_seq(clutter_scene(), poses, noisy=noisy)
        est, diags, _ = run_frames(frames, init_pose=poses[0])
        assert all(bool(d.tracking_valid) for d in diags)
        ate = evaluation.ate_rmse(est, poses, align=False)
        assert ate < bound_m, f"ATE {ate*1000:.1f} mm (bound {bound_m*1e3})"

    @pytest.mark.parametrize("noisy,bound_m", [
        (False, 0.0068),   # measured 4.5 mm (r4) / 3.9 (r5)
        (True, 0.0081),    # measured 5.1 mm (r4) / 5.4 (r5)
    ])
    def test_fast_motion(self, noisy, bound_m):
        """5x faster handheld motion (~4 cm + ~1.1 deg per frame)."""
        poses = make_trajectory(8, translation_step=0.04,
                                rotation_step=0.02)
        frames = render_seq(clutter_scene(), poses, noisy=noisy)
        est, diags, _ = run_frames(frames, init_pose=poses[0])
        assert all(bool(d.tracking_valid) for d in diags)
        ate = evaluation.ate_rmse(est, poses, align=False)
        assert ate < bound_m, f"ATE {ate*1000:.1f} mm (bound {bound_m*1e3})"


class TestEasyScene:
    @pytest.mark.parametrize("noisy,bound_m", [
        (False, 0.0098),   # measured 6.5 mm (r4) / 3.7 (r5)
        (True, 0.0185),    # measured 12.3 mm (r4) / 11.2 (r5)
    ])
    def test_easy(self, noisy, bound_m):
        """The default plane+spheres scene, exact and noisy."""
        poses = make_trajectory(10)
        frames = render_seq(Scene(), poses, noisy=noisy)
        est, diags, _ = run_frames(frames, init_pose=poses[0])
        assert all(bool(d.tracking_valid) for d in diags)
        ate = evaluation.ate_rmse(est, poses, align=False)
        assert ate < bound_m, f"ATE {ate*1000:.1f} mm (bound {bound_m*1e3})"


class TestDegeneracyAndRecovery:
    import pytest as _pytest

    @_pytest.mark.parametrize("mode", ["march", "splat"])
    def test_wall_lost_then_recover(self, mode):
        """Panning onto a mapped-but-bare wall leaves 3 DoF unconstrained:
        the lost gates must declare tracking lost, the frames must be
        skipped without integration, and tracking must recover once
        structure re-enters the view — in BOTH render modes.

        In the reference-faithful ``march`` mode the flat wall's model
        normals come out exactly planar -> the 6x6 is truly rank-3 and the
        condition gate fires. In the production ``splat`` mode the
        renderer's surface roughness weakly fakes the missing constraints
        (cond ~1.5e3 < the 2e4 gate) — there the renderer-independent
        normal-anisotropy gate (tracking._planarity) must fire instead.
        GT-init (s_binaryDumpSensorUseTrajectoryOnlyInit) is the mode the
        reference validates degenerate stretches in.
        """
        import dataclasses
        from voxelhashing_tpu.config import RaycastConfig
        from voxelhashing_tpu.io.synthetic import Box, Sphere

        # clutter only on the LEFT; the wall spans everything, so a right
        # pan sees mapped bare wall
        scene = Scene(
            wall_z=2.6, floor_y=None,
            spheres=(Sphere(center=(-0.5, 0.2, 2.0), radius=0.3),
                     Sphere(center=(-0.9, -0.2, 2.2), radius=0.25,
                            color=(0.2, 0.5, 0.8))),
            boxes=(Box(lo=(-0.7, -0.1, 1.3), hi=(-0.4, 0.4, 1.6)),
                   Box(lo=(-1.1, 0.3, 1.7), hi=(-0.7, 0.7, 2.0),
                       color=(0.4, 0.3, 0.6))))

        def roty(a):
            c, s = np.cos(a), np.sin(a)
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

        poses = []
        for i in range(12):
            p = np.eye(4, dtype=np.float32)
            p[:3, :3] = roty(0.55) if 4 <= i < 8 \
                else roty(-0.15 + 0.004 * i)
            p[0, 3] = 0.005 * i
            poses.append(p)

        cfg = dataclasses.replace(CFG, use_trajectory_only_init=True,
                                  raycast=RaycastConfig(mode=mode))
        step = engine.make_step(cfg, with_hint=True, donate=False)
        state = engine.create(cfg, initial_pose=poses[0])
        diags = []
        for i, p in enumerate(poses):
            d, c = render_depth(p, CAM, scene)
            state, diag = step(state,
                               jnp.asarray(np.nan_to_num(d, nan=0.0)),
                               jnp.asarray(c), jnp.asarray(p))
            diags.append(diag)

        lost = [not bool(d.tracking_valid) for d in diags]
        # every bare-wall frame fires the lost gate...
        assert all(lost[4:8]), lost
        # ...the clutter frames never do...
        assert not any(lost[:4]) and not any(lost[8:]), lost
        # the planarity observable separates the regimes in BOTH modes
        # (the probe is renderer-independent; frame 0 has no tracking)
        i2 = [float(d.icp_planarity) for d in diags]
        assert all(v < 4e-3 for v in i2[4:8]), i2
        assert all(v > 4e-3 for v in i2[1:4] + i2[8:]), i2
        # ...and lost frames were NOT integrated
        assert int(state.n_integrated) == len(poses) - sum(lost)
        # map is healthy throughout
        from voxelhashing_tpu import blockmap
        viol = blockmap.check_invariants(state.map, CFG.map)
        assert all(v == 0 for v in viol.values()), viol


class TestRecordReplayDeterminism:
    def test_sens_roundtrip_bit_exact(self, tmp_path):
        """record -> .sens -> replay reproduces depth bit-exactly and
        poses to float32 (the reference's regression methodology)."""
        from voxelhashing_tpu.io.sensfile import SensReader, write_sens
        poses = make_trajectory(4)
        frames = render_seq(clutter_scene(), poses, noisy=True)
        depths = np.stack([f[0] for f in frames])
        colors = np.stack([f[1] for f in frames])
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0], intr[1, 1] = CAM.fx, CAM.fy
        intr[0, 2], intr[1, 2] = CAM.cx, CAM.cy
        path = str(tmp_path / "seq.sens")
        write_sens(path, depths, colors, poses, intr)

        r = SensReader(path)
        assert len(r) == 4
        for i in range(4):
            d, c, p = r.read_frame(i)
            d0 = depths[i]
            # invalid pixels encode as 0 in .sens; valid ones round-trip
            # through the mm-quantised u16 depth codec
            valid = np.isfinite(d0)
            np.testing.assert_array_equal(np.isfinite(d) & (d > 0), valid)
            np.testing.assert_allclose(d[valid], d0[valid], atol=5e-4)
            np.testing.assert_allclose(p, poses[i], atol=1e-6)

        # deterministic replay: two engine runs over the reread sequence
        # produce identical trajectories
        reread = [(r.read_frame(i)[0], r.read_frame(i)[2]) for i in range(4)]
        frames2 = [(d, np.zeros((CAM.height, CAM.width, 3), np.float32))
                   for d, _ in reread]
        est_a, _, _ = run_frames(frames2, init_pose=poses[0])
        est_b, _, _ = run_frames(frames2, init_pose=poses[0])
        for a, b in zip(est_a, est_b):
            np.testing.assert_array_equal(a, b)
