"""End-to-end engine tests: free tracking over a synthetic sequence."""

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import engine, evaluation
from voxelhashing_tpu.config import (CameraConfig, EngineConfig, FilterConfig,
                                     MapConfig, RaycastConfig, TrackerConfig)
from voxelhashing_tpu.io.synthetic import Scene, make_trajectory, render_depth

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
CFG = EngineConfig(
    camera=CAM,
    map=MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                  num_blocks=16384, table_size=65536,
                  max_active_blocks=16384, world_blocks=1024,
                  gc_starve_interval=8),
    tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                          max_inner_iter=(1, 1),
                          dist_thres=(0.15, 0.15), normal_thres=(0.9, 0.9),
                          angle_trans_thres=(1.0, 1.0),
                          dist_trans_thres=(1.0, 1.0),
                          residual_early_out=(1e-9, 1e-9)),
    raycast=RaycastConfig(),
    filter=FilterConfig(depth_filter=False),
)
SCENE = Scene()


def run_sequence(n_frames, cfg=CFG, use_hint=False):
    poses = make_trajectory(n_frames)
    step = engine.make_step(cfg, with_hint=use_hint, donate=False)
    state = engine.create(cfg, initial_pose=poses[0])
    est, diags = [], []
    for i, pose_np in enumerate(poses):
        depth, color = render_depth(pose_np, CAM, SCENE)
        args = (state, jnp.asarray(depth), jnp.asarray(color))
        if use_hint:
            args += (jnp.asarray(pose_np),)
        state, diag = step(*args)
        est.append(np.asarray(state.pose))
        diags.append(diag)
    return state, est, poses, diags


class TestEngineFreeTracking:
    def test_short_sequence_tracks(self):
        state, est, gt, diags = run_sequence(8)
        assert all(bool(d.tracking_valid) for d in diags)
        ate = evaluation.ate_rmse(est, gt, align=False)
        assert ate < 0.01, ate       # < 1cm on an easy synthetic sequence
        assert int(state.n_integrated) == 8
        assert int(diags[-1].n_allocated_blocks) > 100

    def test_map_grows_then_stabilises(self):
        _, _, _, diags = run_sequence(6)
        n = [int(d.n_allocated_blocks) for d in diags]
        assert n[0] > 0
        assert n[-1] >= n[0]
        # small camera motion: later frames mostly re-observe the same blocks
        assert n[-1] < 3 * n[0]

    def test_trajectory_hint_mode(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, use_trajectory=True)
        state, est, gt, diags = run_sequence(5, cfg=cfg, use_hint=True)
        for e, g in zip(est, gt):
            np.testing.assert_allclose(e, g, atol=1e-6)

    def test_all_invalid_frame_does_not_corrupt(self):
        step = engine.make_step(CFG, donate=False)
        state = engine.create(CFG)
        depth0, color0 = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
        state, d0 = step(state, jnp.asarray(depth0), jnp.asarray(color0))
        nan_depth = jnp.full((CAM.height, CAM.width), jnp.nan)
        state, d1 = step(state, nan_depth, jnp.zeros((CAM.height, CAM.width, 3)))
        # tracking must be flagged lost; pose unchanged; map not corrupted
        assert not bool(d1.tracking_valid)
        from voxelhashing_tpu import blockmap
        viol = blockmap.check_invariants(state.map, CFG.map)
        assert all(v == 0 for v in viol.values()), viol
