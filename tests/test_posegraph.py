"""Pose graph: SE(3) math, keyframe policy, loop closure, GN optimization."""

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import posegraph
from voxelhashing_tpu.config import CameraConfig, FilterConfig
from voxelhashing_tpu.io.synthetic import Scene, render_depth
from voxelhashing_tpu.ops.image import preprocess

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
SCENE = Scene()
FLT = FilterConfig(depth_filter=False)


def rot(axis, a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    if axis == "y":
        m[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    else:
        m[:3, :3] = [[1, 0, 0], [0, c, -s], [0, s, c]]
    return m


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray([0.02, -0.01, 0.03, 0.1, -0.2, 0.05])
        t = posegraph.se3_exp(xi)
        back = posegraph.se3_log_residual(np.asarray(t))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   atol=2e-3)

    def test_exp_identity(self):
        np.testing.assert_allclose(
            np.asarray(posegraph.se3_exp(jnp.zeros(6))), np.eye(4),
            atol=1e-6)


class TestKeyframePolicy:
    def test_interval_and_motion_triggers(self):
        pg = posegraph.PoseGraph(CAM, posegraph.PoseGraphConfig(
            keyframe_every=5, keyframe_dist=0.1, keyframe_angle=0.1))
        d, _ = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
        f = preprocess(jnp.asarray(d), None, CAM, FLT)
        assert pg.should_add_keyframe(0, np.eye(4))
        pg.add_keyframe(0, np.eye(4), f.points, f.normals)
        # small motion, within interval: no
        p = np.eye(4); p[0, 3] = 0.01
        assert not pg.should_add_keyframe(2, p)
        # large motion within interval: yes
        p2 = np.eye(4); p2[0, 3] = 0.2
        assert pg.should_add_keyframe(2, p2)
        # past the interval: yes
        assert pg.should_add_keyframe(6, p)


class TestOptimize:
    def _chain_with_loop(self, drift=0.05):
        """Ground truth: poses around a square loop; odometry edges carry
        accumulated drift, one loop edge carries the truth."""
        gt = [np.eye(4)]
        for k in range(1, 8):
            p = np.eye(4)
            p[0, 3] = [0, 1, 2, 2, 2, 1, 0, 0][k]
            p[2, 3] = [0, 0, 0, 1, 2, 2, 2, 1][k]
            gt.append(p)
        pg = posegraph.PoseGraph(CAM)
        dummy = np.zeros((4, 4, 3), np.float32)
        # corrupted estimates: drift grows along the chain
        est = []
        for k, p in enumerate(gt):
            e = p.copy()
            e[0, 3] += drift * k
            est.append(e)
            pg.keyframes.append(posegraph.Keyframe(
                index=k, pose=e, points=dummy, normals=dummy))
        # odometry edges from TRUE relative motion (as clean ICP would give)
        for k in range(1, 8):
            pg.edges.append(posegraph.Edge(
                i=k - 1, j=k, z_ij=np.linalg.inv(gt[k - 1]) @ gt[k]))
        # loop edge from last to first
        pg.edges.append(posegraph.Edge(
            i=0, j=7, z_ij=np.linalg.inv(gt[0]) @ gt[7], is_loop=True))
        return pg, gt, est

    def test_gn_removes_drift(self):
        pg, gt, est = self._chain_with_loop()
        err_before = max(np.linalg.norm(e[:3, 3] - g[:3, 3])
                         for e, g in zip(est, gt))
        out = pg.optimize()
        # the WHOLE pose must be finite and correct — the original
        # norm-based se3_exp NaN'd every rotation block (non-differentiable
        # at xi=0, exactly where GN linearizes) while translations solved
        # fine, so a translation-only check passed on garbage poses
        assert np.isfinite(out).all()
        err_after = max(np.linalg.norm(out[k] - gt[k])
                        for k in range(len(gt)))
        assert err_before > 0.3
        assert err_after < 0.01, err_after

    def test_corrected_trajectory_propagates(self):
        pg, gt, est = self._chain_with_loop()
        pg.snapshot_originals()
        pg.optimize()
        frame_poses = [e for e in est]    # one frame per keyframe here
        fixed = pg.corrected_trajectory(frame_poses)
        err = max(np.linalg.norm(np.asarray(f)[:3, 3] - g[:3, 3])
                  for f, g in zip(fixed, gt))
        assert err < 0.01, err


class TestLoopClosure:
    def test_icp_verified_loop_on_synthetic(self):
        pg = posegraph.PoseGraph(CAM, posegraph.PoseGraphConfig(
            loop_min_separation=1, loop_max_dist=0.6, loop_max_angle=0.8,
            loop_residual_max=1e-3))
        # three keyframes: kf2 returns near kf0's viewpoint
        poses = [np.eye(4), rot("y", 0.3), np.eye(4)]
        poses[2][0, 3] = 0.04     # small true offset from kf0
        for k, p in enumerate(poses):
            d, _ = render_depth(p.astype(np.float32), CAM, SCENE)
            f = preprocess(jnp.asarray(np.nan_to_num(d, nan=0.0) * 0 + d),
                           None, CAM, FLT)
            # feed the graph a slightly WRONG pose for kf2 (drift)
            est = p.copy()
            if k == 2:
                est[0, 3] += 0.03
            pg.add_keyframe(k * 5, est, f.points, f.normals)
        loops = [e for e in pg.edges if e.is_loop]
        assert len(loops) >= 1
        # the loop edge should measure the TRUE relative pose (~0.04 x)
        z = loops[0].z_ij
        np.testing.assert_allclose(z[0, 3], 0.04, atol=0.012)


class TestRelocalize:
    def _kf_frame(self, pose):
        d, _ = render_depth(pose.astype(np.float32), CAM, SCENE)
        f = preprocess(jnp.asarray(np.nan_to_num(d, nan=0.0)), None,
                       CAM, FLT)
        return f.points, f.normals

    def test_relocalize_after_blind_motion(self):
        """Camera moves while tracking is lost; relocalization against the
        keyframe graph must recover the true pose even though the stale
        last_pose is far off (the reference has no recovery path —
        DepthSensing.cpp:874-879 just skips frames)."""
        pg = posegraph.PoseGraph(CAM, posegraph.PoseGraphConfig(
            loop_min_separation=100,     # no loop edges for this test
            loop_residual_max=1e-3))
        kf_poses = [np.eye(4), rot("y", 0.2), rot("y", 0.4)]
        for k, p in enumerate(kf_poses):
            pts, nrm = self._kf_frame(p)
            pg.add_keyframe(k * 5, p, pts, nrm)

        # true current pose: near keyframe 1 with a small offset
        true = rot("y", 0.22)
        true[0, 3] += 0.03
        pts, nrm = self._kf_frame(true)
        # stale pose from before the blind motion: near keyframe 0
        stale = np.eye(4)
        rp, ok = pg.relocalize(pts, nrm, last_pose=stale)
        assert ok
        d = np.linalg.inv(rp) @ true
        ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
        assert np.linalg.norm(d[:3, 3]) < 0.01, d[:3, 3]
        assert ang < 0.01, ang

    def test_relocalize_rejects_unseen_view(self):
        pg = posegraph.PoseGraph(CAM, posegraph.PoseGraphConfig(
            loop_residual_max=1e-5))
        pts, nrm = self._kf_frame(np.eye(4))
        pg.add_keyframe(0, np.eye(4), pts, nrm)
        # frame looking the opposite way: nothing to register against
        away = rot("y", 3.0)
        pts2, nrm2 = self._kf_frame(away)
        _, ok = pg.relocalize(pts2, nrm2, last_pose=np.eye(4))
        assert not ok


class TestDistributedOptimize:
    def test_edge_sharded_gn_matches_single_device(self):
        """optimize_distributed: edge-sharded psum'd normal equations on
        the 8-virtual-device mesh must remove the drift exactly like the
        single-device solver."""
        import jax
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs a multi-device mesh")
        mk = TestOptimize()._chain_with_loop
        pg1, gt, _ = mk()
        ref = pg1.optimize()
        pg2, _, _ = mk()
        out = pg2.optimize_distributed()
        assert np.isfinite(out).all()
        err_gt = max(np.linalg.norm(out[k] - gt[k]) for k in range(len(gt)))
        err_ref = max(np.linalg.norm(out[k] - ref[k])
                      for k in range(len(gt)))
        assert err_gt < 0.01, err_gt
        assert err_ref < 1e-4, err_ref


class TestReintegrate:
    def test_reintegrate_matches_direct_gt_map(self):
        """Trajectory-consistent re-integration (the capability loop
        closure exists to enable): rebuilding a map from stored frames
        under CORRECTED poses must equal integrating directly under those
        poses — and differ from the drifted map."""
        from voxelhashing_tpu import blockmap, integrate
        from voxelhashing_tpu.config import MapConfig
        from voxelhashing_tpu.io.synthetic import make_trajectory

        mcfg = MapConfig(voxel_size=0.02, truncation=0.06,
                         truncation_scale=0.01, num_blocks=8192,
                         table_size=32768, max_active_blocks=8192)
        gt = [np.asarray(p) for p in make_trajectory(4)]
        drift = [p.copy() for p in gt]
        for i, p in enumerate(drift):      # accumulating drift
            p[0, 3] += 0.01 * i
        frames = [render_depth(p, CAM, SCENE) for p in gt]

        def make_state():
            return blockmap.create(mcfg)

        def integrate_fn(state, d, c, pose):
            d = jnp.asarray(np.nan_to_num(d, nan=0.0))
            c = jnp.asarray(c)
            pose = jnp.asarray(pose, jnp.float32)
            state, _ = integrate.allocate_from_depth(state, d, pose, CAM,
                                                     mcfg)
            return integrate.integrate(state, d, c, pose, CAM, mcfg)

        def build(poses):
            s = make_state()
            for (d, c), p in zip(frames, poses):
                s = integrate_fn(s, d, c, p)
            return s

        direct = build(gt)
        rebuilt = posegraph.reintegrate(frames, gt, None, make_state,
                                        integrate_fn)
        k_direct = np.sort(np.asarray(direct.block_key))
        k_re = np.sort(np.asarray(rebuilt.block_key))
        np.testing.assert_array_equal(k_direct, k_re)
        # payloads identical up to pool-row permutation: compare by key
        def rows_by_key(s):
            from voxelhashing_tpu.geometry import INVALID_KEY
            keys = np.asarray(s.block_key)
            ok = keys != INVALID_KEY
            order = np.argsort(keys[ok])
            return (keys[ok][order],
                    np.asarray(s.sdf, np.float32)[ok][order],
                    np.asarray(s.weight, np.float32)[ok][order])
        ka, sa, wa = rows_by_key(direct)
        kb, sb, wb = rows_by_key(rebuilt)
        np.testing.assert_array_equal(ka, kb)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(wa, wb)
        # and the drifted map differs (the correction mattered)
        drifted = build(drift)
        kd = np.sort(np.asarray(drifted.block_key))
        assert not np.array_equal(k_direct, kd)
