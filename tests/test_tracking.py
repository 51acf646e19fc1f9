"""Projective-ICP tracking: pose recovery on synthetic scenes."""

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, geometry as geom, integrate, raycast, tracking
from voxelhashing_tpu.config import (CameraConfig, MapConfig, RaycastConfig,
                                     TrackerConfig, FilterConfig)
from voxelhashing_tpu.io.synthetic import Scene, render_depth
from voxelhashing_tpu.ops.image import preprocess

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=16384, table_size=65536,
                max_active_blocks=16384, world_blocks=1024)
RC = RaycastConfig()
TK = TrackerConfig(levels=2, max_outer_iter=(8, 6), max_inner_iter=(1, 1),
                   dist_thres=(0.15, 0.15), normal_thres=(0.9, 0.9),
                   angle_trans_thres=(1.0, 1.0), dist_trans_thres=(1.0, 1.0),
                   residual_early_out=(1e-8, 1e-8))
FLT = FilterConfig(depth_filter=False)
SCENE = Scene()   # wall + floor + two spheres: constrains all 6 DoF


def build_model():
    """Fuse the scene at identity and raycast the model frame."""
    state = blockmap.create(CFG)
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
    depth, color = jnp.asarray(depth), jnp.asarray(color)
    pose = jnp.eye(4)
    state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
    for _ in range(3):
        state = integrate.integrate(state, depth, color, pose, CAM, CFG)
    view = geom.invert_rigid(pose)
    active_idx, n_active, _ = blockmap.compactify(state, view, CAM, CFG)
    mask = jnp.arange(active_idx.shape[0]) < n_active
    model = raycast.render(state, pose, CAM, CFG, RC,
                           active_idx=active_idx, active_mask=mask)
    return state, model


def offset_pose(tx=0.0, ty=0.0, tz=0.0, ry=0.0, rx=0.0):
    pose = np.eye(4, dtype=np.float32)
    cy_, sy_ = np.cos(ry), np.sin(ry)
    cx_, sx_ = np.cos(rx), np.sin(rx)
    roty = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]], np.float32)
    rotx = np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]], np.float32)
    pose[:3, :3] = roty @ rotx
    pose[:3, 3] = [tx, ty, tz]
    return pose


def input_frame(pose_np):
    depth, color = render_depth(pose_np, CAM, SCENE)
    return preprocess(jnp.asarray(depth), jnp.asarray(color), CAM, FLT)


def pose_error(a, b):
    d = np.linalg.inv(np.asarray(a)) @ np.asarray(b)
    trans = np.linalg.norm(d[:3, 3])
    ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    return trans, ang


class TestTrack:
    def _recover(self, gt_pose_np):
        _, model = build_model()
        frame = input_frame(gt_pose_np)
        res = tracking.track(frame.points, frame.normals,
                             model.points, model.normals,
                             jnp.eye(4), CAM, TK)
        return res

    def test_identity_stays_identity(self):
        res = self._recover(np.eye(4, dtype=np.float32))
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, np.eye(4))
        assert trans < 3e-3 and ang < 3e-3, (trans, ang)

    def test_translation_recovered(self):
        gt = offset_pose(tx=0.01, ty=-0.008, tz=0.012)
        res = self._recover(gt)
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, gt)
        assert trans < 6e-3, trans
        assert ang < 6e-3, ang

    def test_rotation_recovered(self):
        gt = offset_pose(ry=0.01, rx=-0.007)
        res = self._recover(gt)
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, gt)
        assert trans < 6e-3, trans
        assert ang < 6e-3, ang

    def test_full_motion_recovered(self):
        gt = offset_pose(tx=0.01, ty=0.005, tz=-0.01, ry=0.008, rx=0.006)
        res = self._recover(gt)
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, gt)
        assert trans < 6e-3, trans
        assert ang < 6e-3, ang

    def test_seeds_from_last_pose(self):
        # same delta, but tracked relative to a non-identity last pose
        last_np = offset_pose(tx=0.3, ry=0.2)
        gt_delta = offset_pose(tx=0.01, tz=-0.008)
        # model in last-pose camera frame; input = model scene seen from
        # last_pose @ delta
        state = blockmap.create(CFG)
        depth, color = render_depth(last_np, CAM, SCENE)
        pose = jnp.asarray(last_np)
        state, _ = integrate.allocate_from_depth(
            state, jnp.asarray(depth), pose, CAM, CFG)
        for _ in range(3):
            state = integrate.integrate(state, jnp.asarray(depth),
                                        jnp.asarray(color), pose, CAM, CFG)
        view = geom.invert_rigid(pose)
        active_idx, n_active, _ = blockmap.compactify(state, view, CAM, CFG)
        mask = jnp.arange(active_idx.shape[0]) < n_active
        model = raycast.render(state, pose, CAM, CFG, RC,
                               active_idx=active_idx, active_mask=mask)
        gt_pose = last_np @ gt_delta
        frame = input_frame(gt_pose)
        res = tracking.track(frame.points, frame.normals,
                             model.points, model.normals,
                             pose, CAM, TK)
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, gt_pose)
        assert trans < 6e-3, trans

    def test_lost_on_empty_model(self):
        frame = input_frame(np.eye(4, dtype=np.float32))
        nanmap = jnp.full_like(frame.points, jnp.nan)
        res = tracking.track(frame.points, frame.normals, nanmap, nanmap,
                             jnp.eye(4), CAM, TK)
        assert not bool(res.valid)
        # lost keeps the last pose
        np.testing.assert_array_equal(np.asarray(res.pose), np.eye(4))


class TestRGBDTracking:
    def test_joint_depth_intensity_recovers_pose(self):
        from voxelhashing_tpu.ops.image import color_to_intensity
        gt = offset_pose(tx=0.01, ty=0.005, rx=0.006)
        state, model = build_model()
        model_int = color_to_intensity(model.color)
        frame = input_frame(gt)
        res = tracking.track(frame.points, frame.normals,
                             model.points, model.normals,
                             jnp.eye(4), CAM, TK,
                             input_intensity=frame.intensity,
                             model_intensity=model_int,
                             weight_color=0.05)
        assert bool(res.valid)
        trans, ang = pose_error(res.pose, gt)
        # splat-model colors are noisiest exactly at the texture boundaries
        # the photometric term keys on; allow slightly looser than depth-only
        assert trans < 7e-3, trans
        assert ang < 7e-3, ang

    def test_textured_wall_degenerate_depth_tracked_by_rgbd(self):
        # A bare wall is rank-deficient for point-to-plane ICP (3 free
        # DoF: in-plane translation + in-plane rotation) — depth-only must
        # flag lost. A TEXTURED wall constrains those DoF photometrically:
        # the joint system (the reference's RGBD variant) must track a
        # pure in-plane shift that depth cannot see at all.
        h, w = CAM.height, CAM.width
        z = 2.0
        u = (np.arange(w, dtype=np.float32) - CAM.cx) / CAM.fx * z
        v = (np.arange(h, dtype=np.float32) - CAM.cy) / CAM.fy * z
        xw = np.broadcast_to(u[None, :], (h, w))
        yw = np.broadcast_to(v[:, None], (h, w))

        def plane_maps(tx):
            # camera at (tx, 0, 0) looking at the z=2 wall: camera-space
            # depth is unchanged; only the texture shifts
            pts = np.stack([xw, yw, np.full((h, w), z, np.float32)], -1)
            nrm = np.broadcast_to(
                np.array([0.0, 0.0, -1.0], np.float32), (h, w, 3))
            inten = (0.5 + 0.25 * np.sin(4.0 * (xw + tx))
                     + 0.25 * np.cos(5.0 * (yw)))
            return (jnp.asarray(pts), jnp.asarray(nrm),
                    jnp.asarray(inten.astype(np.float32)))

        m_pts, m_nrm, m_int = plane_maps(0.0)
        tx = 0.01
        i_pts, i_nrm, i_int = plane_maps(tx)

        # depth-only: degenerate -> lost
        res_d = tracking.track(i_pts, i_nrm, m_pts, m_nrm,
                               jnp.eye(4), CAM, TK)
        assert not bool(res_d.valid)

        # joint RGB-D: recovers the in-plane shift
        res = tracking.track(i_pts, i_nrm, m_pts, m_nrm,
                             jnp.eye(4), CAM, TK,
                             input_intensity=i_int, model_intensity=m_int,
                             weight_depth=1.0, weight_color=1.0,
                             color_sigma=0.5)
        assert bool(res.valid)
        gt = offset_pose(tx=tx)
        trans, ang = pose_error(res.pose, gt)
        assert trans < 2.5e-3, trans
        assert ang < 2.5e-3, ang

    def test_intensity_gradients(self):
        img = jnp.asarray(np.tile(np.arange(8, dtype=np.float32), (6, 1)))
        gx, gy = tracking.intensity_gradients(img)
        np.testing.assert_allclose(np.asarray(gx[:, 1:-1]), 1.0)
        np.testing.assert_allclose(np.asarray(gy[1:-1, :]), 0.0)


def test_linearize_finite_with_nan_inputs_eager():
    """Invalid input pixels carry NaN positions; the normal equations must
    be finite WITHOUT relying on XLA's jit-time simplifier folding the
    masked NaN*0 products (eager/interpret paths execute IEEE semantics:
    NaN*0 = NaN — regression for the latent all-NaN-system bug)."""
    import numpy as np
    import jax.numpy as jnp
    from voxelhashing_tpu import tracking
    from voxelhashing_tpu.config import CameraConfig

    cam = CameraConfig(width=32, height=24, fx=26.0, fy=26.0,
                       cx=15.5, cy=11.5, depth_min=0.2, depth_max=4.0)
    h, w = cam.height, cam.width
    pts = np.zeros((h, w, 3), np.float32)
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    pts[..., 0] = (u - cam.cx) / cam.fx * 1.5
    pts[..., 1] = (v - cam.cy) / cam.fy * 1.5
    pts[..., 2] = 1.5
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 2] = 1.0
    pts_in = pts.copy()
    pts_in[0:6, :, :] = np.nan          # dropout band (invalid pixels)
    nrm_in = nrm.copy()
    nrm_in[0:6, :, :] = np.nan

    delta = jnp.eye(4)
    in_soa = (tracking._soa(jnp.asarray(pts_in))
              + tracking._soa(jnp.asarray(nrm_in)))
    md8 = tracking._interleave_target(jnp.asarray(pts), jnp.asarray(nrm))
    q, nq, wgt, ok = tracking._associate(delta, in_soa, md8, cam,
                                         0.15, 0.9, cam.depth_min,
                                         cam.depth_max)
    mean, inv_std = tracking._whitening(q, ok, lambda t: t)
    a, b, sr, sw, cnt = tracking._linearize(delta, in_soa, q, nq, wgt, ok,
                                            mean, inv_std)
    assert int(cnt) > 100
    assert bool(jnp.all(jnp.isfinite(a))), np.asarray(a)
    assert bool(jnp.all(jnp.isfinite(b)))
