"""Raycast surface prediction vs analytic scene ground truth."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, geometry as geom, integrate, raycast
from voxelhashing_tpu.config import CameraConfig, MapConfig, RaycastConfig
from voxelhashing_tpu.io.synthetic import Scene, Sphere, render_depth

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=8192, table_size=32768,
                max_active_blocks=8192, world_blocks=1024)
RC = RaycastConfig()
WALL = Scene(wall_z=2.0, floor_y=None, spheres=())


def fused_map(scene, poses=None, n_repeat=3):
    poses = poses or [np.eye(4, dtype=np.float32)]
    state = blockmap.create(CFG)
    for pose_np in poses:
        depth, color = render_depth(pose_np, CAM, scene)
        depth, color = jnp.asarray(depth), jnp.asarray(color)
        pose = jnp.asarray(pose_np)
        state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
        for _ in range(n_repeat):
            state = integrate.integrate(state, depth, color, pose, CAM, CFG)
    return state


def active_set(state, pose):
    view = geom.invert_rigid(jnp.asarray(pose))
    active_idx, n_active, _ = blockmap.compactify(state, view, CAM, CFG)
    mask = jnp.arange(active_idx.shape[0]) < n_active
    return active_idx, mask


class TestTrilinear:
    def test_sample_on_wall_surface_near_zero(self):
        state = fused_map(WALL)
        pts = jnp.array([[0.0, 0.0, 2.0], [0.1, -0.1, 2.0]])
        sdf, valid = raycast.trilinear_sample(state, pts, CFG)
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(np.asarray(sdf), 0.0, atol=CFG.voxel_size)

    def test_sample_in_front_positive(self):
        state = fused_map(WALL)
        sdf, valid = raycast.trilinear_sample(
            state, jnp.array([[0.0, 0.0, 1.97]]), CFG)
        assert bool(valid[0]) and float(sdf[0]) > 0.0

    def test_unallocated_invalid(self):
        state = fused_map(WALL)
        _, valid = raycast.trilinear_sample(
            state, jnp.array([[0.0, 0.0, 0.5]]), CFG)
        assert not bool(valid[0])


class TestRayIntervalSplat:
    def test_tile_bounds_bracket_wall(self):
        state = fused_map(WALL)
        pose = jnp.eye(4)
        active_idx, mask = active_set(state, pose)
        t_min, t_max = raycast.ray_interval_splat(
            state, active_idx, mask, geom.invert_rigid(pose), CAM, CFG, RC)
        t_min, t_max = np.asarray(t_min), np.asarray(t_max)
        # centre tiles must bracket depth 2.0 within the truncation band
        cy, cx = t_min.shape[0] // 2, t_min.shape[1] // 2
        assert t_min[cy, cx] < 2.0 < t_max[cy, cx]
        bs = CFG.block_size_world
        assert t_min[cy, cx] > 2.0 - 2 * CFG.truncation_at(2.0) - bs
        assert t_max[cy, cx] < 2.0 + 2 * CFG.truncation_at(2.0) + bs


class TestRender:
    def test_wall_depth_recovered(self):
        state = fused_map(WALL)
        pose = jnp.eye(4)
        active_idx, mask = active_set(state, pose)
        out = raycast.render(state, pose, CAM, CFG, RC,
                             active_idx=active_idx, active_mask=mask)
        depth = np.asarray(out.depth)
        gt, _ = render_depth(np.eye(4, dtype=np.float32), CAM, WALL)
        # interior pixels (skip borders where normals/trilinear lack support)
        sl = np.s_[10:-10, 10:-10]
        valid = np.isfinite(depth[sl])
        assert valid.mean() > 0.98, valid.mean()
        err = np.abs(depth[sl] - gt[sl])[valid]
        assert np.median(err) < 0.5 * CFG.voxel_size, np.median(err)
        assert err.max() < 3 * CFG.voxel_size, err.max()

    def test_normals_face_camera(self):
        state = fused_map(WALL)
        pose = jnp.eye(4)
        active_idx, mask = active_set(state, pose)
        out = raycast.render(state, pose, CAM, CFG, RC,
                             active_idx=active_idx, active_mask=mask)
        n = np.asarray(out.normals)[20:-20, 20:-20]
        ok = np.isfinite(n).all(axis=-1)
        # wall normal should be consistently +/- z (screen-space convention);
        # what matters is consistency, as ICP compares model vs input normals
        nz = n[ok][:, 2]
        assert (np.abs(nz) > 0.99).mean() > 0.95

    def test_sphere_depth_recovered(self):
        scene = Scene(wall_z=2.4, floor_y=None,
                      spheres=(Sphere(center=(0.0, 0.0, 1.6), radius=0.4),))
        state = fused_map(scene)
        pose = jnp.eye(4)
        active_idx, mask = active_set(state, pose)
        out = raycast.render(state, pose, CAM, CFG, RC,
                             active_idx=active_idx, active_mask=mask)
        depth = np.asarray(out.depth)
        gt, _ = render_depth(np.eye(4, dtype=np.float32), CAM, scene)
        # centre of the sphere projection
        sl = np.s_[25:35, 35:45]
        valid = np.isfinite(depth[sl]) & np.isfinite(gt[sl])
        assert valid.mean() > 0.9
        err = np.abs(depth[sl] - gt[sl])[valid]
        assert np.median(err) < CFG.voxel_size, np.median(err)

    def test_view_from_moved_camera(self):
        state = fused_map(WALL)
        pose_np = np.eye(4, dtype=np.float32)
        pose_np[0, 3] = 0.05
        pose_np[2, 3] = -0.04
        pose = jnp.asarray(pose_np)
        active_idx, mask = active_set(state, pose)
        out = raycast.render(state, pose, CAM, CFG, RC,
                             active_idx=active_idx, active_mask=mask)
        depth = np.asarray(out.depth)
        gt, _ = render_depth(pose_np, CAM, WALL)
        sl = np.s_[10:-10, 10:-10]
        valid = np.isfinite(depth[sl])
        assert valid.mean() > 0.95
        err = np.abs(depth[sl] - gt[sl])[valid]
        assert np.median(err) < 0.5 * CFG.voxel_size

    def test_empty_map_all_invalid(self):
        state = blockmap.create(CFG)
        pose = jnp.eye(4)
        active_idx, mask = active_set(state, pose)
        out = raycast.render(state, pose, CAM, CFG, RC,
                             active_idx=active_idx, active_mask=mask)
        assert not np.isfinite(np.asarray(out.depth)).any()
