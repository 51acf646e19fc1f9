"""Unit tests for coordinate transforms and camera math.

Golden values mirror the reference device math (VoxelUtilHashSDF.h:260-347,
DepthCameraUtil.h:74-122) — especially the fiddly negative-coordinate
handling the survey flags (SURVEY.md §7 phase 0).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelhashing_tpu import geometry as geom
from voxelhashing_tpu.config import CameraConfig, SDF_BLOCK_SIZE


VOXEL = 0.004


def ref_world_to_voxel(p):
    """NumPy mirror of worldToVirtualVoxelPos (int(p + sign(p)*0.5))."""
    q = np.asarray(p) / VOXEL
    return np.trunc(q + np.sign(q) * 0.5).astype(np.int32)


def ref_voxel_to_block(v):
    """NumPy mirror of virtualVoxelPosToSDFBlock (shift-then-truncate)."""
    v = np.asarray(v).copy()
    v[v < 0] -= SDF_BLOCK_SIZE - 1
    return (v / SDF_BLOCK_SIZE).astype(np.int32)


class TestVoxelTransforms:
    def test_world_to_voxel_matches_reference_incl_negatives(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3.0, 3.0, size=(1000, 3)).astype(np.float32)
        ours = np.asarray(geom.world_to_voxel(jnp.asarray(pts), VOXEL))
        ref = ref_world_to_voxel(pts)
        np.testing.assert_array_equal(ours, ref)

    def test_voxel_to_block_matches_reference_incl_negatives(self):
        v = np.arange(-64, 64, dtype=np.int32)
        vox = np.stack([v, v, v], axis=-1)
        ours = np.asarray(geom.voxel_to_block(jnp.asarray(vox)))
        ref = ref_voxel_to_block(vox)
        np.testing.assert_array_equal(ours, ref)

    def test_block_voxel_roundtrip(self):
        blocks = np.array([[-5, 0, 3], [7, -2, -8], [0, 0, 0]], np.int32)
        v = geom.block_to_voxel(jnp.asarray(blocks))
        back = geom.voxel_to_block(v)
        np.testing.assert_array_equal(np.asarray(back), blocks)
        # every voxel inside the block maps back to the same block
        for off in [(0, 0, 0), (7, 7, 7), (3, 1, 6)]:
            back2 = geom.voxel_to_block(v + jnp.asarray(off, jnp.int32))
            np.testing.assert_array_equal(np.asarray(back2), blocks)

    def test_local_index_nonnegative_and_bijective(self):
        rng = np.random.default_rng(1)
        vox = rng.integers(-1000, 1000, size=(500, 3)).astype(np.int32)
        li = np.asarray(geom.voxel_local_index(jnp.asarray(vox)))
        assert li.min() >= 0 and li.max() < 512
        # x-fastest ordering check against delinearize
        back = np.asarray(geom.delinearize_voxel_index(jnp.asarray(li)))
        np.testing.assert_array_equal(back, np.mod(vox, SDF_BLOCK_SIZE))

    def test_pack_unpack_block_key(self):
        rng = np.random.default_rng(2)
        blocks = rng.integers(-500, 500, size=(300, 3)).astype(np.int32)
        keys = geom.pack_block_key(jnp.asarray(blocks), 1024)
        assert np.all(np.asarray(keys) != int(geom.INVALID_KEY))
        back = np.asarray(geom.unpack_block_key(keys, 1024))
        np.testing.assert_array_equal(back, blocks)
        # keys are unique per block
        assert len(np.unique(np.asarray(keys))) == len(
            np.unique(blocks, axis=0))

    def test_pack_block_key_out_of_range_invalid(self):
        blocks = jnp.asarray([[600, 0, 0], [0, -513, 0]], jnp.int32)
        keys = np.asarray(geom.pack_block_key(blocks, 1024))
        assert np.all(keys == int(geom.INVALID_KEY))


class TestCamera:
    cam = CameraConfig()

    def test_project_unproject_roundtrip(self):
        rng = np.random.default_rng(3)
        u = rng.uniform(0, self.cam.width - 1, 200).astype(np.float32)
        v = rng.uniform(0, self.cam.height - 1, 200).astype(np.float32)
        d = rng.uniform(0.5, 4.0, 200).astype(np.float32)
        pts = geom.screen_to_camera(jnp.asarray(u), jnp.asarray(v),
                                    jnp.asarray(d), self.cam)
        uv = np.asarray(geom.camera_to_screen(pts, self.cam))
        np.testing.assert_allclose(uv[:, 0], u, atol=1e-3)
        np.testing.assert_allclose(uv[:, 1], v, atol=1e-3)

    def test_frustum(self):
        view = jnp.eye(4)
        inside = jnp.asarray([0.0, 0.0, 2.0])
        behind = jnp.asarray([0.0, 0.0, -1.0])
        far = jnp.asarray([0.0, 0.0, 50.0])
        side = jnp.asarray([10.0, 0.0, 2.0])
        assert bool(geom.in_frustum_approx(inside, view, self.cam))
        assert not bool(geom.in_frustum_approx(behind, view, self.cam))
        assert not bool(geom.in_frustum_approx(far, view, self.cam))
        assert not bool(geom.in_frustum_approx(side, view, self.cam))

    def test_depth_to_points_validity(self):
        depth = jnp.full((4, 4), 2.0)
        depth = depth.at[0, 0].set(jnp.nan).at[1, 1].set(0.0)
        pts = geom.depth_to_points(depth, CameraConfig(width=4, height=4))
        assert bool(jnp.isnan(pts[0, 0]).all())
        assert bool(jnp.isnan(pts[1, 1]).all())
        assert bool(jnp.isfinite(pts[2, 2]).all())


class TestSE3:
    def test_invert_rigid(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
        m = geom.pose_from_x(x)
        mi = geom.invert_rigid(m)
        np.testing.assert_allclose(np.asarray(m @ mi), np.eye(4), atol=1e-5)

    def test_euler_zyx_order(self):
        # pure Z rotation
        m = np.asarray(geom.euler_zyx_to_matrix(jnp.asarray([0.3, 0.0, 0.0])))
        c, s = np.cos(0.3), np.sin(0.3)
        np.testing.assert_allclose(
            m, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)
        # composition order Rz @ Ry @ Rx
        a = jnp.asarray([0.1, -0.2, 0.3])
        m = np.asarray(geom.euler_zyx_to_matrix(a))
        mz = np.asarray(geom.euler_zyx_to_matrix(jnp.asarray([0.1, 0, 0])))
        my = np.asarray(geom.euler_zyx_to_matrix(jnp.asarray([0, -0.2, 0])))
        mx = np.asarray(geom.euler_zyx_to_matrix(jnp.asarray([0, 0, 0.3])))
        np.testing.assert_allclose(m, mz @ my @ mx, atol=1e-6)

    def test_rotation_angle(self):
        m = geom.euler_zyx_to_matrix(jnp.asarray([0.0, 0.25, 0.0]))
        assert abs(float(geom.rotation_angle(m)) - 0.25) < 1e-5


class TestNormals:
    def test_plane_normals_face_camera(self):
        cam = CameraConfig(width=32, height=32, fx=30.0, fy=30.0,
                           cx=15.5, cy=15.5)
        depth = jnp.full((32, 32), 2.0)
        pts = geom.depth_to_points(depth, cam)
        n = np.asarray(geom.normals_from_points(pts))
        inner = n[8:-8, 8:-8]
        # Reference convention (computeNormals negates the cross product,
        # CameraUtil.cu:692): a front-facing wall yields n = +z. Absolute
        # orientation is arbitrary; input/model consistency is what ICP needs.
        assert np.all(np.isfinite(inner))
        np.testing.assert_allclose(inner[..., 2], 1.0, atol=1e-3)
        # edges invalid
        assert np.all(np.isnan(n[0, :, 0]))
        assert np.all(np.isnan(n[:, -1, 0]))
