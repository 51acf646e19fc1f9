"""Mesh extraction: geometric accuracy against analytic scenes."""

import os

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, integrate, meshing
from voxelhashing_tpu.config import CameraConfig, MapConfig, MeshConfig
from voxelhashing_tpu.io.synthetic import Scene, Sphere, render_depth

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=8192, table_size=32768,
                max_active_blocks=8192, world_blocks=1024)
MESH = MeshConfig()


def fused(scene):
    state = blockmap.create(CFG)
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, scene)
    depth, color = jnp.asarray(depth), jnp.asarray(color)
    pose = jnp.eye(4)
    state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
    for _ in range(3):
        state = integrate.integrate(state, depth, color, pose, CAM, CFG)
    return state


class TestExtract:
    def test_wall_mesh_on_plane(self):
        scene = Scene(wall_z=2.0, floor_y=None, spheres=())
        state = fused(scene)
        tris, cols = meshing.extract_mesh(state, CFG, MESH)
        assert len(tris) > 100
        # every vertex must lie on the wall plane to within ~half a voxel
        z = tris[..., 2].ravel()
        assert np.abs(z - 2.0).max() < 0.75 * CFG.voxel_size, \
            np.abs(z - 2.0).max()

    def test_sphere_mesh_radius(self):
        scene = Scene(wall_z=3.5, floor_y=None,
                      spheres=(Sphere(center=(0.0, 0.0, 1.5), radius=0.4),))
        state = fused(scene)
        tris, _ = meshing.extract_mesh(state, CFG, MESH)
        v = tris.reshape(-1, 3)
        # vertices near the sphere: distance from centre ~= radius
        d = np.linalg.norm(v - np.array([0.0, 0.0, 1.5]), axis=-1)
        sphere_pts = d < 0.6
        assert sphere_pts.sum() > 100
        err = np.abs(d[sphere_pts] - 0.4)
        assert np.median(err) < 0.5 * CFG.voxel_size, np.median(err)

    def test_winding_outward(self):
        scene = Scene(wall_z=2.007, floor_y=None, spheres=())
        state = fused(scene)
        tris, _ = meshing.extract_mesh(state, CFG, MESH)
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        # wall seen from -z: outward (toward camera / positive sdf) is -z
        assert (n[:, 2] < -0.9).mean() > 0.95

    def test_empty_map_empty_mesh(self):
        state = blockmap.create(CFG)
        tris, _ = meshing.extract_mesh(state, CFG, MESH)
        assert len(tris) == 0

    def test_save_ply(self, tmp_path):
        scene = Scene(wall_z=2.0, floor_y=None, spheres=())
        state = fused(scene)
        tris, cols = meshing.extract_mesh(state, CFG, MESH)
        path = os.path.join(tmp_path, "mesh.ply")
        nfaces = meshing.save_ply(path, tris, cols)
        assert nfaces > 0
        data = open(path, "rb").read()
        assert data.startswith(b"ply")
        assert b"binary_little_endian" in data[:200]

    def test_color_carried(self):
        scene = Scene(wall_z=2.0, floor_y=None, spheres=(),
                      wall_color=(0.8, 0.2, 0.1))
        state = fused(scene)
        tris, cols = meshing.extract_mesh(state, CFG, MESH)
        # colors converge to wall color after repeated 50/50 blends from
        # black: 3 rounds -> 7/8 of target
        mean = cols.reshape(-1, 3).mean(axis=0)
        target = np.array([0.8, 0.2, 0.1]) * (7.0 / 8.0)
        np.testing.assert_allclose(mean, target, atol=0.08)


def test_max_triangles_budget_enforced():
    """s_marchingCubesMaxNumTriangles clamps whole-map extraction (the
    reference's appendTriangle overflow clamp) with a warning."""
    import warnings
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from voxelhashing_tpu import blockmap, integrate as integ, meshing
    from voxelhashing_tpu.config import CameraConfig, MapConfig, MeshConfig

    cam = CameraConfig(width=64, height=48, fx=52.0, fy=52.0,
                       cx=31.5, cy=23.5, depth_min=0.3, depth_max=4.0)
    mp = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                   num_blocks=2048, table_size=8192, max_active_blocks=2048,
                   world_blocks=1024)
    d = np.full((cam.height, cam.width), 1.5, np.float32)
    state = blockmap.create(mp)
    pose = jnp.eye(4)
    state, _ = integ.allocate_from_depth(state, jnp.asarray(d), pose, cam, mp)
    state = integ.integrate(state, jnp.asarray(d), None, pose, cam, mp)

    full_v, _ = meshing.extract_mesh(state, mp, MeshConfig())
    assert len(full_v) > 50
    cap = len(full_v) // 2
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        v, c = meshing.extract_mesh(state, mp,
                                    MeshConfig(max_triangles=cap))
    assert len(v) == cap
    assert any("truncated" in str(x.message) for x in w)
