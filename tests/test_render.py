"""Render modes, image export, point clouds, hole filling."""

import os

import numpy as np
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, engine, integrate, render
from voxelhashing_tpu.config import CameraConfig, MapConfig, RaycastConfig
from voxelhashing_tpu.io.synthetic import Scene, render_depth
from voxelhashing_tpu.ops.image import fill_holes_pullpush, preprocess
from voxelhashing_tpu.config import FilterConfig

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=8192, table_size=32768, max_active_blocks=8192)
SCENE = Scene()


def model_and_frame():
    from voxelhashing_tpu import geometry as geom, raycast
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
    depth, color = jnp.asarray(depth), jnp.asarray(color)
    pose = jnp.eye(4)
    state = blockmap.create(CFG)
    state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
    state = integrate.integrate(state, depth, color, pose, CAM, CFG)
    view = geom.invert_rigid(pose)
    ai, na, _ = blockmap.compactify(state, view, CAM, CFG)
    mask = jnp.arange(ai.shape[0]) < na
    model = raycast.render(state, pose, CAM, CFG, RaycastConfig(),
                           active_idx=ai, active_mask=mask)
    frame = preprocess(depth, color, CAM, FilterConfig(depth_filter=False))
    return model, frame


class TestRenderModes:
    def test_all_modes_produce_images(self):
        model, frame = model_and_frame()
        for mode in render.RENDER_MODES:
            img = render.render_frame(mode, model, frame, CAM)
            a = np.asarray(img)
            assert a.shape == (CAM.height, CAM.width, 3), mode
            assert np.isfinite(a).all(), mode
            assert a.min() >= 0.0 and a.max() <= 1.0, mode

    def test_phong_lights_surface(self):
        model, frame = model_and_frame()
        img = np.asarray(render.phong_shade(model.points, model.normals,
                                            model.color))
        interior = img[20:40, 20:60]
        assert interior.mean() > 0.03       # lit (first-fusion albedo is ~50% dimmed)
        bg = np.asarray(model.depth)
        assert (img[~np.isfinite(bg)] == 0).all()   # background black

    def test_save_image_and_render_to_file(self, tmp_path):
        model, frame = model_and_frame()
        rtf = render.RenderToFile(str(tmp_path), modes=("phong", "depth"))
        rtf(model, frame, CAM)
        rtf(model, frame, CAM)
        files = sorted(os.listdir(tmp_path))
        assert "phong_000000.png" in files and "depth_000001.png" in files

    def test_point_cloud_export(self, tmp_path):
        model, frame = model_and_frame()
        p = os.path.join(tmp_path, "cloud.ply")
        n = render.save_point_cloud(p, model.points, colors=model.color,
                                    normals=model.normals)
        assert n > 1000
        head = open(p, "rb").read(300)
        assert b"property float nx" in head and b"property uchar red" in head


class TestHoleFill:
    def test_fills_interior_hole(self):
        depth = np.full((64, 64), 2.0, np.float32)
        depth[20:28, 20:28] = np.nan          # interior hole
        out = np.asarray(fill_holes_pullpush(jnp.asarray(depth)))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[22:26, 22:26], 2.0, atol=0.05)

    def test_preserves_measured_pixels(self):
        rng = np.random.default_rng(0)
        depth = (2.0 + 0.1 * rng.standard_normal((32, 32))).astype(np.float32)
        depth[5, 5] = np.nan
        out = np.asarray(fill_holes_pullpush(jnp.asarray(depth)))
        mask = np.isfinite(depth)
        np.testing.assert_allclose(out[mask], depth[mask])
        assert np.isfinite(out[5, 5])


def test_march_cost_map():
    """RayMarchingStepsSplatting analog: tile bounds cut the march budget
    for pixels covered by geometry; empty tiles show zero band."""
    import jax.numpy as jnp
    import numpy as np
    from voxelhashing_tpu import blockmap, integrate as integ, render
    from voxelhashing_tpu.config import (CameraConfig, MapConfig,
                                         RaycastConfig)

    cam = CameraConfig(width=64, height=48, fx=52.0, fy=52.0,
                       cx=31.5, cy=23.5, depth_min=0.3, depth_max=4.0)
    mp = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                   num_blocks=2048, table_size=8192, max_active_blocks=2048,
                   world_blocks=1024)
    rc = RaycastConfig(num_samples=32)
    d = np.full((cam.height, cam.width), 1.5, np.float32)
    state = blockmap.create(mp)
    pose = jnp.eye(4)
    state, _ = integ.allocate_from_depth(state, jnp.asarray(d), pose, cam,
                                         mp)
    state = integ.integrate(state, jnp.asarray(d), None, pose, cam, mp)
    img = np.asarray(render.march_cost_map(state, pose, cam, mp, rc))
    assert img.shape == (cam.height, cam.width, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # the wall band is a thin slab: interior pixels march far fewer
    # samples than the full budget
    assert np.median(img[10:-10, 10:-10, 0]) < 0.6
