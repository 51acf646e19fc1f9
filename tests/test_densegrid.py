"""Dense voxel-grid baseline (densegrid.py): analytic init, integrate,
raycast, meshing — plus a differential fusion test against the sparse map
(the dense grid doubles as an oracle for the hash path's fusion math)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from voxelhashing_tpu import blockmap, densegrid, integrate as integ
from voxelhashing_tpu.config import CameraConfig, MapConfig
from voxelhashing_tpu.io.synthetic import Scene, render_depth


CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5,
                   depth_min=0.2, depth_max=4.0)

GRID = densegrid.DenseGridConfig(dims=(96, 96, 96),
                                 origin=(-0.96, -0.96, 0.8),
                                 voxel_size=0.02, truncation=0.1)


def _plane_frame(z=1.5, color=(0.8, 0.3, 0.1)):
    """Full-frame fronto-parallel plane at depth z + constant color."""
    d = np.full((CAM.height, CAM.width), z, np.float32)
    c = np.broadcast_to(np.asarray(color, np.float32),
                        (CAM.height, CAM.width, 3)).copy()
    return jnp.asarray(d), jnp.asarray(c)


def test_ellipsoid_render_depth():
    """Analytic sphere init -> raycast depth matches ray-sphere geometry."""
    g = densegrid.create(GRID)
    center = (0.0, 0.0, 1.6)
    g = densegrid.set_ellipsoid(g, GRID, center, (0.4, 0.4, 0.4))
    pose = jnp.eye(4)
    res = densegrid.render(g, GRID, pose, CAM)
    d = np.asarray(res.depth)
    # center pixel: first hit at z = 1.6 - 0.4 (normalized-radial SDF is
    # monotone along the center ray with the exact zero at the surface)
    assert np.isfinite(d[30, 40])
    assert abs(d[30, 40] - 1.2) < 2.5 * GRID.voxel_size
    # far-corner rays exit the ellipsoid's frustum footprint: no surface
    assert not np.isfinite(d[0, 0])
    # repo normal convention: +z for a front-facing surface
    # (geometry.normals_from_points, CameraUtil.cu:692 negation)
    n = np.asarray(res.normals)[30, 40]
    assert n[2] > 0.9


def test_integrate_plane_and_mesh():
    g = densegrid.create(GRID)
    depth, color = _plane_frame(z=1.5)
    pose = jnp.eye(4)
    for _ in range(3):
        g = densegrid.integrate(g, GRID, depth, color, pose, CAM)
    # TSDF crosses zero at the plane: sample straddling points
    s_front, ok_f = densegrid.trilinear_sample_soa(
        g, GRID, jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.40]))
    s_back, ok_b = densegrid.trilinear_sample_soa(
        g, GRID, jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.58]))
    assert bool(ok_f[0]) and bool(ok_b[0])
    assert float(s_front[0]) > 0.0 > float(s_back[0])

    # raycast recovers the plane depth
    res = densegrid.render(g, GRID, pose, CAM)
    d = np.asarray(res.depth)
    centre = d[20:40, 20:60]
    assert np.isfinite(centre).mean() > 0.9
    assert abs(np.nanmedian(centre) - 1.5) < GRID.voxel_size

    # surface color round-trips through the packed u32 (10x-observed blend)
    col = np.asarray(res.color)[30, 40]
    assert np.allclose(col, [0.8, 0.3, 0.1], atol=0.02)

    # meshing: triangles on the plane
    chunk = densegrid.extract_mesh(g, GRID)
    n = int(chunk.n_triangles)
    assert n > 100
    v = np.asarray(chunk.vertices[:n]).reshape(-1, 3)
    assert np.abs(v[:, 2] - 1.5).max() < 2.5 * GRID.voxel_size
    assert int(chunk.overflow) == 0


def test_integrate_weight_accumulates_and_clamps():
    cfg = dataclasses.replace(GRID, weight_max=4.0)
    g = densegrid.create(cfg)
    depth, color = _plane_frame(z=1.5)
    pose = jnp.eye(4)
    for _ in range(6):
        g = densegrid.integrate(g, cfg, depth, color, pose, CAM)
    w = np.asarray(g.weight)
    assert w.max() == 4.0  # min(255-style clamp at weight_max)


def test_differential_vs_sparse_map():
    """One frame fused into the dense grid and the sparse hash map gives
    the same TSDF near the surface (same observation, weight-1 average;
    sparse storage is bf16 so tolerance = one bf16 ulp of truncation)."""
    scene = Scene(wall_z=1.5, floor_y=None, spheres=())   # bare wall
    pose = np.eye(4, dtype=np.float32)
    d, c = render_depth(pose, CAM, scene)
    d = np.nan_to_num(d, nan=0.0)

    mp = MapConfig(voxel_size=GRID.voxel_size, truncation=GRID.truncation,
                   truncation_scale=0.0,   # match the dense FIXED truncation
                   num_blocks=4096, table_size=16384,
                   max_active_blocks=4096, world_blocks=1024,
                   integration_weight_sample=1)
    state = blockmap.create(mp)
    state, _ = integ.allocate_from_depth(state, jnp.asarray(d),
                                         jnp.asarray(pose), CAM, mp)
    state = integ.integrate(state, jnp.asarray(d), jnp.asarray(c),
                            jnp.asarray(pose), CAM, mp)

    g = densegrid.create(GRID)
    g = densegrid.integrate(g, GRID, jnp.asarray(d), jnp.asarray(c),
                            jnp.asarray(pose), CAM)

    # probe points just in front of the wall plane across the overlap volume
    rng = np.random.RandomState(0)
    px = rng.uniform(-0.3, 0.3, 200).astype(np.float32)
    py = rng.uniform(-0.3, 0.3, 200).astype(np.float32)
    pz = rng.uniform(1.42, 1.49, 200).astype(np.float32)
    s_d, ok_d = densegrid.trilinear_sample_soa(
        g, GRID, jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz))
    from voxelhashing_tpu.raycast import trilinear_sample_soa as sparse_tri
    s_s, ok_s = sparse_tri(state, jnp.asarray(px), jnp.asarray(py),
                           jnp.asarray(pz), mp)
    both = np.asarray(ok_d) & np.asarray(ok_s)
    assert both.sum() > 50
    diff = np.abs(np.asarray(s_d) - np.asarray(s_s))[both]
    # bf16 pool quantisation: ~2^-8 relative of the ~0.1 m truncation
    assert diff.max() < 1.5e-3


def test_empty_grid_renders_nothing():
    g = densegrid.create(GRID)
    res = densegrid.render(g, GRID, jnp.eye(4), CAM)
    assert not np.isfinite(np.asarray(res.depth)).any()
    chunk = densegrid.extract_mesh(g, GRID)
    assert int(chunk.n_triangles) == 0


def test_dense_engine_free_tracking():
    """The dense baseline runs the full preprocess->raycast->ICP->integrate
    loop (denseengine.py), like the original DX11 app's dense scene rep."""
    import jax
    from voxelhashing_tpu import denseengine, evaluation
    from voxelhashing_tpu.config import (EngineConfig, FilterConfig,
                                         TrackerConfig)
    from voxelhashing_tpu.io.synthetic import Sphere, make_trajectory

    cam = CAM
    grid_cfg = dataclasses.replace(GRID, dims=(80, 80, 64),
                                   origin=(-0.8, -0.8, 0.9),
                                   voxel_size=0.025, truncation=0.1)
    cfg = EngineConfig(
        camera=cam,
        tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                              max_inner_iter=(1, 1),
                              dist_thres=(0.15, 0.15),
                              normal_thres=(0.9, 0.9),
                              angle_trans_thres=(0.8, 0.8),
                              dist_trans_thres=(0.8, 0.8),
                              residual_early_out=(1e-8, 1e-8)),
        filter=FilterConfig(depth_filter=False),
        offline=False,
    )
    scene = Scene(wall_z=1.8, spheres=(
        Sphere(center=(0.0, 0.1, 1.5), radius=0.25),
        Sphere(center=(-0.4, -0.2, 1.6), radius=0.2, color=(0.2, 0.5, 0.8)),
        Sphere(center=(0.4, -0.1, 1.4), radius=0.15, color=(0.3, 0.7, 0.3)),
    ), floor_y=0.7)
    poses = make_trajectory(8, translation_step=0.006, rotation_step=0.003)
    step = denseengine.make_step(cfg, grid_cfg, donate=False)
    state = denseengine.create(grid_cfg)
    est = []
    for i, pose in enumerate(poses):
        d, c = render_depth(pose, cam, scene, noise_sigma=0.001, seed=i)
        d = np.nan_to_num(d, nan=0.0)
        state, tr = step(state, jnp.asarray(d), jnp.asarray(c))
        assert bool(tr.valid), f"tracking lost at frame {i}"
        est.append(np.asarray(state.pose))
    ate = evaluation.ate_rmse(est, poses)
    assert ate < 0.012, f"dense-engine ATE {ate*1e3:.1f} mm"
