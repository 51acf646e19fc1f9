"""Distributed (8-virtual-device) map-sharded step vs single-device run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelhashing_tpu import blockmap, engine, evaluation
from voxelhashing_tpu.config import (CameraConfig, EngineConfig, FilterConfig,
                                     MapConfig, RaycastConfig, TrackerConfig)
from voxelhashing_tpu.io.synthetic import Scene, make_trajectory, render_depth
from voxelhashing_tpu.parallel import sharded

CAM = CameraConfig(width=128, height=96, fx=104.0, fy=104.0,
                   cx=63.5, cy=47.5)
CFG = EngineConfig(
    camera=CAM,
    map=MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                  num_blocks=16384, table_size=65536,
                  max_active_blocks=16384),
    tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                          max_inner_iter=(1, 1),
                          dist_thres=(0.15, 0.15), normal_thres=(0.9, 0.9),
                          angle_trans_thres=(1.0, 1.0),
                          dist_trans_thres=(1.0, 1.0),
                          residual_early_out=(1e-9, 1e-9)),
    filter=FilterConfig(depth_filter=False),
)
SCENE = Scene()


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.sharding.Mesh(np.array(devs[:8]), ("d",))


def run_sharded(mesh, n_frames):
    poses = make_trajectory(n_frames)
    step = sharded.make_sharded_step(CFG, mesh)
    state, lcfg = sharded.create_sharded(CFG, mesh, initial_pose=poses[0])
    est = []
    for i, p in enumerate(poses):
        d, c = render_depth(p, CAM, SCENE)
        state, pose = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                           jnp.asarray(c))
        est.append(np.asarray(pose))
    return state, lcfg, est, poses


class TestSharded:
    def test_tracks_and_partitions(self, mesh):
        state, lcfg, est, gt = run_sharded(mesh, 6)
        ate = evaluation.ate_rmse(est, gt, align=False)
        assert ate < 0.012, ate

        # every device owns a disjoint, hash-consistent key partition
        stacked = jax.device_get(state.map)
        from voxelhashing_tpu.geometry import INVALID_KEY
        all_keys = []
        for d in range(8):
            keys = stacked.block_key[d]
            keys = keys[keys != INVALID_KEY]
            owner = (np.asarray(
                blockmap._mix(jnp.asarray(keys, jnp.uint32))) % 8)
            assert (owner == d).all()
            all_keys.append(keys)
        flat = np.concatenate(all_keys)
        assert len(flat) == len(np.unique(flat))   # no duplicates anywhere
        assert len(flat) > 200

    def test_matches_single_device_map(self, mesh):
        state, lcfg, est, gt = run_sharded(mesh, 4)
        # single-device reference with the same (gt-free) pipeline
        step1 = engine.make_step(CFG, donate=False)
        s1 = engine.create(CFG, initial_pose=gt[0])
        for i, p in enumerate(gt):
            d, c = render_depth(p, CAM, SCENE)
            s1, _ = step1(s1, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                          jnp.asarray(c))
        from voxelhashing_tpu.geometry import INVALID_KEY
        stacked = jax.device_get(state.map)
        n_sharded = sum(int((stacked.block_key[d] != INVALID_KEY).sum())
                        for d in range(8))
        n_single = int(blockmap.stats(s1.map, CFG.map)["n_allocated"])
        # same scene coverage within a few % (pose estimates differ slightly)
        assert abs(n_sharded - n_single) < 0.1 * n_single, \
            (n_sharded, n_single)

    def test_gather_map(self, mesh):
        state, lcfg, est, gt = run_sharded(mesh, 3)
        merged = sharded.gather_map(state, lcfg, CFG.map)
        viol = blockmap.check_invariants(merged, CFG.map)
        assert all(v == 0 for v in viol.values()), viol
        stacked = jax.device_get(state.map)
        from voxelhashing_tpu.geometry import INVALID_KEY
        n_sharded = sum(int((stacked.block_key[d] != INVALID_KEY).sum())
                        for d in range(8))
        assert int(blockmap.stats(merged, CFG.map)["n_allocated"]) \
            == n_sharded

    def test_sharded_march_matches_merged(self, mesh):
        """Distributed trilinear march (psum'd corner fetches) == the
        single-device march on the merged map — the halo-free global
        sampling path (SURVEY §7 phase 4)."""
        from voxelhashing_tpu import raycast
        state, lcfg, est, gt = run_sharded(mesh, 3)
        render = sharded.make_sharded_render(CFG, mesh)
        res_sh = render(state, est[-1])

        merged = sharded.gather_map(state, lcfg, CFG.map)
        view = jnp.asarray(est[-1], jnp.float32)
        from voxelhashing_tpu import geometry as geom
        ai, na, _ = blockmap.compactify(
            merged, geom.invert_rigid(view), CAM, CFG.map)
        am = jnp.arange(ai.shape[0]) < na
        res_1 = raycast.render_march(merged, view, CAM, CFG.map,
                                     CFG.raycast, active_idx=ai,
                                     active_mask=am)
        z_sh = np.asarray(res_sh.depth)
        z_1 = np.asarray(res_1.depth)
        cov_sh, cov_1 = np.isfinite(z_sh), np.isfinite(z_1)
        assert cov_sh.sum() > 500
        # identical coverage (modulo <0.5% boundary-secant flips)
        assert (cov_sh ^ cov_1).mean() < 5e-3
        both = cov_sh & cov_1
        assert np.abs(z_sh[both] - z_1[both]).max() < 1e-4
        # color agrees too (psum'd packed-color path)
        c_err = np.abs(np.asarray(res_sh.color)[both]
                       - np.asarray(res_1.color)[both])
        assert c_err.max() < 2 / 255.0

    def test_rgbd_track_distributed_matches_single(self, mesh):
        """RGBD (photometric+depth) tracking with a psum reduce_fn over
        row-sharded inputs == the single-device result on the same frames.

        Guards the reduction fold: the color system must join the depth
        system BEFORE the mesh reduction (tracking.track inner loop) — a
        post-psum fold would mix each device's LOCAL color rows into the
        globally-reduced depth system."""
        import dataclasses
        from jax import lax
        from jax.sharding import PartitionSpec as P
        from voxelhashing_tpu import tracking
        from voxelhashing_tpu.ops.image import preprocess

        poses = make_trajectory(2)
        cfg_t = dataclasses.replace(CFG.tracker, use_rgbd=True,
                                    weight_color=0.5)
        frames = []
        for p in poses:
            d, c = render_depth(p, CAM, SCENE)
            frames.append(preprocess(jnp.asarray(np.nan_to_num(d, nan=0.0)),
                                     jnp.asarray(c), CAM, CFG.filter))
        f0, f1 = frames
        pose0 = jnp.asarray(poses[0], jnp.float32)

        tr1 = tracking.track(f1.points, f1.normals, f0.points, f0.normals,
                             pose0, CAM, cfg_t,
                             input_intensity=f1.intensity,
                             model_intensity=f0.intensity,
                             weight_color=cfg_t.weight_color)
        assert bool(tr1.valid)

        def shard_track(in_p, in_n, in_i, md_p, md_n, md_i, pose):
            psum = lambda t: tuple(lax.psum(x, "d") for x in t)  # noqa
            tr = tracking.track(in_p, in_n, md_p, md_n, pose, CAM, cfg_t,
                                input_intensity=in_i, model_intensity=md_i,
                                weight_color=cfg_t.weight_color,
                                reduce_fn=psum)
            return tr.pose, tr.valid

        fn = jax.jit(jax.shard_map(
            shard_track, mesh=mesh,
            in_specs=(P("d"), P("d"), P("d"), P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        pose_d, valid_d = fn(f1.points, f1.normals, f1.intensity,
                             f0.points, f0.normals, f0.intensity, pose0)
        assert bool(valid_d)
        np.testing.assert_allclose(np.asarray(pose_d),
                                   np.asarray(tr1.pose), atol=2e-4)

    def test_sharded_step_rgbd(self, mesh):
        """Full sharded step with use_rgbd=True (splat model + psum'd
        color z-min combine) still tracks the trajectory."""
        import dataclasses
        cfg_r = dataclasses.replace(
            CFG, tracker=dataclasses.replace(CFG.tracker, use_rgbd=True))
        poses = make_trajectory(4)
        step = sharded.make_sharded_step(cfg_r, mesh)
        state, lcfg = sharded.create_sharded(cfg_r, mesh,
                                             initial_pose=poses[0])
        est = []
        for p in poses:
            d, c = render_depth(p, CAM, SCENE)
            state, pose = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                               jnp.asarray(c))
            est.append(np.asarray(pose))
        ate = evaluation.ate_rmse(est, [np.asarray(p) for p in poses])
        assert ate < 0.02, ate

    def test_sharded_step_march_mode(self, mesh):
        """The sharded STEP with rc.mode='march' tracks (distributed
        trilinear model for ICP)."""
        import dataclasses
        global CFG
        cfg_m = dataclasses.replace(
            CFG, raycast=dataclasses.replace(CFG.raycast, mode="march"))
        poses = make_trajectory(4)
        step = sharded.make_sharded_step(cfg_m, mesh)
        state, lcfg = sharded.create_sharded(cfg_m, mesh,
                                             initial_pose=poses[0])
        est = []
        for p in poses:
            d, c = render_depth(p, CAM, SCENE)
            state, pose = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                               jnp.asarray(c))
            est.append(np.asarray(pose))
        ate = evaluation.ate_rmse(est, [np.asarray(p) for p in poses])
        assert ate < 0.02, ate
