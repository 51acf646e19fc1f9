"""Whole-map operations under streaming: meshing + checkpoint must compose
device-resident blocks with the host chunk store, bit-identical to the same
map with streaming off (the reference streams each chunk±1 back in before
extraction, CUDAMarchingCubesHashSDF.cpp:147-190, and serializes the host
grid after a full stream-out, CUDASceneRepChunkGrid.h:456-548)."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelhashing_tpu import blockmap, engine, meshing, streaming
from voxelhashing_tpu.config import (CameraConfig, EngineConfig, FilterConfig,
                                     MapConfig, MeshConfig, StreamingConfig,
                                     TrackerConfig)
from voxelhashing_tpu.geometry import INVALID_KEY
from voxelhashing_tpu.io.synthetic import Scene, Sphere, render_depth

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
MCFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                 num_blocks=8192, table_size=32768,
                 max_active_blocks=8192, world_blocks=1024)
SCFG = StreamingConfig(enabled=True, chunk_size=0.64, grid_dim=65,
                       radius=3.0, out_parts=4, in_chunks_per_frame=2)
MESH = MeshConfig(max_triangles=2_500_000)
SCENE = Scene(wall_z=2.0, floor_y=None,
              spheres=(Sphere(center=(0.0, 0.0, 1.5), radius=0.3),))


def _fused_state():
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
    from voxelhashing_tpu import integrate
    state = blockmap.create(MCFG)
    state, _ = integrate.allocate_from_depth(
        state, jnp.asarray(depth), jnp.eye(4), CAM, MCFG)
    state = integrate.integrate(state, jnp.asarray(depth),
                                jnp.asarray(color), jnp.eye(4), CAM, MCFG)
    return state


def _rows_sorted(keys, sdf, weight, color):
    o = np.argsort(keys)
    return keys[o], sdf[o], weight[o], color[o]


def _tris_sorted(tris):
    """Triangle soup [T,3,3] -> lexicographically sorted rows (order-free
    exact comparison)."""
    flat = np.asarray(tris).reshape(len(tris), -1)
    order = np.lexsort(flat.T[::-1])
    return flat[order]


class TestComposedWholeMap:
    """State-level identity: composed ops == pre-eviction ops on the SAME
    map, at partial and full eviction."""

    def _check_composed(self, state0, mgr, state_evicted, tmp_path, tag):
        # reference outputs from the fully-resident map
        tris0, _ = meshing.extract_mesh(state0, MCFG, MESH)
        rows0 = _rows_sorted(*streaming.resident_rows(state0, MCFG))

        # composed mesh over device + host tiers
        tris1, _ = meshing.extract_mesh_streamed(state_evicted, MCFG, MESH,
                                                 mgr)
        assert len(tris0) > 100
        np.testing.assert_array_equal(_tris_sorted(tris0),
                                      _tris_sorted(tris1))

        # composed checkpoint == plain checkpoint of the resident map
        pa = os.path.join(tmp_path, f"a_{tag}.npz")
        pb = os.path.join(tmp_path, f"b_{tag}.npz")
        na = streaming.save_map(pa, state0, MCFG)
        nb = streaming.save_map(pb, state_evicted, MCFG, manager=mgr)
        assert na == nb
        za, zb = np.load(pa), np.load(pb)
        ra = _rows_sorted(za["keys"], za["sdf"], za["weight"], za["color"])
        rb = _rows_sorted(zb["keys"], zb["sdf"], zb["weight"], zb["color"])
        for a, b in zip(ra, rb):
            np.testing.assert_array_equal(a, b)

    def test_partial_eviction(self, tmp_path):
        state0 = _fused_state()
        mgr = streaming.StreamingManager(MCFG, SCFG, out_cap=8192)
        far = np.array([40.0, 0.0, 0.0], np.float32)
        state = state0
        # two of four sweep parts -> mixed device/host residency
        for _ in range(2):
            state, _ = mgr.stream_out(state, far)
        assert mgr.host_block_count() > 0
        assert int(blockmap.stats(state, MCFG)["n_allocated"]) > 0
        self._check_composed(state0, mgr, state, tmp_path, "partial")

    def test_full_eviction_and_stream_in_all(self, tmp_path):
        state0 = _fused_state()
        n0 = int(blockmap.stats(state0, MCFG)["n_allocated"])
        mgr = streaming.StreamingManager(MCFG, SCFG, out_cap=8192)
        state = mgr.stream_out_all(state0)
        assert int(blockmap.stats(state, MCFG)["n_allocated"]) == 0
        assert mgr.host_block_count() == n0
        self._check_composed(state0, mgr, state, tmp_path, "full")

        # stream_in_all restores every block on device, payloads exact
        state = mgr.stream_in_all(state)
        assert mgr.host_block_count() == 0
        assert int(np.asarray(mgr.bitmask.sum())) == 0
        rows0 = _rows_sorted(*streaming.resident_rows(state0, MCFG))
        rows1 = _rows_sorted(*streaming.resident_rows(state, MCFG))
        for a, b in zip(rows0, rows1):
            np.testing.assert_array_equal(a, b)
        viol = blockmap.check_invariants(state, MCFG)
        assert all(v == 0 for v in viol.values()), viol

    def test_load_map_into_manager(self, tmp_path):
        """load_map(manager=...) files the checkpoint into the host store;
        stream_in_all materialises it identically."""
        state0 = _fused_state()
        path = os.path.join(tmp_path, "m.npz")
        streaming.save_map(path, state0, MCFG)
        mgr = streaming.StreamingManager(MCFG, SCFG, out_cap=8192)
        state, _ = streaming.load_map(path, MCFG, manager=mgr)
        assert int(blockmap.stats(state, MCFG)["n_allocated"]) == 0
        n0 = int(blockmap.stats(state0, MCFG)["n_allocated"])
        assert mgr.host_block_count() == n0
        # every loaded chunk is bitmasked against re-allocation
        assert int(np.asarray(mgr.bitmask.sum())) > 0
        state = mgr.stream_in_all(state)
        rows0 = _rows_sorted(*streaming.resident_rows(state0, MCFG))
        rows1 = _rows_sorted(*streaming.resident_rows(state, MCFG))
        for a, b in zip(rows0, rows1):
            np.testing.assert_array_equal(a, b)


class TestTrajectoryWholeMap:
    """End-to-end: a streamed GT-trajectory run's composed mesh/checkpoint
    equals the identical run with streaming off (the run_slam
    --streaming --mesh/--save-map path)."""

    def _run(self, with_streaming, async_mgr=False):
        cfg = EngineConfig(
            camera=CAM,
            map=MCFG,
            tracker=TrackerConfig(levels=2, max_outer_iter=(4, 3),
                                  max_inner_iter=(1, 1),
                                  dist_thres=(0.15, 0.15),
                                  normal_thres=(0.9, 0.9),
                                  angle_trans_thres=(1.0, 1.0),
                                  dist_trans_thres=(1.0, 1.0),
                                  residual_early_out=(1e-9, 1e-9)),
            filter=FilterConfig(depth_filter=False),
            streaming=SCFG,
            use_trajectory=True,
        )
        step = engine.make_step(cfg, with_hint=True, donate=False,
                                with_stream_mask=with_streaming)
        mgr = None
        if with_streaming:
            cls = streaming.AsyncStreamingManager if async_mgr \
                else streaming.StreamingManager
            mgr = cls(MCFG, SCFG, out_cap=8192)
        state = engine.create(cfg, initial_pose=np.eye(4))
        nan_d = np.full((CAM.height, CAM.width), np.nan, np.float32)
        zero_c = np.zeros((CAM.height, CAM.width, 3), np.float32)
        far_pose = np.eye(4, dtype=np.float32)
        far_pose[0, 3] = 40.0
        frames = []
        for i in range(3):                       # integrate phase (static)
            d, c = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
            frames.append((d, c, np.eye(4, dtype=np.float32)))
        for i in range(SCFG.out_parts + 2):      # walk-away phase (empty)
            frames.append((nan_d, zero_c, far_pose))
        for d, c, hint in frames:
            a = (state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                 jnp.asarray(c), jnp.asarray(hint))
            if mgr is not None:
                a += (mgr.bitmask,)
            state, _ = step(*a)
            if mgr is not None:
                new_map = mgr.step(state.map, np.asarray(state.pose)[:3, 3])
                state = state._replace(map=new_map)
        return state, mgr

    @pytest.mark.parametrize("async_mgr", [False, True])
    def test_streamed_matches_unstreamed(self, tmp_path, async_mgr):
        state_a, _ = self._run(with_streaming=False)
        state_b, mgr = self._run(with_streaming=True, async_mgr=async_mgr)
        if hasattr(mgr, "flush"):
            mgr.flush()      # join the streaming thread before composing
        # the walk-away phase must actually have evicted the map
        assert mgr.host_block_count() > 0

        tris_a, _ = meshing.extract_mesh(state_a.map, MCFG, MESH)
        tris_b, _ = meshing.extract_mesh_streamed(state_b.map, MCFG, MESH,
                                                  mgr)
        assert len(tris_a) > 100
        np.testing.assert_array_equal(_tris_sorted(tris_a),
                                      _tris_sorted(tris_b))

        pa = os.path.join(tmp_path, "a.npz")
        pb = os.path.join(tmp_path, "b.npz")
        na = streaming.save_map(pa, state_a.map, MCFG)
        nb = streaming.save_map(pb, state_b.map, MCFG, manager=mgr)
        assert na == nb > 0
        za, zb = np.load(pa), np.load(pb)
        ra = _rows_sorted(za["keys"], za["sdf"], za["weight"], za["color"])
        rb = _rows_sorted(zb["keys"], zb["sdf"], zb["weight"], zb["color"])
        for a, b in zip(ra, rb):
            np.testing.assert_array_equal(a, b)


class TestShardedWholeMap:
    """ShardedStreamingManager: composed whole-map ops over the sharded
    tiers equal the pre-eviction merged map."""

    @pytest.fixture(scope="class")
    def mesh8(self):
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        return jax.sharding.Mesh(np.array(devs[:8]), ("d",))

    def test_sharded_composed(self, mesh8, tmp_path):
        from voxelhashing_tpu.parallel import sharded
        from voxelhashing_tpu.parallel.streaming import \
            ShardedStreamingManager
        from voxelhashing_tpu.io.synthetic import make_trajectory
        cfg = EngineConfig(
            camera=CAM, map=MCFG,
            tracker=TrackerConfig(levels=2, max_outer_iter=(4, 3),
                                  max_inner_iter=(1, 1),
                                  dist_thres=(0.15, 0.15),
                                  normal_thres=(0.9, 0.9),
                                  angle_trans_thres=(1.0, 1.0),
                                  dist_trans_thres=(1.0, 1.0),
                                  residual_early_out=(1e-9, 1e-9)),
            filter=FilterConfig(depth_filter=False), streaming=SCFG)
        poses = make_trajectory(3)
        step = sharded.make_sharded_step(cfg, mesh8)
        sstate, lcfg = sharded.create_sharded(cfg, mesh8,
                                              initial_pose=poses[0])
        for p in poses:
            d, c = render_depth(p, CAM, Scene())
            sstate, _ = step(sstate, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                             jnp.asarray(c))

        merged0 = sharded.gather_map(sstate, lcfg, MCFG)
        tris0, _ = meshing.extract_mesh(merged0, MCFG, MESH)
        rows0 = _rows_sorted(*streaming.resident_rows(merged0, MCFG))

        smgr = ShardedStreamingManager(MCFG, SCFG, mesh8, out_cap=1024)
        smap = smgr.stream_out_all(sstate.map)
        assert smgr.host_block_count() == len(rows0[0])
        merged1 = sharded.gather_map(sstate._replace(map=smap), lcfg, MCFG)
        assert int(blockmap.stats(merged1, MCFG)["n_allocated"]) == 0

        # composed mesh + checkpoint against the sharded host store
        tris1, _ = meshing.extract_mesh_streamed(merged1, MCFG, MESH, smgr)
        assert len(tris0) > 100
        np.testing.assert_array_equal(_tris_sorted(tris0),
                                      _tris_sorted(tris1))
        pb = os.path.join(tmp_path, "sharded.npz")
        nb = streaming.save_map(pb, merged1, MCFG, manager=smgr)
        assert nb == len(rows0[0])
        zb = np.load(pb)
        rb = _rows_sorted(zb["keys"], zb["sdf"], zb["weight"], zb["color"])
        for a, b in zip(rows0, rb):
            np.testing.assert_array_equal(a, b)

        # round trip: stream_in_all routes every block to its owner shard
        smap = smgr.stream_in_all(smap)
        assert smgr.host_block_count() == 0
        merged2 = sharded.gather_map(sstate._replace(map=smap), lcfg, MCFG)
        rows2 = _rows_sorted(*streaming.resident_rows(merged2, MCFG))
        for a, b in zip(rows0, rows2):
            np.testing.assert_array_equal(a, b)
