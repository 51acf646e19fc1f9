"""Sharded engine × out-of-core tiering (parallel/streaming.py):
per-shard eviction, global host store, owner-routed stream-in,
conservation and bitmask contracts on the 8-virtual-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelhashing_tpu import blockmap
from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                     FilterConfig, MapConfig,
                                     StreamingConfig, TrackerConfig)
from voxelhashing_tpu.geometry import INVALID_KEY
from voxelhashing_tpu.io.synthetic import Scene, make_trajectory, render_depth
from voxelhashing_tpu.parallel import sharded
from voxelhashing_tpu.parallel.streaming import (ShardedStreamingManager,
                                                 _owner_np)

CAM = CameraConfig(width=128, height=96, fx=104.0, fy=104.0,
                   cx=63.5, cy=47.5)
SCFG = StreamingConfig(enabled=True, radius=1.2, chunk_size=0.32,
                       out_parts=4, in_chunks_per_frame=8)
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
    streaming=SCFG,
)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.sharding.Mesh(np.array(devs[:8]), ("d",))


@pytest.fixture(scope="module")
def fused(mesh):
    """A sharded map fused from a few frames (bitmask-aware step)."""
    poses = make_trajectory(4)
    step = sharded.make_sharded_step(CFG, mesh, with_stream_mask=True)
    state, lcfg = sharded.create_sharded(CFG, mesh, initial_pose=poses[0])
    mgr = ShardedStreamingManager(CFG.map, SCFG, mesh, out_cap=512)
    for i, p in enumerate(poses):
        d, c = render_depth(p, CAM, Scene())
        state, _ = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                        jnp.asarray(c), mgr.bitmask)
    return state, lcfg, mgr


def _shard_invariants(smap, lcfg):
    stacked = jax.device_get(smap)
    for d in range(stacked.block_key.shape[0]):
        local = jax.tree_util.tree_map(lambda x: jnp.asarray(x[d]), stacked)
        viol = blockmap.check_invariants(local, lcfg)
        assert all(int(v) == 0 for v in viol.values()), (d, viol)


def _total_blocks(smap, lcfg):
    stacked = jax.device_get(smap)
    return int((stacked.block_key != INVALID_KEY).sum())


def test_stream_out_all_and_back(fused, mesh):
    state, lcfg, mgr = fused
    total0 = _total_blocks(state.map, lcfg)
    assert total0 > 500

    smap = mgr.stream_out_all(state.map)
    assert _total_blocks(smap, lcfg) == 0
    assert mgr.host_block_count() == total0
    _shard_invariants(smap, lcfg)

    # evicted space is masked out of allocation
    stacked = jax.device_get(state.map)
    some_keys = stacked.block_key[stacked.block_key != INVALID_KEY][:64]
    masked = np.asarray(mgr.alloc_mask_keys(jnp.asarray(some_keys)))
    assert (masked == INVALID_KEY).all()

    # stream everything back (camera at origin, huge radius sweeps)
    mgr2_radius = mgr.scfg.radius
    for _ in range(64):
        smap, n = mgr.stream_in(smap, [0.0, 0.0, 1.5])
        if mgr.host_block_count() == 0:
            break
    # chunks outside the sphere stay on host; in-sphere ones returned
    back = _total_blocks(smap, lcfg)
    assert back + mgr.host_block_count() == total0   # conservation
    assert back > 0
    _shard_invariants(smap, lcfg)

    # every returned block landed on its hash owner
    stacked = jax.device_get(smap)
    for d in range(mgr.n_dev):
        keys = stacked.block_key[d]
        keys = keys[keys != INVALID_KEY]
        if len(keys):
            assert (_owner_np(keys, mgr.n_dev) == d).all()


def test_partial_sweep_conserves(fused, mesh):
    state, lcfg, mgr2 = fused
    mgr = ShardedStreamingManager(CFG.map, SCFG, mesh, out_cap=512)
    total0 = _total_blocks(state.map, lcfg)
    smap = state.map
    # active sphere centred INSIDE the scene (sphere cluster ~z 1.5-2.0;
    # the wall at z=2.5 falls outside radius 1.2 and tiers out)
    cam_pos = [0.0, 0.0, 1.6]
    for _ in range(SCFG.out_parts):
        smap, _ = mgr.stream_out(smap, cam_pos)
    on_dev = _total_blocks(smap, lcfg)
    assert on_dev + mgr.host_block_count() == total0
    assert mgr.host_block_count() > 0        # far wall blocks left
    assert on_dev > 0                        # near geometry stayed
    _shard_invariants(smap, lcfg)
