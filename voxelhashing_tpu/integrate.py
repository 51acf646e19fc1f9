"""Depth-map integration: block allocation, TSDF fusion, garbage collection.

TPU-native re-derivation of the integrate pipeline of
``CUDASceneRepHashSDF`` (/root/reference/DepthSensingCUDA/Source/
CUDASceneRepHashSDF.h:64-83 ``integrate()`` = set pose -> alloc ->
compactify -> integrate -> garbageCollect):

* ``alloc_candidates``: per-pixel 3D-DDA walk through block space over the
  truncation band [d-t, d+t] (allocKernel, CUDASceneRepHashSDF.cu:158-243),
  vectorised over all pixels with a static step cap.
* ``integrate``: per-voxel projective TSDF fusion over the compacted active
  block list (integrateDepthMapKernel, :412-492) as a gather -> fuse ->
  scatter pass; the running weighted average is ``combineVoxel``
  (VoxelUtilHashSDF.h:228-250).
* ``garbage_collect``: weight starvation + min|sdf|/max-weight block culling
  (starveVoxelsKernel :512-536, garbageCollectIdentifyKernel :543-590,
  garbageCollectFreeKernel :608-628).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .config import MapConfig, CameraConfig, SDF_BLOCK_SIZE, VOXELS_PER_BLOCK
from . import geometry as geom
from . import blockmap
from .blockmap import MapState
from .geometry import INVALID_KEY


# ---------------------------------------------------------------------------
# Allocation candidates: DDA through block space along each pixel ray
# ---------------------------------------------------------------------------


def alloc_candidates(depth, pose, cam: CameraConfig, cfg: MapConfig,
                     view_matrix=None):
    """Block keys touched by the truncation band of each depth pixel.

    Vectorised 3D-DDA (exactly the traversal of allocKernel,
    CUDASceneRepHashSDF.cu:189-241): from the world point at depth ``d-t``
    to ``d+t`` along the pixel ray, visiting every crossed block, capped at
    ``cfg.alloc_steps`` static steps (the band typically spans <= 4 blocks).

    Returns int32[h*w*alloc_steps] keys; invalid entries are INVALID_KEY.
    """
    h, w = depth.shape
    d = depth.reshape(-1)
    valid = jnp.isfinite(d) & (d > 0.0) & (d < cfg.max_integration_distance)
    d = jnp.where(valid, d, 1.0)

    t = cfg.truncation_at(d)
    min_d = jnp.minimum(cfg.max_integration_distance, d - t)
    max_d = jnp.minimum(cfg.max_integration_distance, d + t)
    valid &= min_d < max_d

    u, v = geom.pixel_grid(w, h)
    u, v = u.reshape(-1), v.reshape(-1)
    ray_min = geom.transform_points(pose, geom.screen_to_camera(u, v, min_d, cam))
    ray_max = geom.transform_points(pose, geom.screen_to_camera(u, v, max_d, cam))

    ray_dir = ray_max - ray_min
    ray_len = jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)
    ray_dir = ray_dir / jnp.maximum(ray_len, 1e-12)

    block_world = cfg.block_size_world
    cur = geom.world_to_block(ray_min, cfg.voxel_size)        # [P,3]
    end = geom.world_to_block(ray_max, cfg.voxel_size)
    step = jnp.sign(ray_dir).astype(jnp.int32)

    # Distance along the ray to the next block boundary per axis. The
    # reference computes the boundary from the *rounded* block corner minus
    # half a voxel (block corner samples sit at multiples of voxel_size, so
    # cell walls are offset by voxel_size/2; SDFBlockToWorld + -0.5*voxel,
    # CUDASceneRepHashSDF.cu:193).
    boundary = (cur + jnp.clip(step, 0, 1)).astype(jnp.float32) * block_world \
        - 0.5 * cfg.voxel_size
    safe_dir = jnp.where(ray_dir == 0.0, 1e-12, ray_dir)
    t_max = (boundary - ray_min) / safe_dir
    t_delta = (step.astype(jnp.float32) * block_world) / safe_dir
    inf = jnp.float32(jnp.inf)
    degenerate = (ray_dir == 0.0) | (boundary - ray_min == 0.0)
    t_max = jnp.where(degenerate, inf, t_max)
    t_delta = jnp.where(degenerate, inf, t_delta)
    bound = end + step

    def dda_step(carry, _):
        cur, t_max, alive = carry
        key = geom.pack_block_key(cur, cfg.world_blocks)
        key = jnp.where(alive, key, INVALID_KEY)
        # Pick the axis with smallest t_max (reference order: x, then z,
        # then y on ties, CUDASceneRepHashSDF.cu:228-243).
        tx, ty, tz = t_max[:, 0], t_max[:, 1], t_max[:, 2]
        ax = jnp.where((tx < ty) & (tx < tz), 0, jnp.where(tz < ty, 2, 1))
        onehot = jax.nn.one_hot(ax, 3, dtype=jnp.int32)
        nxt = cur + onehot * step
        # Ray exits the band when the stepped axis reaches its bound.
        hit_bound = jnp.sum(onehot * (nxt == bound), axis=-1) > 0
        t_max = t_max + onehot.astype(t_max.dtype) * t_delta
        alive = alive & ~hit_bound
        return (nxt, t_max, alive), key

    (_, _, _), keys = jax.lax.scan(
        dda_step, (cur, t_max, valid), None, length=cfg.alloc_steps)
    return keys.reshape(-1)   # [alloc_steps * P]


def allocate_from_depth(state: MapState, depth, pose, cam: CameraConfig,
                        cfg: MapConfig) -> Tuple[MapState, jax.Array]:
    """alloc() stage: DDA candidates filtered by frustum, then batch-insert.

    The reference also skips streamed-out blocks via the chunk bitmask
    (isSDFBlockStreamedOut, :149-156); the streaming layer applies that mask
    before calling :func:`blockmap.allocate`.
    """
    keys = alloc_candidates(depth, pose, cam, cfg)
    return blockmap.allocate(state, keys, cfg)


# ---------------------------------------------------------------------------
# TSDF fusion
# ---------------------------------------------------------------------------


def _local_voxel_offsets():
    """[512,3] int32 local voxel offsets in x-fastest order
    (delinearizeVoxelIndex, VoxelUtilHashSDF.h:313-319)."""
    idx = jnp.arange(VOXELS_PER_BLOCK, dtype=jnp.int32)
    return geom.delinearize_voxel_index(idx)


def integrate(state: MapState, depth, color, pose, cam: CameraConfig,
              cfg: MapConfig, active_idx=None, active_mask=None) -> MapState:
    """Fuse one depth (+color) frame into the active blocks.

    integrateDepthMapKernel (CUDASceneRepHashSDF.cu:412-492): for each voxel
    of each in-frustum block, project into the frame, nearest-sample depth
    and color, compute sdf = depth - p_cam.z, truncate, and fuse with the
    weighted running average ``combineVoxel`` (VoxelUtilHashSDF.h:228-250):

        sdf'    = (sdf*w + sdf_new*w_new) / (w + w_new)
        color'  = round(0.5*color + 0.5*color_new)      (50/50 blend)
        w'      = min(w + w_new, w_max)

    with the distance-scaled sample weight
    ``max(w_sample * 1.5 * (1 - depth01), 1)`` (:462).

    ``color`` may be None (depth-only integration -> green debug color, as
    the reference does at :478).
    """
    view = geom.invert_rigid(pose)
    if active_idx is None:
        active_idx, _, _ = blockmap.compactify(state, view, cam, cfg)
        active_mask = state.block_key[active_idx] != INVALID_KEY

    m = active_idx.shape[0]
    blocks = geom.unpack_block_key(state.block_key[active_idx],
                                   cfg.world_blocks)         # [M,3]
    base_voxel = geom.block_to_voxel(blocks)                 # [M,3]
    voxel = base_voxel[:, None, :] + _local_voxel_offsets()[None, :, :]
    p_world = geom.voxel_to_world(voxel, cfg.voxel_size)     # [M,512,3]
    p_cam = geom.transform_points(view, p_world)

    uv = geom.camera_to_screen_int(p_cam, cam)               # [M,512,2]
    on_screen = ((uv[..., 0] >= 0) & (uv[..., 0] < cam.width)
                 & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height))
    ui = jnp.clip(uv[..., 0], 0, cam.width - 1)
    vi = jnp.clip(uv[..., 1], 0, cam.height - 1)

    d = depth[vi, ui]                                        # [M,512]
    d_valid = jnp.isfinite(d) & (d > 0.0)
    d = jnp.where(d_valid, d, 0.0)

    sdf = d - p_cam[..., 2]
    trunc = cfg.truncation_at(d)
    update = (on_screen & d_valid
              & (d < cfg.max_integration_distance)
              & (sdf > -trunc)
              & active_mask[:, None])
    sdf = jnp.clip(sdf, -trunc, trunc)

    depth01 = geom.depth_to_zero_one(d, cam)
    w_new = jnp.maximum(
        cfg.integration_weight_sample * 1.5 * (1.0 - depth01), 1.0)

    if color is not None:
        # frame colors are [0,1]; voxel colors 0..255 (reference scales by
        # 255 at CUDASceneRepHashSDF.cu:474)
        c_new = color[vi, ui].astype(jnp.float32) * 255.0    # [M,512,3]
        c_valid = jnp.all(jnp.isfinite(c_new), axis=-1)
        update &= c_valid
    else:
        c_new = jnp.broadcast_to(
            jnp.array([0.0, 255.0, 0.0], jnp.float32), sdf.shape + (3,))

    old_sdf = state.sdf[active_idx]
    old_w = state.weight[active_idx]
    old_c = state.color[active_idx].astype(jnp.float32)

    new_w_sum = old_w + w_new
    fused_sdf = (old_sdf * old_w + sdf * w_new) / new_w_sum
    fused_w = jnp.minimum(new_w_sum, cfg.integration_weight_max)
    # 50/50 exponential color blend with +0.5 rounding (combineVoxel).
    fused_c = jnp.floor(0.5 * old_c + 0.5 * c_new + 0.5)

    out_sdf = jnp.where(update, fused_sdf, old_sdf)
    out_w = jnp.where(update, fused_w, old_w)
    out_c = jnp.where(update[..., None], fused_c, old_c).astype(jnp.uint8)

    safe_idx = jnp.where(active_mask, active_idx, cfg.num_blocks)
    return state._replace(
        sdf=state.sdf.at[safe_idx].set(out_sdf, mode="drop"),
        weight=state.weight.at[safe_idx].set(out_w, mode="drop"),
        color=state.color.at[safe_idx].set(out_c, mode="drop"),
    )


# ---------------------------------------------------------------------------
# Garbage collection
# ---------------------------------------------------------------------------


def starve(state: MapState, active_idx, active_mask) -> MapState:
    """Decrement every active voxel weight by 1 (starveVoxelsKernel,
    CUDASceneRepHashSDF.cu:512-536), clamped at 0."""
    w = state.weight[active_idx]
    w = jnp.maximum(w - 1.0, 0.0)
    safe_idx = jnp.where(active_mask, active_idx,
                         state.weight.shape[0])
    return state._replace(weight=state.weight.at[safe_idx].set(w, mode="drop"))


def garbage_collect(state: MapState, active_idx, active_mask,
                    cfg: MapConfig) -> MapState:
    """Cull active blocks that are all-far or all-starved.

    garbageCollectIdentifyKernel (:543-590): flag a block when
    ``min |sdf| >= truncation(depth_max)`` or ``max weight == 0``
    (min/max over the 512 voxels, ignoring zero-weight voxels for the sdf
    min, which the reference achieves by giving them PINF). Flagged blocks
    are freed and zeroed (garbageCollectFreeKernel :608-628).
    """
    sdf = state.sdf[active_idx]
    w = state.weight[active_idx]
    inf = jnp.float32(jnp.inf)
    abs_sdf = jnp.where(w > 0.0, jnp.abs(sdf), inf)
    min_sdf = jnp.min(abs_sdf, axis=-1)
    max_w = jnp.max(w, axis=-1)
    t = cfg.truncation_at(cfg.max_integration_distance)
    cull = active_mask & ((min_sdf >= t) | (max_w == 0.0))
    return blockmap.delete_blocks(state, active_idx, cull, cfg)
