"""Per-frame reconstruction over the DENSE voxel grid (§2.9 baseline).

The original DX11 app ran the same preprocess -> raycast -> ICP ->
integrate loop against the dense grid before the sparse hash existed
(/root/reference/DepthSensing/Source/DX11SceneRep.h:27 dense scene rep;
DX11RayCasting + DX11CameraTrackingMultiRes + DX11VoxelGridOperations).
This module is that loop for :mod:`voxelhashing_tpu.densegrid`, reusing
the SAME tracker (:func:`tracking.track` consumes model point/normal maps
regardless of which scene rep rendered them) and the same preprocessing.

One jit-able device program per frame, like :func:`engine.step`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import CameraConfig, EngineConfig
from . import densegrid, tracking
from .densegrid import DenseGrid, DenseGridConfig
from .ops.image import preprocess
from .tracking import TrackingResult


class DenseEngineState(NamedTuple):
    grid: DenseGrid
    pose: jax.Array           # f32[4,4]
    frame: jax.Array          # i32[]
    tracking_lost: jax.Array  # bool[]


def create(grid_cfg: DenseGridConfig, initial_pose=None) -> DenseEngineState:
    pose = jnp.eye(4, dtype=jnp.float32) if initial_pose is None \
        else jnp.asarray(initial_pose, jnp.float32)
    return DenseEngineState(grid=densegrid.create(grid_cfg), pose=pose,
                            frame=jnp.int32(0),
                            tracking_lost=jnp.array(False))


def step(state: DenseEngineState, depth_raw, color_raw, cfg: EngineConfig,
         grid_cfg: DenseGridConfig, pose_hint=None
         ) -> Tuple[DenseEngineState, TrackingResult]:
    """One frame: preprocess -> dense raycast -> ICP -> dense integrate."""
    cam = cfg.camera
    frame = preprocess(depth_raw, color_raw, cam, cfg.filter)
    is_first = state.frame == 0

    if cfg.use_trajectory and pose_hint is not None:
        pose = jnp.asarray(pose_hint, jnp.float32)
        zstats, zcurve = tracking.empty_stats(cfg.tracker)
        tr = TrackingResult(pose=pose, valid=jnp.array(True),
                            residual=jnp.float32(0.0),
                            corr_count=jnp.int32(0),
                            condition=jnp.float32(0.0),
                            level_stats=zstats, iter_residuals=zcurve)
    else:
        model = densegrid.render(state.grid, grid_cfg, state.pose, cam,
                                 num_samples=cfg.raycast.num_samples)
        tr = tracking.track(frame.points, frame.normals,
                            model.points, model.normals,
                            state.pose, cam, cfg.tracker)
        tr = tr._replace(
            pose=jnp.where(is_first, state.pose, tr.pose),
            valid=tr.valid | is_first)

    def do_integrate(g):
        return densegrid.integrate(g, grid_cfg, frame.depth, frame.color,
                                   tr.pose, cam)

    grid = jax.lax.cond(tr.valid, do_integrate, lambda g: g, state.grid)
    return DenseEngineState(grid=grid, pose=tr.pose, frame=state.frame + 1,
                            tracking_lost=~tr.valid), tr


@functools.lru_cache(maxsize=4)
def make_step(cfg: EngineConfig, grid_cfg: DenseGridConfig,
              with_hint: bool = False, donate: bool = True):
    """jit-compiled dense step for fixed configs."""
    if with_hint:
        def fn(state, depth, color, hint):
            return step(state, depth, color, cfg, grid_cfg, pose_hint=hint)
    else:
        def fn(state, depth, color):
            return step(state, depth, color, cfg, grid_cfg)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
