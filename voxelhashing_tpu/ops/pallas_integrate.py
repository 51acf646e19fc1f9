"""Pallas TPU kernels: per-block TSDF fusion (the integrate hot loop).

The XLA formulation of ``integrateDepthMapKernel`` (reference:
/root/reference/DepthSensingCUDA/Source/CUDASceneRepHashSDF.cu:412-492)
needs two random image gathers per voxel — ~27M scalar gathers per frame,
which XLA lowers to a ~130 M elem/s serial loop (~300 ms/frame).  This
pipeline removes the scalar gathers entirely.  Three phases:

1. **XLA prep** (good [G,512] layouts, pure elementwise): project every
   voxel of every active block, producing a per-voxel patch-local index
   ``q = dv*256 + du`` (or -1 for invalid) and per-block aligned patch
   origins (v0, u0) into a channel-interleaved bf16 frame image
   ``[h, 6*w]`` (depth in two bf16 limbs for f32-grade precision; color
   channels; invalid pixels carry depth 0).

2. **Kernel A (gather)**: grid over active blocks; per block slice a
   [32, 256] patch from the VMEM-resident image, select each voxel's patch
   row with a one-hot [512,32] @ patch MXU matmul (exact selection), then
   pick its column with per-lane ``tpu.dynamic_gather`` passes — lanes 0-5
   of the result hold the 6 interleaved channels.  Output: [G, 512, 8].

3. **XLA fusion**: with the gathers gone, the ``combineVoxel`` rule
   (weighted sdf average, weight clamp, 50/50 color blend,
   VoxelUtilHashSDF.h:228-250) is pure elementwise math on compact
   row-gathered [G,512] arrays — full VPU layout — followed by a row
   scatter back into the pool.  No second kernel needed.

The XLA path (:func:`voxelhashing_tpu.integrate.integrate`) remains the
portable reference implementation (CPU tests, interpret-mode equivalence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CameraConfig, MapConfig, SDF_BLOCK_SIZE, VOXELS_PER_BLOCK
from .. import geometry as geom
from ..blockmap import MapState

_PATCH_ROWS = 32     # image rows per block patch (footprint at z>=0.26m)
_PATCH_COLS = 256    # interleaved cols: 6*footprint + 128 alignment slack
_NCH = 6             # d_hi, d_lo, r, g, b, (pad)
_LANE = 128

# dynamic_gather along lanes: out[i,j] = x[i, idx[i,j]]
_DNUMS_LANE = lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _lane_gather(x, idx):
    return lax.gather(x, idx[..., None], _DNUMS_LANE, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


# ---------------------------------------------------------------------------
# Kernel A: per-block patch gather
# ---------------------------------------------------------------------------


_BATCH_A = 4     # blocks per grid step (amortises per-step overhead)


def _gather_kernel(v0_ref, u0_ref, img_ref, q_ref, out_ref):
    i = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (VOXELS_PER_BLOCK, _LANE), 1)
    lane8 = lane % 8
    riota = lax.broadcasted_iota(jnp.int32, (_PATCH_ROWS, 1), 0)
    for k in range(_BATCH_A):
        b = i * _BATCH_A + k
        v0 = pl.multiple_of(v0_ref[b], 8)
        u0 = pl.multiple_of(u0_ref[b], 128)
        patch = img_ref[pl.ds(v0, _PATCH_ROWS), pl.ds(u0, _PATCH_COLS)]

        # q lives voxel-on-LANES ([1,512]; a [512,1] layout would be
        # lane-padded 128x in HBM — gigabytes of phantom traffic)
        q = q_ref[k, :, :]                               # [1,512] int32
        invalid = q < 0
        qc = jnp.where(invalid, 0, q)
        # dv sentinel -> one-hot column all-zero -> channels read as 0
        dv = jnp.where(invalid, _PATCH_ROWS + 1, qc >> 8)    # [1,512]
        du = qc & (_PATCH_COLS - 1)                          # [1,512]

        oh_t = (dv == riota).astype(jnp.bfloat16)        # [32,512]
        # sel[v,u] = sum_r oh_t[r,v] * patch[r,u]  (contract dim 0 x dim 0)
        sel = lax.dot_general(oh_t, patch, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [512,256]

        # column pick: lane j of the result reads channel j (j<6)
        du_col = jnp.transpose(du, (1, 0))               # [512,1]
        idx = du_col + lane8                             # [512,128]
        lo = idx & (_LANE - 1)
        hi = idx >> 7                                    # 0 or 1
        g0 = _lane_gather(sel[:, :_LANE], lo)
        g1 = _lane_gather(sel[:, _LANE:], lo)
        res = jnp.where(hi == 0, g0, g1)                 # [512,128]
        # channel-major [8,512] output tile (no lane padding in HBM)
        out_ref[k] = jnp.transpose(res[:, :8], (1, 0))


def _run_gather(img, q, v0, u0, g, interpret):
    # Pad the block count up to a multiple of the per-step batch so the
    # last g % _BATCH_A active blocks are never silently skipped (padding
    # rows carry q = -1 -> all-invalid -> zero output, masked by is_real).
    gp = -(-g // _BATCH_A) * _BATCH_A
    if gp != g:
        q = jnp.pad(q, ((0, gp - g), (0, 0), (0, 0)), constant_values=-1)
        v0 = jnp.pad(v0, (0, gp - g))
        u0 = jnp.pad(u0, (0, gp - g))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gp // _BATCH_A,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i, v0, u0: (0, 0),
                         memory_space=pltpu.VMEM),          # resident image
            pl.BlockSpec((_BATCH_A, 1, VOXELS_PER_BLOCK),
                         lambda i, v0, u0: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # q per batch
        ],
        out_specs=pl.BlockSpec((_BATCH_A, 8, VOXELS_PER_BLOCK),
                               lambda i, v0, u0: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gp, 8, VOXELS_PER_BLOCK),
                                       jnp.float32),
        interpret=interpret,
    )(v0, u0, img, q)
    return out[:g]


# ---------------------------------------------------------------------------
# XLA prep + orchestration
# ---------------------------------------------------------------------------


def _prep_image(depth, color, cam: CameraConfig):
    """Channel-interleaved bf16 image [h, 6*w (lane-padded)].

    Per pixel: (d_hi, d_lo, r, g, b, 0) — depth split into bf16 limbs;
    pixels with invalid depth OR invalid color carry depth 0 (which the
    fuse kernel treats as "no update", merging the two validity masks).
    """
    h, w = cam.height, cam.width
    ok = jnp.isfinite(depth) & (depth > 0.0)
    if color is not None:
        ok &= jnp.all(jnp.isfinite(color), axis=-1) \
            & jnp.all(color >= 0.0, axis=-1)
        c = jnp.where(jnp.isfinite(color), color, 0.0) * 255.0
        cr, cg, cb = c[..., 0], c[..., 1], c[..., 2]
    else:
        cr = jnp.zeros((h, w)); cg = jnp.full((h, w), 255.0)
        cb = jnp.zeros((h, w))
    d = jnp.where(ok, depth, 0.0)
    d_hi = d.astype(jnp.bfloat16)
    d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    chans = jnp.stack([d_hi, d_lo, cr.astype(jnp.bfloat16),
                       cg.astype(jnp.bfloat16), cb.astype(jnp.bfloat16),
                       jnp.zeros((h, w), jnp.bfloat16)], axis=-1)
    img = chans.reshape(h, w * _NCH)                 # interleaved
    total = -(-w * _NCH // _LANE) * _LANE
    return jnp.pad(img, ((0, 0), (0, total - w * _NCH)))


def integrate_pallas(state: MapState, depth, color, pose,
                     cam: CameraConfig, cfg: MapConfig,
                     active_idx, n_active, interpret: bool = False
                     ) -> MapState:
    """Drop-in replacement for :func:`voxelhashing_tpu.integrate.integrate`
    (Pallas TPU path). ``active_idx`` is the compacted in-frustum block
    list (padded), ``n_active`` its true length."""
    h, w = cam.height, cam.width
    g = active_idx.shape[0]
    n = cfg.num_blocks
    view = geom.invert_rigid(pose)
    img = _prep_image(depth, color, cam)
    img_cols = img.shape[1]

    # ---- XLA prep: per-voxel q index + per-block patch origins ----------
    blocks = geom.unpack_block_key(state.block_key[active_idx],
                                   cfg.world_blocks)        # [G,3]
    base = geom.block_to_voxel(blocks)
    offs = np.arange(VOXELS_PER_BLOCK, dtype=np.int32)
    ox = jnp.asarray(offs % SDF_BLOCK_SIZE)
    oy = jnp.asarray((offs // SDF_BLOCK_SIZE) % SDF_BLOCK_SIZE)
    oz = jnp.asarray(offs // (SDF_BLOCK_SIZE * SDF_BLOCK_SIZE))
    vs = cfg.voxel_size
    wx = (base[:, 0:1] + ox[None, :]).astype(jnp.float32) * vs   # [G,512]
    wy = (base[:, 1:2] + oy[None, :]).astype(jnp.float32) * vs
    wz = (base[:, 2:3] + oz[None, :]).astype(jnp.float32) * vs
    r, t = view[:3, :3], view[:3, 3]
    px = r[0, 0] * wx + r[0, 1] * wy + r[0, 2] * wz + t[0]
    py = r[1, 0] * wx + r[1, 1] * wy + r[1, 2] * wz + t[1]
    pz = r[2, 0] * wx + r[2, 1] * wy + r[2, 2] * wz + t[2]
    safe_z = jnp.where(pz == 0.0, 1e-12, pz)
    ui = jnp.floor(px * cam.fx / safe_z + cam.cx + 0.5).astype(jnp.int32)
    vi = jnp.floor(py * cam.fy / safe_z + cam.cy + 0.5).astype(jnp.int32)
    on = ((ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (pz > 0.0))

    # per-block aligned patch origins from per-voxel extrema
    vmin = jnp.min(jnp.where(on, vi, h), axis=1)               # [G]
    umin = jnp.min(jnp.where(on, ui, w), axis=1)
    v0 = jnp.clip((vmin // 8) * 8, 0, h - _PATCH_ROWS)
    u0 = jnp.clip((umin * _NCH // _LANE) * _LANE, 0,
                  img_cols - _PATCH_COLS)

    dv = vi - v0[:, None]
    du = ui * _NCH - u0[:, None]
    q_ok = on & (dv >= 0) & (dv < _PATCH_ROWS) \
        & (du >= 0) & (du < _PATCH_COLS - (_NCH - 1))
    q = jnp.where(q_ok, dv * _PATCH_COLS + du, -1).astype(jnp.int32)
    q = q.reshape(g, 1, VOXELS_PER_BLOCK)

    # ---- Kernel A: gather channels ------------------------------------
    chans = _run_gather(img, q, v0.astype(jnp.int32), u0.astype(jnp.int32),
                        g, interpret)                       # [G,8,512] f32

    # channel extraction slices a MAJOR dim (no lane padding)
    d = chans[:, 0, :] + chans[:, 1, :]                     # [G,512]
    cr = chans[:, 2, :]
    cg = chans[:, 3, :]
    cb = chans[:, 4, :]

    # ---- XLA fusion on compact rows (elementwise, full VPU layout) -----
    # combineVoxel (VoxelUtilHashSDF.h:228-250)
    is_real = (jnp.arange(g) < n_active)[:, None]
    d_valid = d > 0.0
    sdf_new = d - pz
    trunc = cfg.truncation + cfg.truncation_scale * d
    update = (is_real & d_valid
              & (d < cfg.max_integration_distance)
              & (sdf_new > -trunc))
    sdf_new = jnp.clip(sdf_new, -trunc, trunc)
    depth01 = (d - cam.depth_min) / (cam.depth_max - cam.depth_min)
    w_new = jnp.maximum(
        cfg.integration_weight_sample * 1.5 * (1.0 - depth01), 1.0)

    old_sdf = state.sdf[active_idx]                         # row gathers
    old_w = state.weight[active_idx]
    old_c = state.color[active_idx]
    o_r = ((old_c >> 16) & 0xFF).astype(jnp.float32)
    o_g = ((old_c >> 8) & 0xFF).astype(jnp.float32)
    o_b = (old_c & 0xFF).astype(jnp.float32)

    w_sum = old_w + w_new
    f_sdf = (old_sdf * old_w + sdf_new * w_new) / w_sum
    f_w = jnp.minimum(w_sum, cfg.integration_weight_max)
    f_r = jnp.floor(0.5 * o_r + 0.5 * cr + 0.5)
    f_g = jnp.floor(0.5 * o_g + 0.5 * cg + 0.5)
    f_b = jnp.floor(0.5 * o_b + 0.5 * cb + 0.5)
    f_c = ((jnp.clip(f_r, 0, 255).astype(jnp.uint32) << 16)
           | (jnp.clip(f_g, 0, 255).astype(jnp.uint32) << 8)
           | jnp.clip(f_b, 0, 255).astype(jnp.uint32))

    out_sdf = jnp.where(update, f_sdf, old_sdf)
    out_w = jnp.where(update, f_w, old_w)
    out_c = jnp.where(update, f_c, old_c)

    safe_idx = jnp.where(jnp.arange(g) < n_active,
                         active_idx.astype(jnp.int32), jnp.int32(n))
    return state._replace(
        sdf=state.sdf.at[safe_idx].set(out_sdf, mode="drop"),
        weight=state.weight.at[safe_idx].set(out_w, mode="drop"),
        color=state.color.at[safe_idx].set(out_c, mode="drop"))
