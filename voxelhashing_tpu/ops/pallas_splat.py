"""Pallas TPU kernel: projective surface splatting without XLA scatters.

The XLA splat renderer (:func:`voxelhashing_tpu.raycast.render_splat`)
pays one scatter-min over [S, 512] candidate slots (~8M updates at the
default operating point); XLA scatters run at ~100-200 M updates/s on this
chip, making the z-buffer scatter the single largest frame cost (~59 ms,
BASELINE.md). This kernel replaces the scatter with the same one-hot-MXU
trick the integrate gather kernel uses, in reverse:

For each surface block, its 512 voxels project into a small aligned screen
patch [32 rows x 256 cols]. Build one-hot matrices R[32,512] (row match)
and C[512,256] (column match); then

    count[i,j] = R @ C            -- voxels hitting patch cell (i,j)
    zsum[i,j]  = R @ (C * z)      -- their summed surface-depth predictions

so ``patch = zsum / count`` is the per-pixel AVERAGE projective-TSDF
surface prediction of this block (all in-band voxels along a pixel ray
predict the SAME surface depth, so averaging them is as valid as the
XLA path's min — and averages away per-voxel noise). Patches min-accumulate
into a VMEM-resident z-buffer across the sequential TPU grid (min across
blocks = occlusion, exactly the scatter-min semantics). Three tiny bf16
matmuls per block ride the MXU; no gathers, no scatters.

Depth precision: z is split into two bf16 limbs (hi + lo) so the matmul
accumulation carries f32-grade depth (~0.1 mm at 5 m).

Reference being replaced: the per-pixel ray marcher
/root/reference/DepthSensingCUDA/Source/CUDARayCastSDF.cu:18-57 (already
re-derived as splatting in raycast.py; this is its TPU kernel form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CameraConfig, MapConfig, RaycastConfig, SDF_BLOCK_SIZE, \
    VOXELS_PER_BLOCK
from .. import geometry as geom
from ..blockmap import MapState

_ROWS = 32      # patch rows (8-aligned v origin)
_COLS = 256     # patch cols (128-aligned u origin; spans <= 128 px fit)
_BATCH = 4      # blocks per grid step
_DV_INVALID = 63


def _splat_kernel(ns_ref, v0_ref, u0_ref, dv_ref, du_ref, zhi_ref, zlo_ref,
                  out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, jnp.inf)

    # The culled surface list is packed (real rows first): once the batch
    # start passes n_rows, every later grid step is padding — skip the
    # matmul body entirely (same scalar-prefetch trick as the integrate
    # kernel). The z-buffer init above still runs at i == 0.
    @pl.when(i * _BATCH < ns_ref[0])
    def _batch_body():
        _splat_batch(i, v0_ref, u0_ref, dv_ref, du_ref, zhi_ref, zlo_ref,
                     out_ref)


def _splat_batch(i, v0_ref, u0_ref, dv_ref, du_ref, zhi_ref, zlo_ref,
                 out_ref):
    riota = lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
    ciota = lax.broadcasted_iota(jnp.int32, (1, _COLS), 1)
    for k in range(_BATCH):
        b = i * _BATCH + k
        dv = dv_ref[k]                                   # [1,512] i32
        du = du_ref[k]                                   # [1,512]
        zhi = zhi_ref[k]                                 # [1,512] bf16
        zlo = zlo_ref[k]                                 # [1,512] bf16

        r = (dv == riota).astype(jnp.bfloat16)           # [32,512]
        du_c = jnp.transpose(du, (1, 0))                 # [512,1]
        c = (du_c == ciota).astype(jnp.bfloat16)         # [512,256]
        zhi_c = jnp.transpose(zhi, (1, 0))               # [512,1]
        zlo_c = jnp.transpose(zlo, (1, 0))

        dots = functools.partial(lax.dot_general,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        cnt = dots(r, c)                                 # [32,256] f32
        s_hi = dots(r, c * zhi_c)
        s_lo = dots(r, c * zlo_c)
        patch = jnp.where(cnt > 0.5, (s_hi + s_lo) / jnp.maximum(cnt, 1.0),
                          jnp.inf)

        v0 = pl.multiple_of(v0_ref[b], 8)
        u0 = pl.multiple_of(u0_ref[b], 128)
        cur = out_ref[pl.ds(v0, _ROWS), pl.ds(u0, _COLS)]
        out_ref[pl.ds(v0, _ROWS), pl.ds(u0, _COLS)] = jnp.minimum(cur, patch)


def _run_splat(n_rows, v0, u0, dv, du, zhi, zlo, hpad, wpad, interpret):
    s = dv.shape[0]
    sp = -(-s // _BATCH) * _BATCH
    if sp != s:
        dv = jnp.pad(dv, ((0, sp - s), (0, 0), (0, 0)),
                     constant_values=_DV_INVALID)
        du = jnp.pad(du, ((0, sp - s), (0, 0), (0, 0)))
        zhi = jnp.pad(zhi, ((0, sp - s), (0, 0), (0, 0)))
        zlo = jnp.pad(zlo, ((0, sp - s), (0, 0), (0, 0)))
        v0 = jnp.pad(v0, (0, sp - s))
        u0 = jnp.pad(u0, (0, sp - s))
    ns = jnp.asarray(n_rows, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(sp // _BATCH,),
        in_specs=[
            pl.BlockSpec((_BATCH, 1, VOXELS_PER_BLOCK),
                         lambda i, ns, v0, u0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH, 1, VOXELS_PER_BLOCK),
                         lambda i, ns, v0, u0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH, 1, VOXELS_PER_BLOCK),
                         lambda i, ns, v0, u0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BATCH, 1, VOXELS_PER_BLOCK),
                         lambda i, ns, v0, u0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hpad, wpad), lambda i, ns, v0, u0: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _splat_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
        interpret=interpret,
    )(ns, v0, u0, dv, du, zhi, zlo)


def splat_zbuf_pallas(state: MapState, sdf, wgt, sel_active, row_mask, view,
                      cam: CameraConfig, cfg: MapConfig,
                      interpret: bool = False, n_rows=None):
    """Pallas drop-in for :func:`voxelhashing_tpu.raycast._splat_zbuf`
    (tracking path, no color). Returns (zbuf f32[h*w] with +inf empty,
    n_clipped i32[] — in-band voxels dropped because their block's pixel
    footprint exceeded the 32x256 patch; ~0 beyond ~0.3 m depth).

    ``n_rows``: when the caller's row list is PACKED (all real rows before
    any padding, as the surface cull produces), the true row count — grid
    steps past it skip the matmul body. None = process every row.
    """
    h, w = cam.height, cam.width
    hpad = max(-(-h // 8) * 8, _ROWS)
    wpad = max(-(-w // 128) * 128 + 128, _COLS)
    vs = cfg.voxel_size

    # ---- XLA prep: project, patch-relative coords (elementwise only) ----
    blocks = geom.unpack_block_key(state.block_key[sel_active],
                                   cfg.world_blocks)              # [S,3]
    base = geom.block_to_voxel(blocks)
    offs = np.arange(VOXELS_PER_BLOCK, dtype=np.int32)
    ox = jnp.asarray(offs % SDF_BLOCK_SIZE)
    oy = jnp.asarray((offs // SDF_BLOCK_SIZE) % SDF_BLOCK_SIZE)
    oz = jnp.asarray(offs // (SDF_BLOCK_SIZE * SDF_BLOCK_SIZE))
    wx = (base[:, 0:1] + ox[None, :]).astype(jnp.float32) * vs    # [S,512]
    wy = (base[:, 1:2] + oy[None, :]).astype(jnp.float32) * vs
    wz = (base[:, 2:3] + oz[None, :]).astype(jnp.float32) * vs
    r, t = view[:3, :3], view[:3, 3]
    px = r[0, 0] * wx + r[0, 1] * wy + r[0, 2] * wz + t[0]
    py = r[1, 0] * wx + r[1, 1] * wy + r[1, 2] * wz + t[1]
    pz = r[2, 0] * wx + r[2, 1] * wy + r[2, 2] * wz + t[2]

    surface = (wgt > 0.0) & (jnp.abs(sdf) < vs) & row_mask[:, None]
    z_surf = pz + sdf
    safe_z = jnp.where(pz == 0.0, 1e-12, pz)
    ui = jnp.floor(px * cam.fx / safe_z + cam.cx + 0.5).astype(jnp.int32)
    vi = jnp.floor(py * cam.fy / safe_z + cam.cy + 0.5).astype(jnp.int32)
    ok = (surface & (pz > 0.0)
          & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
          & (z_surf > cam.depth_min) & (z_surf < cam.depth_max))

    vmin = jnp.min(jnp.where(ok, vi, h), axis=1)                   # [S]
    umin = jnp.min(jnp.where(ok, ui, w), axis=1)
    v0 = jnp.clip((vmin // 8) * 8, 0, hpad - _ROWS)
    u0 = jnp.clip((umin // 128) * 128, 0, wpad - _COLS)

    dv = vi - v0[:, None]
    du = ui - u0[:, None]
    in_patch = (dv >= 0) & (dv < _ROWS) & (du >= 0) & (du < _COLS)
    n_clipped = jnp.sum((ok & ~in_patch).astype(jnp.int32))
    ok &= in_patch
    dv = jnp.where(ok, dv, _DV_INVALID).astype(jnp.int32)
    du = jnp.where(ok, du, 0).astype(jnp.int32)
    z = jnp.where(ok, z_surf, 0.0)
    zhi = z.astype(jnp.bfloat16)
    zlo = (z - zhi.astype(jnp.float32)).astype(jnp.bfloat16)

    s = sel_active.shape[0]
    if n_rows is None:
        n_rows = jnp.int32(s)
    zbuf = _run_splat(n_rows, v0.astype(jnp.int32), u0.astype(jnp.int32),
                      dv.reshape(s, 1, VOXELS_PER_BLOCK),
                      du.reshape(s, 1, VOXELS_PER_BLOCK),
                      zhi.reshape(s, 1, VOXELS_PER_BLOCK),
                      zlo.reshape(s, 1, VOXELS_PER_BLOCK),
                      hpad, wpad, interpret)
    return zbuf[:h, :w].reshape(-1), n_clipped
