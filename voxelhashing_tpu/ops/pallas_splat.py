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

v2 (round 2): the whole projection runs IN-KERNEL from a per-block base
point + shared affine offset table (the integrate kernel's decomposition,
``p[v] = pb + A·off[v]``), batched on full-vreg [B,512] tiles — the
[S,512] XLA projection pass and its four HBM index/limb tensors are gone;
the kernel consumes the same row-gathered sdf/weight the surface cull
already produced. Padding rows ride a pb sentinel (off-screen), and the
clipped-voxel count accumulates in SMEM.

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
_BATCH = 8      # blocks per grid step
_DV_INVALID = 63
_PB_SENTINEL = 1.0e9  # pb for padded/masked rows -> off-screen -> no splat


def _make_kernel(cam: CameraConfig, cfg: MapConfig, hpad: int, wpad: int):
    h, w = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    dmin, dmax = cam.depth_min, cam.depth_max
    vs = cfg.voxel_size

    def kernel(ns_ref, pb_ref, win_ref, a_ref, sdf_ref, wgt_ref,
               out_ref, cnt_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, jnp.inf)
            cnt_ref[0] = jnp.int32(0)

        # Packed culled rows: skip whole batches past n_rows (the z-buffer
        # init above still runs at i == 0).
        @pl.when(i * _BATCH < ns_ref[0])
        def _batch():
            _body(pb_ref, win_ref, a_ref, sdf_ref, wgt_ref, out_ref,
                  cnt_ref)

    def _body(pb_ref, win_ref, a_ref, sdf_ref, wgt_ref, out_ref, cnt_ref):
        # --- phase A: batched projection + patch coords [B,512] ----------
        pbx = pb_ref[:, 0:1]
        pby = pb_ref[:, 1:2]
        pbz = pb_ref[:, 2:3]                              # [B,1] f32
        px = pbx + a_ref[0:1, :]
        py = pby + a_ref[1:2, :]
        pz = pbz + a_ref[2:3, :]                          # [B,512]
        sdf = sdf_ref[:, :].astype(jnp.float32)           # POOL_DTYPE rows
        wgt = wgt_ref[:, :].astype(jnp.float32)
        surface = (wgt > 0.0) & (jnp.abs(sdf) < vs)
        z_surf = pz + sdf
        safe_z = jnp.where(pz == 0.0, 1e-12, pz)
        ui = jnp.floor(px * fx / safe_z + cx + 0.5).astype(jnp.int32)
        vi = jnp.floor(py * fy / safe_z + cy + 0.5).astype(jnp.int32)
        ok = (surface & (pz > 0.0)
              & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
              & (z_surf > dmin) & (z_surf < dmax))
        # window origins XLA-precomputed from the block's 8 lattice corners
        # (full-block span contains the surface subset; see
        # pallas_integrate's corner-window note)
        v0v = win_ref[:, 0:1]                             # [B,1] i32
        u0v = win_ref[:, 1:2]
        dv = vi - v0v
        du = ui - u0v
        in_patch = (dv >= 0) & (dv < _ROWS) & (du >= 0) & (du < _COLS)
        cnt_ref[0] += jnp.sum((ok & ~in_patch).astype(jnp.int32))
        okp = ok & in_patch
        dv = jnp.where(okp, dv, _DV_INVALID)
        du = jnp.where(okp, du, 0)
        z = jnp.where(okp, z_surf, 0.0)
        zhi = z.astype(jnp.bfloat16)
        zlo = (z - zhi.astype(jnp.float32)).astype(jnp.bfloat16)

        riota = lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
        ciota_c = lax.broadcasted_iota(jnp.int32, (_COLS, 1), 0)
        # NT contraction (both operands carry voxels on LANES): the column
        # one-hot is built directly as cT[j, v] = (du_v == j) from the
        # [1,512] du row — no [B,512]->[512,B] relayout transposes for
        # du/zhi/zlo (3 per batch in kernel v2).
        dots_nt = functools.partial(lax.dot_general,
                                    dimension_numbers=(((1,), (1,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.float32)

        # --- phase B: per-block one-hot matmuls + z-buffer min -----------
        for k in range(_BATCH):
            r = (dv[k:k + 1, :] == riota).astype(jnp.bfloat16)    # [32,512]
            ct = (du[k:k + 1, :] == ciota_c).astype(jnp.bfloat16)  # [256,512]
            cnt = dots_nt(r, ct)                                  # [32,256]
            # z limbs ride the ROW one-hot (s[i,j] = sum_v r[i,v] z_v
            # ct[j,v] associates either way; r entries are exact 0/1 so
            # results are bit-identical) — [32,512] elementwise instead of
            # [256,512], the phase-B VPU cost driver (one-hot build +
            # z-multiplies dominate; the matmuls themselves are MXU-idle)
            s_hi = dots_nt(r * zhi[k:k + 1, :], ct)
            s_lo = dots_nt(r * zlo[k:k + 1, :], ct)
            patch = jnp.where(cnt > 0.5,
                              (s_hi + s_lo) / jnp.maximum(cnt, 1.0),
                              jnp.inf)

            v0 = pl.multiple_of(win_ref[k, 0], 8)
            u0 = pl.multiple_of(win_ref[k, 1], 128)
            cur = out_ref[pl.ds(v0, _ROWS), pl.ds(u0, _COLS)]
            out_ref[pl.ds(v0, _ROWS), pl.ds(u0, _COLS)] = \
                jnp.minimum(cur, patch)

    return kernel


def _run_splat(n_rows, pb, win, aff, sdf, wgt, cam, cfg, hpad, wpad,
               interpret):
    s = sdf.shape[0]
    sp = -(-s // _BATCH) * _BATCH
    if sp != s:
        pb = jnp.pad(pb, ((0, sp - s), (0, 0)),
                     constant_values=_PB_SENTINEL)
        win = jnp.pad(win, ((0, sp - s), (0, 0)))
        sdf = jnp.pad(sdf, ((0, sp - s), (0, 0)))
        wgt = jnp.pad(wgt, ((0, sp - s), (0, 0)))
    ns = jnp.asarray(n_rows, jnp.int32).reshape(1)
    row_spec = pl.BlockSpec((_BATCH, VOXELS_PER_BLOCK),
                            lambda i, ns: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // _BATCH,),
        in_specs=[
            pl.BlockSpec((_BATCH, 8), lambda i, ns: (i, 0),
                         memory_space=pltpu.VMEM),        # pb per batch
            pl.BlockSpec((_BATCH, 8), lambda i, ns: (i, 0),
                         memory_space=pltpu.VMEM),        # window origins
            pl.BlockSpec((3, VOXELS_PER_BLOCK), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),        # affine table
            row_spec, row_spec,                           # sdf / weight rows
        ],
        out_specs=[
            pl.BlockSpec((hpad, wpad), lambda i, ns: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    kernel = _make_kernel(cam, cfg, hpad, wpad)
    zbuf, nclip = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)],
        interpret=interpret,
    )(ns, pb, win, aff, sdf, wgt)
    return zbuf, nclip[0]


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
    ``row_mask`` rows set False are disabled via the pb sentinel.
    """
    h, w = cam.height, cam.width
    hpad = max(-(-h // 8) * 8, _ROWS)
    wpad = max(-(-w // 128) * 128 + 128, _COLS)
    vs = cfg.voxel_size
    s = sel_active.shape[0]

    # ---- XLA prep: per-block base point + shared affine table ([S] ops) --
    blocks = geom.unpack_block_key(state.block_key[sel_active],
                                   cfg.world_blocks)              # [S,3]
    base = geom.block_to_voxel(blocks).astype(jnp.float32) * vs
    r, t = view[:3, :3], view[:3, 3]
    pbx = r[0, 0] * base[:, 0] + r[0, 1] * base[:, 1] \
        + r[0, 2] * base[:, 2] + t[0]                             # [S]
    pby = r[1, 0] * base[:, 0] + r[1, 1] * base[:, 1] \
        + r[1, 2] * base[:, 2] + t[1]
    pbz = r[2, 0] * base[:, 0] + r[2, 1] * base[:, 1] \
        + r[2, 2] * base[:, 2] + t[2]
    pb = jnp.stack([jnp.where(row_mask, pbx, _PB_SENTINEL),
                    jnp.where(row_mask, pby, _PB_SENTINEL),
                    jnp.where(row_mask, pbz, _PB_SENTINEL)], axis=1)
    pb = jnp.pad(pb, ((0, 0), (0, 8 - 3)))                        # [S,8]

    offs = np.arange(VOXELS_PER_BLOCK, dtype=np.int32)
    ox = jnp.asarray(offs % SDF_BLOCK_SIZE, jnp.float32) * vs
    oy = jnp.asarray((offs // SDF_BLOCK_SIZE) % SDF_BLOCK_SIZE,
                     jnp.float32) * vs
    oz = jnp.asarray(offs // (SDF_BLOCK_SIZE * SDF_BLOCK_SIZE),
                     jnp.float32) * vs
    aff = jnp.stack([r[0, 0] * ox + r[0, 1] * oy + r[0, 2] * oz,
                     r[1, 0] * ox + r[1, 1] * oy + r[1, 2] * oz,
                     r[2, 0] * ox + r[2, 1] * oy + r[2, 2] * oz], axis=0)

    # ---- per-block patch-window origins from the 8 lattice corners ------
    # (same construction as pallas_integrate: projection extrema of a box
    # are at its corners; screen-edge corners clip to the viewport first)
    cids = np.array([0, 7, 56, 63, 448, 455, 504, 511], np.int32)
    pxc = pb[:, 0:1] + aff[0, cids][None, :]                      # [S,8]
    pyc = pb[:, 1:2] + aff[1, cids][None, :]
    pzc = pb[:, 2:3] + aff[2, cids][None, :]
    safe_zc = jnp.where(pzc == 0.0, 1e-12, pzc)
    uic = jnp.floor(pxc * cam.fx / safe_zc + cam.cx + 0.5).astype(jnp.int32)
    vic = jnp.floor(pyc * cam.fy / safe_zc + cam.cy + 0.5).astype(jnp.int32)
    uic = jnp.clip(uic, 0, w - 1)
    vic = jnp.clip(vic, 0, h - 1)
    v0 = jnp.clip((jnp.min(vic, axis=1) // 8) * 8, 0, hpad - _ROWS)
    u0 = jnp.clip((jnp.min(uic, axis=1) // 128) * 128, 0, wpad - _COLS)
    win = jnp.pad(jnp.stack([v0, u0], axis=1), ((0, 0), (0, 8 - 2)))

    if n_rows is None:
        n_rows = jnp.int32(s)
    zbuf, n_clipped = _run_splat(n_rows, pb, win, aff, sdf, wgt, cam, cfg,
                                 hpad, wpad, interpret)
    return zbuf[:h, :w].reshape(-1), n_clipped
