"""Pallas TPU kernel: per-block TSDF fusion sampling (the integrate hot loop).

The XLA formulation of ``integrateDepthMapKernel`` (reference:
/root/reference/DepthSensingCUDA/Source/CUDASceneRepHashSDF.cu:412-492)
needs two random image gathers per voxel — ~27M scalar gathers per frame,
which XLA lowers to a ~130 M elem/s serial loop (~300 ms/frame).  This
kernel removes the scalar gathers entirely; the whole sampling pass
(projection included) runs per active block on VMEM-resident data:

1. **Affine projection in-kernel.** For a rigid block, camera-space voxel
   positions decompose as ``p[v] = pb + A·off[v]``: a per-block base point
   ``pb`` (3 floats, XLA-precomputed) plus a per-frame affine table
   ``a[·][512]`` shared by every block.  Projection is then a handful of
   [B,512] broadcast ops — no [G,512] XLA prep pass, no q/index arrays in
   HBM.

2. **Folded-patch pick, gather-free.** Each block's 512 voxels sample a
   [32 x 512] window of the 8-channel-interleaved bf16 image (d_hi, d_lo,
   r, g, b, 0, 0, 0 per pixel — depth split into two bf16 limbs for
   f32-grade precision).  The window's four 128-lane chunks are stacked
   on sublanes into a [128, 128] tile; a TRANSPOSED one-hot MXU matmul
   (``dot(pstack, oh)``) picks each voxel's (row, chunk) pair with the
   voxels on LANES, and the per-voxel column pick is a masked stride-8
   sublane fold — channel c lands at sublane c for every voxel because
   the 8-channel interleave keeps lane offsets multiples of 8.  No
   ``tpu.dynamic_gather`` anywhere (the round-2 kernel used one and its
   forced [512,128] output was the frame-time floor).

3. **combineVoxel in-kernel.** The fusion rule (weighted sdf average,
   weight clamp, 50/50 color blend, VoxelUtilHashSDF.h:228-250) runs
   inside the kernel on the freshly sampled values against row-gathered
   old pool rows — the sampled-channel tensor never round-trips HBM and
   the whole integrate is one kernel + a row gather/scatter pair. Color
   rides as bitcast i32 (no u32<->f32 casts on this chip).

Known deviation (documented in STATUS.md): voxels whose block footprint
exceeds the 32-row patch window (blocks closer than ~0.26 m) skip the
update for that frame — ~1e-6 of voxels at the default operating point.

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

_PATCH_ROWS = 32     # image rows per block patch (footprint fits at z>=0.26m)
_NCH = 8             # d_hi, d_lo, r, g, b, pad, pad, pad (lane-aligned group)
_LANE = 128
_PATCH_COLS = 512    # interleaved cols per window (64 px x 8 channels)
_FOLD = _PATCH_COLS // _LANE          # lane chunks stacked on sublanes
_ROWS_FOLD = _PATCH_ROWS * _FOLD      # one-hot row count after folding
_BATCH_A = 16        # blocks per grid step
_PB_SENTINEL = 1.0e9  # pb for padded blocks -> off-screen -> no update

def split_bf16_limbs(x):
    """f32 -> (hi bf16, lo bf16) with hi + lo == x to ~2^-17 relative.

    MUST be done by bit masking: the naive ``lo = x - bf16(x)`` gets
    algebraically simplified by XLA:TPU on real hardware (the upcast
    convert folds into the subtract, which then cancels) and returns
    lo == 0 — silently downgrading every "two-limb f32" to single bf16.
    Caught by scripts/verify_tpu.py; keep this the only split used in
    XLA-level code (in-kernel Mosaic splits are compiled differently and
    verified separately).
    """
    u = lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = lax.bitcast_convert_type(u & np.uint32(0xFFFF0000),
                                      jnp.float32)
    # hi_f32's mantissa fits bf16 exactly -> conversion is lossless
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Fused projection + patch-gather kernel
# ---------------------------------------------------------------------------


def _make_kernel(cam: CameraConfig, cfg: MapConfig, wcols: int,
                 copy_tail: bool = False):
    h, w = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    dmin, dmax = cam.depth_min, cam.depth_max
    maxdist = cfg.max_integration_distance
    trunc0, ts = cfg.truncation, cfg.truncation_scale
    iws = cfg.integration_weight_sample
    wcap = cfg.integration_weight_max

    vsz = cfg.voxel_size

    def kernel(nact_ref, img_ref, pb_ref, win_ref, a_ref, osdf_ref, ow_ref,
               oc_ref, nsdf_ref, nw_ref, nc_ref, nstat_ref,
               dsc, rsc, gsc, bsc):
        # Compacted active lists are packed: every block of this batch is
        # past n_active -> skip the whole body. Sparse mode: out rows are
        # garbage, the fusion scatter drops rows >= n_active via safe_idx.
        # Dense (slice-path) mode: out rows ARE written back wholesale, so
        # tail steps must pass the old rows through (copy_tail).
        i = pl.program_id(0)

        @pl.when(i * _BATCH_A < nact_ref[0])
        def _body():
            _kernel_body(img_ref, pb_ref, win_ref, a_ref, osdf_ref, ow_ref,
                         oc_ref, nsdf_ref, nw_ref, nc_ref, nstat_ref,
                         dsc, rsc, gsc, bsc)

        if copy_tail:
            @pl.when(i * _BATCH_A >= nact_ref[0])
            def _tail():
                osdf = osdf_ref[:, :]
                ow = ow_ref[:, :]
                nsdf_ref[:, :] = osdf
                nw_ref[:, :] = ow
                nc_ref[:, :] = oc_ref[:, :]
                of = osdf.astype(jnp.float32)
                wf = ow.astype(jnp.float32)
                abs_s = jnp.abs(of)
                sflag = jnp.any((wf > 0.0) & (abs_s < vsz), axis=1,
                                keepdims=True).astype(jnp.float32)
                min_s = jnp.min(jnp.where(wf > 0.0, abs_s, jnp.inf),
                                axis=1, keepdims=True)
                max_w = jnp.max(wf, axis=1, keepdims=True)
                nstat_ref[:, :] = jnp.concatenate(
                    [sflag, min_s, max_w, jnp.zeros_like(sflag)], axis=1)

    def _kernel_body(img_ref, pb_ref, win_ref, a_ref, osdf_ref, ow_ref,
                     oc_ref, nsdf_ref, nw_ref, nc_ref, nstat_ref,
                     dsc, rsc, gsc, bsc):
        # Layout discipline: everything that CAN be phrased per-batch runs
        # on [B,512] full-vreg tiles (a [1,512] op wastes 7/8 of every
        # vreg's sublanes); only the patch slice, one-hot matmul and
        # column gather are inherently per-block.

        # --- phase A: batched projection + patch-index prep [B,512] ------
        pbx = pb_ref[:, 0:1]
        pby = pb_ref[:, 1:2]
        pbz = pb_ref[:, 2:3]                              # [B,1] f32
        ax = a_ref[0:1, :]
        ay = a_ref[1:2, :]
        az = a_ref[2:3, :]                                # [1,512] f32
        px = pbx + ax
        py = pby + ay
        pz = pbz + az                                     # [B,512]
        safe_z = jnp.where(pz == 0.0, 1e-12, pz)
        ui = jnp.floor(px * fx / safe_z + cx + 0.5).astype(jnp.int32)
        vi = jnp.floor(py * fy / safe_z + cy + 0.5).astype(jnp.int32)
        on = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (pz > 0.0)

        # window origins are XLA-precomputed from the block's 8 lattice
        # corners (projection extrema of a box sit at its corners and
        # floor is monotone, so the corner min == the per-voxel min for
        # interior blocks; screen-edge blocks clip corners first) — this
        # removes two in-kernel reduce->scalar-extract chains per block
        # that serialised the slice/matmul pipeline.
        v0v = win_ref[:, 0:1]                             # [B,1] i32
        u0v = win_ref[:, 1:2]
        dv = vi - v0v                                     # [B,512]
        du = ui * _NCH - u0v
        ok = (on & (dv >= 0) & (dv < _PATCH_ROWS)
              & (du >= 0) & (du <= _PATCH_COLS - _NCH))
        rowidx = jnp.where(ok, _PATCH_ROWS * (du >> 7) + dv,
                           jnp.int32(2 * _ROWS_FOLD))     # [B,512]
        lane = jnp.where(ok, du & (_LANE - 1), 0)
        grp = lane >> 3                                   # 8-lane group id

        riota = lax.broadcasted_iota(jnp.int32, (_ROWS_FOLD, 1), 0)
        liota3 = lax.broadcasted_iota(jnp.int32, (_LANE, 1), 0) >> 3

        # --- phase B: per-block patch pick -------------------------------
        # Transposed one-hot MXU matmul puts VOXELS ON LANES
        # (sel_t[l, v] = patch value at (rowidx_v, l)), so the per-voxel
        # column pick becomes a masked stride-8 SUBLANE fold: mask the
        # voxel's 8-lane channel group, then fold sublanes by 64/32/16/8 —
        # channel c lands exactly at sublane c for every voxel because
        # lane offsets are multiples of _NCH.  This replaced a per-block
        # [512,128] `tpu.dynamic_gather` (64 output vregs @ ~12 ns each,
        # ~0.77 us/block — the round-2 kernel floor), an idx build, an MXU
        # lane transpose and a [512,8]->[8,512] relayout: 25.4 -> 4.0 ms
        # at the bench operating point.  Bit-exact: the one-hot leaves a
        # single nonzero product per output in both formulations.
        for k in range(_BATCH_A):
            v0 = pl.multiple_of(win_ref[k, 0], 8)
            u0 = pl.multiple_of(win_ref[k, 1], _LANE)
            patch = img_ref[pl.ds(v0, _PATCH_ROWS),
                            pl.ds(u0, _PATCH_COLS)]       # [32,512] bf16
            # fold lane chunks onto sublanes: value(dv, du) lives at
            # pstack[32*(du>>7) + dv, du & 127]
            pstack = jnp.concatenate(
                [patch[:, _LANE * j:_LANE * (j + 1)] for j in range(_FOLD)],
                axis=0)                                   # [128,128]

            # row+chunk pick on the MXU (invalid rows -> all-zero one-hot
            # -> d = 0 -> "no update" downstream)
            oh = (rowidx[k:k + 1, :] == riota).astype(jnp.bfloat16)
            sel_t = lax.dot_general(pstack, oh, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = jnp.where(liota3 == grp[k:k + 1, :], sel_t, 0.0)
            x = x + jnp.concatenate([x[64:], x[:64]], axis=0)
            x = x + jnp.concatenate([x[32:], x[:32]], axis=0)
            x = x + jnp.concatenate([x[16:], x[:16]], axis=0)
            x = x + jnp.concatenate([x[8:], x[:8]], axis=0)

            dsc[k:k + 1, :] = x[0:1, :] + x[1:2, :]       # exact f32 depth
            rsc[k:k + 1, :] = x[2:3, :]
            gsc[k:k + 1, :] = x[3:4, :]
            bsc[k:k + 1, :] = x[4:5, :]

        # --- phase C: batched combineVoxel [B,512] ------------------------
        # (VoxelUtilHashSDF.h:228-250); gathered d = 0 (off-patch /
        # invalid pixel) -> no update
        d = dsc[:, :]
        cr = rsc[:, :]
        cg = gsc[:, :]
        cb = bsc[:, :]
        s_new = d - pz                                    # raw projective sdf
        trunc = trunc0 + ts * d
        update = (d > 0.0) & (d < maxdist) & (s_new > -trunc)
        s_c = jnp.clip(s_new, -trunc, trunc)
        depth01 = (d - dmin) / (dmax - dmin)
        w_new = jnp.maximum(iws * 1.5 * (1.0 - depth01), 1.0)

        osdf = osdf_ref[:, :].astype(jnp.float32)         # [B,512] bf16->f32
        ow = ow_ref[:, :].astype(jnp.float32)
        oc = oc_ref[:, :]                                 # i32 0x00RRGGBB
        o_r = ((oc >> 16) & 0xFF).astype(jnp.float32)
        o_g = ((oc >> 8) & 0xFF).astype(jnp.float32)
        o_b = (oc & 0xFF).astype(jnp.float32)

        w_sum = ow + w_new                                # >= 1, never 0
        f_sdf = (osdf * ow + s_c * w_new) / w_sum
        f_w = jnp.minimum(w_sum, wcap)
        f_r = jnp.clip(jnp.floor(0.5 * o_r + 0.5 * cr + 0.5), 0, 255)
        f_g = jnp.clip(jnp.floor(0.5 * o_g + 0.5 * cg + 0.5), 0, 255)
        f_b = jnp.clip(jnp.floor(0.5 * o_b + 0.5 * cb + 0.5), 0, 255)
        f_c = ((f_r.astype(jnp.int32) << 16)
               | (f_g.astype(jnp.int32) << 8)
               | f_b.astype(jnp.int32))

        # store in POOL_DTYPE (bf16); stats/flags below are computed from
        # the ROUNDED values so they agree bit-for-bit with what readers
        # (splat cull, GC, check_invariants) see in the pool
        new_sdf_st = jnp.where(update, f_sdf, osdf).astype(jnp.bfloat16)
        new_w_st = jnp.where(update, f_w, ow).astype(jnp.bfloat16)
        nsdf_ref[:, :] = new_sdf_st
        nw_ref[:, :] = new_w_st
        nc_ref[:, :] = jnp.where(update, f_c, oc)
        # per-block stats while rows are in registers: surface flag (splat
        # cull input), min |sdf| over weighted voxels and max weight (the
        # garbageCollectIdentify inputs — saves GC's row re-read)
        new_sdf = new_sdf_st.astype(jnp.float32)
        new_w = new_w_st.astype(jnp.float32)
        abs_s = jnp.abs(new_sdf)
        sflag = jnp.any((new_w > 0.0) & (abs_s < vsz),
                        axis=1, keepdims=True).astype(jnp.float32)
        min_s = jnp.min(jnp.where(new_w > 0.0, abs_s, jnp.inf),
                        axis=1, keepdims=True)
        max_w = jnp.max(new_w, axis=1, keepdims=True)
        nstat_ref[:, :] = jnp.concatenate(
            [sflag, min_s, max_w, jnp.zeros_like(sflag)], axis=1)

    return kernel


def _run_fused(img, pb, win, aff, old_sdf, old_w, old_c, g, cam, cfg,
               interpret, n_active=None, copy_tail: bool = False):
    """Run the fused sample+combine kernel over ``g`` blocks.

    ``img``: [h, wcols] bf16 interleaved frame; ``pb``: [g,8] f32 per-block
    camera-space base points (cols 0-2; sentinel rows for padding);
    ``win``: [g,8] i32 per-block patch-window origins (col 0 = image row,
    col 1 = interleaved column, both pre-aligned); ``aff``: [3,512] f32
    per-frame affine offsets; ``old_*``: [g,512] row-gathered pool data
    (color bitcast to i32). Returns the fused (sdf f32, weight f32,
    color i32) rows [g,512].
    """
    gp = -(-g // _BATCH_A) * _BATCH_A
    if gp != g:
        pb = jnp.pad(pb, ((0, gp - g), (0, 0)),
                     constant_values=_PB_SENTINEL)
        win = jnp.pad(win, ((0, gp - g), (0, 0)))
        old_sdf = jnp.pad(old_sdf, ((0, gp - g), (0, 0)))
        old_w = jnp.pad(old_w, ((0, gp - g), (0, 0)))
        old_c = jnp.pad(old_c, ((0, gp - g), (0, 0)))
    kernel = _make_kernel(cam, cfg, img.shape[1], copy_tail=copy_tail)
    if n_active is None:
        n_active = jnp.int32(g)
    nact = jnp.asarray(n_active, jnp.int32).reshape(1)
    row_spec = pl.BlockSpec((_BATCH_A, VOXELS_PER_BLOCK),
                            lambda i, n: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gp // _BATCH_A,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),        # resident image
            pl.BlockSpec((_BATCH_A, 8), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),        # pb per batch
            pl.BlockSpec((_BATCH_A, 8), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),        # window origins
            pl.BlockSpec((3, VOXELS_PER_BLOCK), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),        # affine table
            row_spec, row_spec, row_spec,                 # old rows
        ],
        out_specs=[row_spec, row_spec, row_spec,
                   pl.BlockSpec((_BATCH_A, 4), lambda i, n: (i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((_BATCH_A, VOXELS_PER_BLOCK),
                                   jnp.float32) for _ in range(4)],
    )
    vshape = (gp, VOXELS_PER_BLOCK)
    nsdf, nw, nc, nstat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(vshape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vshape, jnp.bfloat16),
                   jax.ShapeDtypeStruct(vshape, jnp.int32),
                   jax.ShapeDtypeStruct((gp, 4), jnp.float32)],
        interpret=interpret,
    )(nact, img, pb, win, aff, old_sdf, old_w, old_c)
    return nsdf[:g], nw[:g], nc[:g], nstat[:g]


# ---------------------------------------------------------------------------
# XLA prep + fusion orchestration
# ---------------------------------------------------------------------------


def _prep_image(depth, color, cam: CameraConfig):
    """Channel-interleaved bf16 image [h, 8*w (>=512, lane-padded)].

    Per pixel: (d_hi, d_lo, r, g, b, 0, 0, 0) — depth split into bf16
    limbs; pixels with invalid depth OR invalid color carry depth 0 (which
    the fuse rule treats as "no update", merging the two validity masks).
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
    d_hi, d_lo = split_bf16_limbs(d)
    z = jnp.zeros((h, w), jnp.bfloat16)
    chans = jnp.stack([d_hi, d_lo, cr.astype(jnp.bfloat16),
                       cg.astype(jnp.bfloat16), cb.astype(jnp.bfloat16),
                       z, z, z], axis=-1)
    img = chans.reshape(h, w * _NCH)                 # interleaved
    total = max(-(-w * _NCH // _LANE) * _LANE, _PATCH_COLS)
    return jnp.pad(img, ((0, 0), (0, total - w * _NCH)))


def _pb_win_aff(block_keys, is_real, pose, cam: CameraConfig,
                cfg: MapConfig, wcols: int):
    """Per-block camera-space base points [G,8], patch-window origins
    [G,8] and the per-frame affine table [3,512] (shared prep of the
    sparse and dense integrate paths)."""
    vs = cfg.voxel_size
    view = geom.invert_rigid(pose)
    blocks = geom.unpack_block_key(block_keys, cfg.world_blocks)   # [G,3]
    base = geom.block_to_voxel(blocks).astype(jnp.float32) * vs
    r, t = view[:3, :3], view[:3, 3]
    pbx = r[0, 0] * base[:, 0] + r[0, 1] * base[:, 1] \
        + r[0, 2] * base[:, 2] + t[0]                       # [G]
    pby = r[1, 0] * base[:, 0] + r[1, 1] * base[:, 1] \
        + r[1, 2] * base[:, 2] + t[1]
    pbz = r[2, 0] * base[:, 0] + r[2, 1] * base[:, 1] \
        + r[2, 2] * base[:, 2] + t[2]
    pb = jnp.stack([jnp.where(is_real, pbx, _PB_SENTINEL),
                    jnp.where(is_real, pby, _PB_SENTINEL),
                    jnp.where(is_real, pbz, _PB_SENTINEL)], axis=1)
    pb = jnp.pad(pb, ((0, 0), (0, 8 - 3)))                  # [G,8]

    offs = np.arange(VOXELS_PER_BLOCK, dtype=np.int32)
    ox = jnp.asarray(offs % SDF_BLOCK_SIZE, jnp.float32) * vs
    oy = jnp.asarray((offs // SDF_BLOCK_SIZE) % SDF_BLOCK_SIZE,
                     jnp.float32) * vs
    oz = jnp.asarray(offs // (SDF_BLOCK_SIZE * SDF_BLOCK_SIZE),
                     jnp.float32) * vs
    aff = jnp.stack([r[0, 0] * ox + r[0, 1] * oy + r[0, 2] * oz,
                     r[1, 0] * ox + r[1, 1] * oy + r[1, 2] * oz,
                     r[2, 0] * ox + r[2, 1] * oy + r[2, 2] * oz], axis=0)

    # per-block patch-window origins from the 8 lattice corners:
    # u(x,y,z) = fx*x/z + cx is monotone in each coordinate over a box, so
    # its min over the 8x8x8 voxel lattice is attained at a lattice corner;
    # using the SAME aff entries + op order as the kernel makes the corner
    # min bit-identical to the old in-kernel per-voxel min for interior
    # blocks (screen-edge blocks clip corners to the viewport first, which
    # can only widen the per-frame skip set marginally).
    h_, w_ = cam.height, cam.width
    cids = np.array([0, 7, 56, 63, 448, 455, 504, 511], np.int32)
    pxc = pb[:, 0:1] + aff[0, cids][None, :]                # [G,8]
    pyc = pb[:, 1:2] + aff[1, cids][None, :]
    pzc = pb[:, 2:3] + aff[2, cids][None, :]
    safe_zc = jnp.where(pzc == 0.0, 1e-12, pzc)
    uic = jnp.floor(pxc * cam.fx / safe_zc + cam.cx + 0.5).astype(jnp.int32)
    vic = jnp.floor(pyc * cam.fy / safe_zc + cam.cy + 0.5).astype(jnp.int32)
    uic = jnp.clip(uic, 0, w_ - 1)
    vic = jnp.clip(vic, 0, h_ - 1)
    v0 = jnp.clip((jnp.min(vic, axis=1) // 8) * 8, 0, h_ - _PATCH_ROWS)
    u0 = jnp.clip((jnp.min(uic, axis=1) * _NCH // _LANE) * _LANE,
                  0, wcols - _PATCH_COLS)
    win = jnp.stack([v0, u0], axis=1)
    win = jnp.pad(win, ((0, 0), (0, 8 - 2)))                # [G,8] i32
    return pb, win, aff


def integrate_pallas(state: MapState, depth, color, pose,
                     cam: CameraConfig, cfg: MapConfig,
                     active_idx, n_active, interpret: bool = False,
                     return_gc_stats: bool = False):
    """Drop-in replacement for :func:`voxelhashing_tpu.integrate.integrate`
    (Pallas TPU path). ``active_idx`` is the compacted in-frustum block
    list (padded), ``n_active`` its true length.

    ``return_gc_stats``: also return (min_abs_sdf [G], max_weight [G]) of
    the freshly fused rows — the garbageCollectIdentify inputs, computed
    while rows are in kernel registers so GC skips its row re-read."""
    g = active_idx.shape[0]
    n = cfg.num_blocks
    img = _prep_image(depth, color, cam)
    is_real = jnp.arange(g) < n_active
    pb, win, aff = _pb_win_aff(state.block_key[active_idx], is_real, pose,
                               cam, cfg, img.shape[1])

    # ---- fused projection + gather + combineVoxel kernel ----------------
    old_sdf = state.sdf[active_idx]                         # row gathers
    old_w = state.weight[active_idx]
    old_c = lax.bitcast_convert_type(state.color[active_idx], jnp.int32)
    out_sdf, out_w, out_c_i, out_stat = _run_fused(
        img, pb, win, aff, old_sdf, old_w, old_c, g, cam, cfg, interpret,
        n_active=n_active)                                  # [G,512]
    out_c = lax.bitcast_convert_type(out_c_i, jnp.uint32)
    out_surf = out_stat[:, 0] > 0.5

    safe_idx = jnp.where(is_real, active_idx.astype(jnp.int32),
                         jnp.int32(n))
    new_state = state._replace(
        sdf=state.sdf.at[safe_idx].set(out_sdf, mode="drop"),
        weight=state.weight.at[safe_idx].set(out_w, mode="drop"),
        color=state.color.at[safe_idx].set(out_c, mode="drop"),
        surf=state.surf.at[safe_idx].set(out_surf, mode="drop"))
    if return_gc_stats:
        return new_state, (out_stat[:, 1], out_stat[:, 2])
    return new_state


def integrate_pallas_dense(state: MapState, depth, color, pose,
                           cam: CameraConfig, cfg: MapConfig,
                           n_dense, cap: int, interpret: bool = False,
                           return_gc_stats: bool = False):
    """Slice-path integrate for a DENSE pool prefix (blockmap.dense_upto):
    the allocated rows are exactly [0, n_dense) with n_dense <= ``cap``,
    so old rows stream in as a static slice and fused rows write back
    with one static update — no row gather/scatter passes at all (those
    run at ~30% of HBM peak; this path at full rate). Frustum culling is
    implicit: out-of-view blocks project off-screen and self-mask, and
    free rows inside the slice carry INVALID keys -> sentinel pb.

    ``cap`` must be a multiple of the kernel batch (16); callers gate on
    ``state.dense_upto`` being in [0, cap].
    """
    img = _prep_image(depth, color, cam)
    keys = lax.slice_in_dim(state.block_key, 0, cap)
    is_real = (jnp.arange(cap) < n_dense) & (keys != geom.INVALID_KEY)
    pb, win, aff = _pb_win_aff(keys, is_real, pose, cam, cfg, img.shape[1])

    old_sdf = lax.slice_in_dim(state.sdf, 0, cap)           # views, no copy
    old_w = lax.slice_in_dim(state.weight, 0, cap)
    old_c = lax.bitcast_convert_type(
        lax.slice_in_dim(state.color, 0, cap), jnp.int32)
    out_sdf, out_w, out_c_i, out_stat = _run_fused(
        img, pb, win, aff, old_sdf, old_w, old_c, cap, cam, cfg, interpret,
        n_active=n_dense, copy_tail=True)                   # [cap,512]
    out_c = lax.bitcast_convert_type(out_c_i, jnp.uint32)
    out_surf = out_stat[:, 0] > 0.5

    new_state = state._replace(
        sdf=state.sdf.at[:cap].set(out_sdf),
        weight=state.weight.at[:cap].set(out_w),
        color=state.color.at[:cap].set(out_c),
        surf=state.surf.at[:cap].set(out_surf))
    if return_gc_stats:
        return new_state, (out_stat[:, 1], out_stat[:, 2])
    return new_state
