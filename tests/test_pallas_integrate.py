"""Pallas integrate kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelhashing_tpu import blockmap, geometry as geom, integrate
from voxelhashing_tpu.config import CameraConfig, MapConfig
from voxelhashing_tpu.io.synthetic import Scene, render_depth
from voxelhashing_tpu.ops.pallas_integrate import integrate_pallas

CAM = CameraConfig(width=128, height=96, fx=104.0, fy=104.0,
                   cx=63.5, cy=47.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=4096, table_size=16384,
                max_active_blocks=4096, world_blocks=1024)
SCENE = Scene()


def setup_state():
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
    depth, color = jnp.asarray(depth), jnp.asarray(color)
    pose = jnp.eye(4)
    state = blockmap.create(CFG)
    state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
    view = geom.invert_rigid(pose)
    active_idx, n_active, _ = blockmap.compactify(state, view, CAM, CFG)
    return state, depth, color, pose, active_idx, n_active


class TestPallasIntegrateInterpret:
    def test_matches_xla_path(self):
        state, depth, color, pose, active_idx, n_active = setup_state()
        mask = jnp.arange(active_idx.shape[0]) < n_active

        ref = integrate.integrate(state, depth, color, pose, CAM, CFG,
                                  active_idx=active_idx, active_mask=mask)
        out = integrate_pallas(state, depth, color, pose, CAM, CFG,
                               active_idx, n_active, interpret=True)

        w_ref = np.asarray(ref.weight)
        w_out = np.asarray(out.weight)
        # The kernel decomposes the projection as pb + A*off (per-block
        # affine); at pixels whose subpixel coordinate lands EXACTLY on the
        # floor(x+0.5) boundary the 1-ulp association difference can flip
        # the sampled pixel (synthetic axis-aligned scenes maximise these).
        # Allow a vanishing fraction of such boundary flips, bit-match the
        # rest.
        w_mismatch = np.abs(w_out - w_ref) > 1e-3
        assert w_mismatch.mean() < 1e-4, (
            f"{w_mismatch.sum()} weight mismatches")
        agree = (w_ref > 0) & ~w_mismatch
        # sdf agrees to bf16-limb depth precision (~0.1 mm at these ranges)
        s_ref = np.asarray(ref.sdf)[agree]
        s_out = np.asarray(out.sdf)[agree]
        np.testing.assert_allclose(s_out, s_ref, atol=5e-4)
        # colors agree within 1/255 per channel
        c_ref = np.asarray(ref.color)[agree]
        c_out = np.asarray(out.color)[agree]
        for shift in (16, 8, 0):
            a = (c_ref >> shift) & 0xFF
            b = (c_out >> shift) & 0xFF
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_second_fusion_accumulates(self):
        state, depth, color, pose, active_idx, n_active = setup_state()
        out1 = integrate_pallas(state, depth, color, pose, CAM, CFG,
                                active_idx, n_active, interpret=True)
        out2 = integrate_pallas(out1, depth, color, pose, CAM, CFG,
                                active_idx, n_active, interpret=True)
        w1 = np.asarray(out1.weight)
        w2 = np.asarray(out2.weight)
        upd = w1 > 0
        assert (w2[upd] >= w1[upd]).all()
        assert (w2[upd] > w1[upd]).any()


class TestDenseSlicePath:
    def test_dense_matches_sparse(self):
        """integrate_pallas_dense (slice path over the dense pool prefix)
        must produce the same map as the gather path: identical fused
        rows, surf flags, and gc stats over the allocated prefix."""
        from voxelhashing_tpu.ops.pallas_integrate import (
            integrate_pallas_dense)
        state, depth, color, pose, active_idx, n_active = setup_state()
        assert int(state.dense_upto) > 0     # fresh map: prefix is dense
        n_dense = int(state.dense_upto)
        cap = CFG.max_active_blocks
        assert cap % 16 == 0 and n_dense <= cap

        # compare over ALL allocated blocks: the dense path integrates the
        # whole prefix (no frustum pre-cull — off-view blocks self-mask in
        # the kernel), so the sparse side must cover the same row set for
        # exact equality (the 0.95-shrink frustum cull would otherwise
        # exclude edge blocks whose voxels still project on-screen)
        active_idx, n_active = blockmap.compactify_all(state, CFG)
        active_idx = active_idx[:CFG.max_active_blocks]
        ref, ref_stats = integrate_pallas(
            state, depth, color, pose, CAM, CFG, active_idx, n_active,
            interpret=True, return_gc_stats=True)
        out, out_stats = integrate_pallas_dense(
            state, depth, color, pose, CAM, CFG,
            jnp.int32(n_dense), cap, interpret=True, return_gc_stats=True)

        # the sparse path touched exactly the active rows; dense touched
        # the prefix (a superset ordering) — maps must agree everywhere
        np.testing.assert_array_equal(
            np.asarray(out.sdf, np.float32), np.asarray(ref.sdf, np.float32))
        np.testing.assert_array_equal(
            np.asarray(out.weight, np.float32),
            np.asarray(ref.weight, np.float32))
        np.testing.assert_array_equal(np.asarray(out.color),
                                      np.asarray(ref.color))
        np.testing.assert_array_equal(np.asarray(out.surf),
                                      np.asarray(ref.surf))
        # gc stats: dense stats[i] belongs to pool row i; sparse stats[i]
        # to active_idx[i] — compare through the permutation
        ai = np.asarray(active_idx)[:int(n_active)]
        np.testing.assert_allclose(
            np.asarray(out_stats[0])[ai],
            np.asarray(ref_stats[0])[:int(n_active)], rtol=0, atol=0)
        np.testing.assert_allclose(
            np.asarray(out_stats[1])[ai],
            np.asarray(ref_stats[1])[:int(n_active)], rtol=0, atol=0)
        # tail rows (free) report empty stats: never culled wrongly
        assert np.all(np.asarray(out_stats[1])[n_dense:] == 0.0)
