"""Interpret-mode equivalence of the Pallas splat kernel vs the XLA splat.

Semantics note: within one block, the XLA path scatter-MINs per-voxel
predictions into a pixel while the kernel AVERAGES them (all in-band
voxels along a ray predict the same surface depth); across blocks both
take the min. So coverage must match exactly and depths must agree to
about a voxel.
"""

import numpy as np
import jax
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, geometry as geom, integrate, raycast
from voxelhashing_tpu.config import CameraConfig, MapConfig
from voxelhashing_tpu.io.synthetic import Scene, Sphere, render_depth
from voxelhashing_tpu.ops.pallas_splat import splat_zbuf_pallas

CAM = CameraConfig(width=80, height=60, fx=65.0, fy=65.0, cx=39.5, cy=29.5)
CFG = MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                num_blocks=4096, table_size=16384,
                max_active_blocks=4096, world_blocks=1024)
SCENE = Scene(wall_z=2.0, floor_y=0.8,
              spheres=(Sphere(center=(0.0, 0.1, 1.5), radius=0.25),))


def fused_state():
    depth, color = render_depth(np.eye(4, dtype=np.float32), CAM, SCENE)
    depth, color = jnp.asarray(np.nan_to_num(depth, nan=0.0)), \
        jnp.asarray(color)
    pose = jnp.eye(4)
    state = blockmap.create(CFG)
    state, _ = integrate.allocate_from_depth(state, depth, pose, CAM, CFG)
    state = integrate.integrate(state, depth, color, pose, CAM, CFG)
    return state


class TestPallasSplat:
    def test_matches_xla_splat(self):
        state = fused_state()
        view = jnp.eye(4)
        active_idx, n_active, _ = blockmap.compactify(state, view, CAM, CFG)
        mask = jnp.arange(active_idx.shape[0]) < n_active
        sdf = state.sdf[active_idx]
        wgt = state.weight[active_idx]

        zb_ref, _ = raycast._splat_zbuf(state, sdf, wgt, active_idx, mask,
                                        view, CAM, CFG, with_color=False)
        zb_pal, n_clip = splat_zbuf_pallas(state, sdf, wgt, active_idx,
                                           mask, view, CAM, CFG,
                                           interpret=True)
        zr = np.asarray(zb_ref)
        zp = np.asarray(zb_pal)
        assert int(n_clip) == 0
        # identical coverage
        np.testing.assert_array_equal(np.isfinite(zr), np.isfinite(zp))
        cov = np.isfinite(zr)
        assert cov.sum() > 1000
        # depth agreement within a voxel (min-vs-average within a block)
        diff = np.abs(zr[cov] - zp[cov])
        assert np.percentile(diff, 99) < CFG.voxel_size, (
            np.percentile(diff, [50, 90, 99, 100]))
        assert diff.max() < 3 * CFG.voxel_size

    def test_clips_counted_for_near_blocks(self):
        """Blocks whose footprint exceeds the 32-row patch (very near the
        camera) report clipped voxels instead of silently dropping."""
        state = fused_state()
        # camera 0.3 m from the wall (left of the sphere's fusion shadow):
        # face-on blocks span ~69 px > 32 rows
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = -0.5
        pose[2, 3] = 1.70
        view = geom.invert_rigid(jnp.asarray(pose))
        cam = CameraConfig(width=80, height=60, fx=130.0, fy=130.0,
                           cx=39.5, cy=29.5, depth_min=0.05)
        # bypass the frustum cull (it may reject ultra-near blocks): hand
        # the splat every allocated block
        active_idx, n_active = blockmap.compactify_all(state, CFG)
        mask = jnp.arange(active_idx.shape[0]) < n_active
        sdf = state.sdf[active_idx]
        wgt = state.weight[active_idx]
        _, n_clip = splat_zbuf_pallas(state, sdf, wgt, active_idx, mask,
                                      view, cam, CFG, interpret=True)
        assert int(n_clip) > 0
