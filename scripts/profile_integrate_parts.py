"""Decompose the integrate stage: row gather/scatter vs kernel vs prep.

Axon measurement rules apply (chained executions, one forcing readback,
no closure-captured device arrays).  Usage:
    python scripts/profile_integrate_parts.py [gs|kernel|prep|full]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from profile_bench_stages import bench_setup  # noqa: E402


def main(which):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import blockmap, geometry as geom
    from voxelhashing_tpu.ops import pallas_integrate as pi

    cfg, state, (depth, color), diag = bench_setup()
    cam, mp = cfg.camera, cfg.map
    prep = jax.jit(lambda s, pose: blockmap.compactify(
        s.map, geom.invert_rigid(pose), cam, mp))
    active_idx, n_active, _ = prep(state, state.pose)
    g = active_idx.shape[0]
    print(f"g={g} n_active={int(n_active)}")
    eps = 1e-30

    def timed(name, fn, x0, k=10):
        fnj = jax.jit(fn)
        x = fnj(x0)
        x = fnj(x)
        force = jax.jit(
            lambda t: jnp.ravel(jax.tree_util.tree_leaves(t)[0])[0])
        force(x)
        time.sleep(4.0)
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = fnj(x)
        float(np.asarray(force(x)))
        dt = time.perf_counter() - t0
        print(f"PART {name}: {dt/k*1000:.2f} ms/iter (k={k}, "
              f"incl ~33/k ms RTT)")

    if which == "gs":
        # the 3 row gathers + 4 row scatters integrate_pallas performs
        def f(x):
            acc, m, ai = x
            s1 = m.sdf[ai]
            w1 = m.weight[ai]
            c1 = m.color[ai]
            surf = s1[:, 0] > 0.0
            m = m._replace(
                sdf=m.sdf.at[ai].set(s1 + acc * eps, mode="drop"),
                weight=m.weight.at[ai].set(w1, mode="drop"),
                color=m.color.at[ai].set(c1, mode="drop"),
                surf=m.surf.at[ai].set(surf, mode="drop"))
            return (acc + s1[0, 0] * eps, m, ai)
        timed("gather3+scatter4", f, (jnp.float32(0), state.map, active_idx))
    elif which == "prep":
        def f(x):
            acc, d, c, pose = x
            img = pi._prep_image(d, c, cam)
            return (acc + img[0, 0].astype(jnp.float32) * eps, d, c, pose)
        timed("prep_image", f, (jnp.float32(0), depth, color, state.pose))
    elif which == "full":
        def f(x):
            acc, m, d, c, pose, ai, na = x
            st = pi.integrate_pallas(m, d, c, pose, cam, mp, ai, na)
            return (acc, st, d, c, pose, ai, na)
        timed("integrate_full", f,
              (jnp.float32(0), state.map, depth, color, state.pose,
               active_idx, n_active))
    elif which == "kernel":
        # kernel alone: pre-gathered rows as chained inputs, no scatter-back
        img0 = jax.jit(lambda d, c: pi._prep_image(d, c, cam))(depth, color)
        view = geom.invert_rigid(state.pose)
        os_, ow_, oc_ = (state.map.sdf[active_idx],
                         state.map.weight[active_idx],
                         jax.jit(lambda c: jax.lax.bitcast_convert_type(
                             c, jnp.int32))(state.map.color[active_idx]))

        def f(x):
            acc, img, pb, win, aff, os1, ow1, oc1, na = x
            ns, nw, nc, nstat = pi._run_fused(
                img, pb, win, aff, os1, ow1, oc1, g, cam, mp, False,
                n_active=na)
            return (acc + ns[0, 0] * eps, img, pb, win, aff,
                    os1, ow1, oc1, na)

        # build pb/win/aff once via the public wrapper's own math
        import jax as _jax
        def mk(m, pose, ai, na):
            vs = mp.voxel_size
            view = geom.invert_rigid(pose)
            blocks = geom.unpack_block_key(m.block_key[ai], mp.world_blocks)
            base = geom.block_to_voxel(blocks).astype(jnp.float32) * vs
            r, t = view[:3, :3], view[:3, 3]
            pbs = base @ r.T + t
            is_real = jnp.arange(g) < na
            pb = jnp.where(is_real[:, None], pbs, pi._PB_SENTINEL)
            pb = jnp.pad(pb, ((0, 0), (0, 5)))
            offs = np.arange(512, dtype=np.int32)
            ox = jnp.asarray(offs % 8, jnp.float32) * vs
            oy = jnp.asarray((offs // 8) % 8, jnp.float32) * vs
            oz = jnp.asarray(offs // 64, jnp.float32) * vs
            aff = jnp.stack([r[0, 0] * ox + r[0, 1] * oy + r[0, 2] * oz,
                             r[1, 0] * ox + r[1, 1] * oy + r[1, 2] * oz,
                             r[2, 0] * ox + r[2, 1] * oy + r[2, 2] * oz])
            cids = np.array([0, 7, 56, 63, 448, 455, 504, 511], np.int32)
            px = pb[:, 0:1] + aff[0, cids][None, :]
            py = pb[:, 1:2] + aff[1, cids][None, :]
            pz = pb[:, 2:3] + aff[2, cids][None, :]
            sz = jnp.where(pz == 0.0, 1e-12, pz)
            ui = jnp.floor(px * cam.fx / sz + cam.cx + 0.5).astype(jnp.int32)
            vi = jnp.floor(py * cam.fy / sz + cam.cy + 0.5).astype(jnp.int32)
            ui = jnp.clip(ui, 0, cam.width - 1)
            vi = jnp.clip(vi, 0, cam.height - 1)
            v0 = jnp.clip((jnp.min(vi, 1) // 8) * 8, 0,
                          cam.height - pi._PATCH_ROWS)
            u0 = jnp.clip((jnp.min(ui, 1) * 8 // 128) * 128, 0,
                          img0.shape[1] - pi._PATCH_COLS)
            return pb, jnp.pad(jnp.stack([v0, u0], 1), ((0, 0), (0, 6)))
        pb0, win0 = _jax.jit(mk)(state.map, state.pose, active_idx, n_active)
        vs = mp.voxel_size
        offs = np.arange(512, dtype=np.int32)
        view = np.asarray(geom.invert_rigid(state.pose))
        r = view[:3, :3]
        o = np.stack([offs % 8, (offs // 8) % 8, offs // 64]).astype(
            np.float32) * vs
        aff0 = jnp.asarray(r @ o)
        timed("kernel_only", f,
              (jnp.float32(0), img0, pb0, win0, aff0, os_, ow_, oc_,
               n_active))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
