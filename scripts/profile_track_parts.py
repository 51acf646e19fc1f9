"""Decompose the track stage: pyramid build, interleave, one L0 iteration.

MEASUREMENT CAVEAT (hard-won): the on-device lax.scan(k) delta used here
UNDER-measures — XLA hoists loop-invariant work (pyramids, interleaves)
out of the scan, so only the per-iteration marginal shows. Per-call
chained timing of these small jits through the tunnelled runtime is
unreliable the other way (100-3000 ms/iter artifacts). For trustworthy
decomposition, ablate TrackerConfig (levels/outer counts) under the
whole-stage chained harness of profile_bench_stages.py and difference
the results — that method produced the numbers in STATUS.md.

Usage: python scripts/profile_track_parts.py [pyr|inter|assoc|lin|solve|full]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from profile_bench_stages import bench_setup  # noqa: E402


def main(which):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import blockmap, geometry as geom, raycast, tracking
    from voxelhashing_tpu.ops.image import preprocess

    cfg, state, (depth, color), diag = bench_setup()
    cam, mp = cfg.camera, cfg.map
    tk = cfg.tracker
    prep = jax.jit(lambda s, d, c: (
        preprocess(d, c, cam, cfg.filter),
        *blockmap.compactify(s.map, geom.invert_rigid(s.pose), cam, mp)))
    frame, active_idx, n_active, _ = prep(state, depth, color)
    g = active_idx.shape[0]
    model = jax.jit(lambda s, ai, na: raycast.render(
        s.map, s.pose, cam, mp, cfg.raycast, active_idx=ai,
        active_mask=jnp.arange(g) < na, with_color=False))(
            state, active_idx, n_active)
    eps = 1e-30

    def timed(name, fn, x0, k=10):
        # On-device scan timing: k chained iterations inside ONE dispatch;
        # k_hi vs k=1 difference cancels dispatch + readback fixed costs
        # (robust against the tunnelled runtime's sync/async quirks).
        from jax import lax

        def run_k(kk):
            body = lambda c, _: (fn(c), jnp.int32(0))
            fj = jax.jit(lambda x: lax.scan(body, x, None, length=kk))
            force = jax.jit(
                lambda t: jnp.ravel(jax.tree_util.tree_leaves(t)[0])[0])
            x = fj(x0)        # compile + settle
            float(np.asarray(force(x[0])))
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                x = fj(x0)
                float(np.asarray(force(x[0])))
            return (time.perf_counter() - t0) / reps

        t1 = run_k(1)
        tk = run_k(1 + k)
        print(f"PART {name}: {(tk - t1)/k*1000:.2f} ms/iter "
              f"(scan delta, k={k}; k1={t1*1000:.1f} ms)")

    if which == "pyr":
        def f(x):
            acc, ip, inr = x
            pyr = tracking.build_pyramid(ip, inr, tk.levels)
            return (acc + pyr[-1][0][0, 0, 0] * eps, ip, inr)
        timed("build_pyramid(in)", f,
              (jnp.float32(0), frame.points, frame.normals))
    elif which == "inter":
        def f(x):
            acc, mp_, mn_ = x
            t8 = tracking._interleave_target(mp_, mn_)
            return (acc + t8[0, 0] * eps, mp_, mn_)
        timed("interleave_target(L0)", f,
              (jnp.float32(0), model.points, model.normals))
    elif which == "assoc":
        md8 = jax.jit(tracking._interleave_target)(model.points,
                                                   model.normals)
        def f(x):
            acc, ip, inr, t8, delta = x
            in_soa = tracking._soa(ip) + tracking._soa(inr)
            q, nq, w, ok = tracking._associate(
                delta, in_soa, t8, cam, tk.dist_thres[0],
                tk.normal_thres[0], cam.depth_min, cam.depth_max)
            return (acc + q[0][0] * eps, ip, inr, t8,
                    delta * (1.0 + acc * eps))
        timed("associate(L0)", f,
              (jnp.float32(0), frame.points, frame.normals, md8,
               jnp.eye(4, dtype=jnp.float32)))
    elif which == "lin":
        md8 = jax.jit(tracking._interleave_target)(model.points,
                                                   model.normals)
        mkq = jax.jit(lambda ip, inr, t8, delta: tracking._associate(
            delta, tracking._soa(ip) + tracking._soa(inr), t8, cam,
            tk.dist_thres[0], tk.normal_thres[0],
            cam.depth_min, cam.depth_max))
        q, nq, w, ok = mkq(frame.points, frame.normals, md8, jnp.eye(4))
        def f(x):
            acc, ip, inr, q, nq, w, ok, delta = x
            in_soa = tracking._soa(ip) + tracking._soa(inr)
            a, b, sr, sw, cnt = tracking._linearize(
                delta, in_soa, q, nq, w, ok, jnp.zeros((3,), jnp.float32),
                jnp.float32(1.0))
            return (acc + a[0, 0] * eps, ip, inr, q, nq, w, ok,
                    delta * (1.0 + acc * eps))
        timed("linearize(L0)", f,
              (jnp.float32(0), frame.points, frame.normals, q, nq, w, ok,
               jnp.eye(4, dtype=jnp.float32)))
    elif which == "solve":
        a0 = jnp.eye(6) * 100.0 + jnp.ones((6, 6))
        b0 = jnp.ones((6,))
        def f(x):
            acc, a, b = x
            xs, cond, degen = tracking._solve6(a, b, tk.cond_thres)
            return (acc + xs[0] * eps, a + xs[0] * eps, b)
        timed("solve6", f, (jnp.float32(0), a0, b0))
    elif which == "full":
        def f(x):
            acc, ip, inrm, mpt, mn, pose = x
            tr = tracking.track(ip, inrm, mpt, mn, pose, cam, tk)
            return (acc, ip, inrm, mpt, mn, tr.pose * (1.0 + acc * eps))
        timed("track_full", f,
              (jnp.float32(0), frame.points, frame.normals,
               model.points, model.normals, state.pose))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
