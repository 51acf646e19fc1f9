"""Per-stage timing at the BENCH operating point (steady-state inputs).

Unlike scripts/profile_stages.py (fresh tiny state), this builds a real
steady-state engine state by running the bench scene for 10 frames, then
times each stage with that state and frame as inputs — chained K times,
one forcing readback (axon measurement rules; every device input is
passed through the chained tuple, never closure-captured, so nothing is
baked into the HLO as a constant).  Each stage runs in a fresh subprocess.

Usage: python scripts/profile_bench_stages.py [stage ...|--all]
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STAGES = ["preprocess", "compactify", "splat", "track",
          "alloc", "allocate", "integrate", "gc", "stats"]


def bench_setup():
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import engine
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         MapConfig)
    from voxelhashing_tpu.io.synthetic import (Scene, Sphere,
                                               make_trajectory, render_depth)

    cam = CameraConfig()
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
        offline=False,
    )
    scene = Scene(spheres=(
        Sphere(center=(0.0, 0.2, 1.8), radius=0.3),
        Sphere(center=(-0.5, -0.2, 2.0), radius=0.25, color=(0.2, 0.5, 0.8)),
        Sphere(center=(0.6, 0.1, 1.5), radius=0.2, color=(0.3, 0.7, 0.3)),
        Sphere(center=(0.3, -0.4, 2.2), radius=0.28, color=(0.7, 0.7, 0.2)),
        Sphere(center=(-0.3, 0.45, 1.4), radius=0.18, color=(0.6, 0.3, 0.7)),
    ))
    poses = make_trajectory(12)
    frames = []
    for i, pose in enumerate(poses):
        d, c = render_depth(pose, cam, scene, noise_sigma=0.002, seed=i)
        frames.append((jnp.asarray(np.nan_to_num(d, nan=0.0)),
                       jnp.asarray(c)))
    step = engine.make_step(cfg, donate=False)
    state = engine.create(cfg)
    for f in frames[:10]:
        state, diag = step(state, *f)
    return cfg, state, frames[10], diag


def run_stage(stage):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import (blockmap, engine, geometry as geom,
                                  integrate as integ, raycast, tracking)
    from voxelhashing_tpu.ops.image import preprocess

    cfg, state, (depth, color), diag = bench_setup()
    cam, mp = cfg.camera, cfg.map

    prep = jax.jit(lambda s, d, c: (
        preprocess(d, c, cam, cfg.filter),
        *blockmap.compactify(s.map, geom.invert_rigid(s.pose), cam, mp)))
    frame, active_idx, n_active, _ = prep(state, depth, color)
    active_mask_shape = active_idx.shape[0]
    model = jax.jit(lambda s, ai, na: raycast.render(
        s.map, s.pose, cam, mp, cfg.raycast, active_idx=ai,
        active_mask=jnp.arange(active_mask_shape) < na,
        with_color=False))(state, active_idx, n_active)
    keys = jax.jit(lambda s, d: integ.alloc_candidates(
        d, s.pose, cam, mp))(state, frame.depth)

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
        print(f"STAGE {name}: {dt/k*1000:.2f} ms/iter (k={k}, "
              f"incl ~33/k ms RTT)")

    print(f"steady state: n_allocated={int(diag.n_allocated_blocks)} "
          f"n_active={int(n_active)}")
    eps = 1e-30

    if stage == "preprocess":
        def f(x):
            acc, d, c = x
            fr = preprocess(d, c, cam, cfg.filter)
            return (acc + fr.points[0, 0, 0] * eps, d, c)
        timed("preprocess", f, (jnp.float32(0), depth, color))
    elif stage == "compactify":
        def f(x):
            acc, m, pose = x
            ai, na, _ = blockmap.compactify(m, geom.invert_rigid(pose),
                                            cam, mp)
            return (acc + (na + ai[0]) * eps, m, pose)
        timed("compactify", f, (jnp.float32(0), state.map, state.pose))
    elif stage == "splat":
        def f(x):
            acc, m, pose, ai, na = x
            mdl = raycast.render_splat(
                m, pose, cam, mp, cfg.raycast, active_idx=ai,
                active_mask=jnp.arange(active_mask_shape) < na,
                with_color=False)
            return (acc + mdl.depth[120, 160] * eps, m, pose, ai, na)
        timed("splat", f, (jnp.float32(0), state.map, state.pose,
                           active_idx, n_active))
    elif stage == "track":
        def f(x):
            acc, ip, inrm, mpt, mn, pose = x
            tr = tracking.track(ip, inrm, mpt, mn, pose, cam, cfg.tracker)
            return (acc, ip, inrm, mpt, mn,
                    tr.pose * (1.0 + acc * eps))
        timed("track", f, (jnp.float32(0), frame.points, frame.normals,
                           model.points, model.normals, state.pose))
    elif stage == "alloc":
        def f(x):
            acc, d, pose = x
            k2 = integ.alloc_candidates(d, pose, cam, mp,
                                        tile=mp.alloc_tile)
            return (acc + k2[0] * eps, d, pose)
        timed("alloc_candidates", f, (jnp.float32(0), frame.depth,
                                      state.pose))
    elif stage == "allocate":
        def f(x):
            acc, m, k2 = x
            st, n = blockmap.allocate(m, k2, mp, rounds=1)
            return (acc + n * eps, st, k2)
        timed("allocate", f, (jnp.float32(0), state.map, keys))
    elif stage == "integrate":
        from voxelhashing_tpu.ops.pallas_integrate import integrate_pallas
        def f(x):
            acc, m, d, c, pose, ai, na = x
            st = integrate_pallas(m, d, c, pose, cam, mp, ai, na)
            return (acc, st, d, c, pose, ai, na)
        timed("integrate_pallas", f,
              (jnp.float32(0), state.map, depth, color, state.pose,
               active_idx, n_active))
    elif stage == "gc":
        def f(x):
            acc, m, ai, na = x
            st = integ.garbage_collect(
                m, ai, jnp.arange(active_mask_shape) < na, mp)
            return (acc, st, ai, na)
        timed("gc", f, (jnp.float32(0), state.map, active_idx, n_active))
    elif stage == "stats":
        def f(x):
            acc, m = x
            st = blockmap.stats(m, mp)
            return (acc + st["n_allocated"] * eps, m)
        timed("stats", f, (jnp.float32(0), state.map))


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) == 1 and args[0] in STAGES:
        run_stage(args[0])
    elif args and args[0] == "--all":
        for s in STAGES:
            subprocess.run([sys.executable, __file__, s])
    else:
        print("stages:", STAGES, "\n(one stage per process, or --all)")
