"""Steady-state stage ablation of the bench step.

Measures the bench-identical 18-frame chained loop with individual stages
knocked out (monkeypatched to cheap identities), so each stage's TRUE
marginal cost inside the fused program is (full - ablated) — including
whatever fusion/layout interactions the isolated-stage profiler misses.

Run each variant in a fresh subprocess (axon D2H sync rules).
Usage: python scripts/ablate_step.py [variant]
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = ["full", "no_gc", "no_track", "no_raycast", "no_integrate",
            "no_alloc", "no_compactify2", "no_preprocess", "no_stats"]


def run(variant):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import (blockmap, engine, integrate as integ,
                                  raycast, tracking)
    from voxelhashing_tpu.config import CameraConfig, EngineConfig, MapConfig
    from voxelhashing_tpu.io.synthetic import (Scene, Sphere, make_trajectory,
                                               render_depth)

    cam = CameraConfig()
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
        offline=False,
    )

    # --- ablations (monkeypatch before make_step traces) ------------------
    if variant == "no_gc":
        integ.garbage_collect = lambda s, ai, am, mp: s
        integ.starve = lambda s, ai, am: s
    elif variant == "no_track":
        real_track = tracking.track

        def fake_track(ip, inn, mp_, mn, last_pose, cam_, tcfg):
            zs, zc = tracking.empty_stats(tcfg)
            from voxelhashing_tpu.tracking import TrackingResult
            return TrackingResult(pose=last_pose, valid=jnp.array(True),
                                  residual=jnp.float32(0.0),
                                  corr_count=jnp.int32(1000),
                                  condition=jnp.float32(1.0),
                                  level_stats=zs, iter_residuals=zc)
        tracking.track = fake_track
    elif variant == "no_raycast":
        real_render = raycast.render

        def fake_render(state, pose, cam_, mp_, rc, **kw):
            from voxelhashing_tpu.raycast import RaycastResult
            h, w = cam_.height, cam_.width
            z = jnp.zeros((h, w, 3), jnp.float32)
            return RaycastResult(points=z, normals=z, depth=z[..., 0],
                                 color=None, splat_overflow=jnp.int32(0))
        raycast.render = fake_render
    elif variant == "no_integrate":
        from voxelhashing_tpu.ops import pallas_integrate as pi

        def fake_ip(state, d, c, pose, cam_, mp_, ai, na, **kw):
            if kw.get("return_gc_stats"):
                z = jnp.zeros((ai.shape[0],), jnp.float32)
                return state, (z + jnp.inf, z)
            return state
        pi.integrate_pallas = fake_ip
        integ.integrate = (
            lambda state, d, c, pose, cam_, mp_, **kw: state)
    elif variant == "no_alloc":
        real_alloc = blockmap.allocate
        blockmap.allocate = lambda s, keys, mp_, rounds=1: (s, jnp.int32(0))
    elif variant == "no_compactify2":
        # knock out the SECOND compactify (inside _integrate_frame) by
        # caching: return the same result both times per trace
        real_comp = blockmap.compactify
        cache = []

        def comp_once(state, view, cam_, mp_):
            if cache:
                return cache[0]
            r = real_comp(state, view, cam_, mp_)
            cache.append(r)
            return r
        blockmap.compactify = comp_once
    elif variant == "no_preprocess":
        from voxelhashing_tpu.ops import image as img_mod
        real_pre = img_mod.preprocess

        def fake_pre(d, c, cam_, fcfg):
            h, w = cam_.height, cam_.width
            z3 = jnp.zeros((h, w, 3), jnp.float32)
            return img_mod.FrameInputs(depth=d, color=c, intensity=d,
                                       points=z3, normals=z3)
        img_mod.preprocess = fake_pre
        engine.preprocess = fake_pre
    elif variant == "no_stats":
        blockmap.stats = lambda s, mp_: {"n_allocated": jnp.int32(0)}

    n_frames = 20
    scene = Scene(spheres=(
        Sphere(center=(0.0, 0.2, 1.8), radius=0.3),
        Sphere(center=(-0.5, -0.2, 2.0), radius=0.25, color=(0.2, 0.5, 0.8)),
        Sphere(center=(0.6, 0.1, 1.5), radius=0.2, color=(0.3, 0.7, 0.3)),
        Sphere(center=(0.3, -0.4, 2.2), radius=0.28, color=(0.7, 0.7, 0.2)),
        Sphere(center=(-0.3, 0.45, 1.4), radius=0.18, color=(0.6, 0.3, 0.7)),
    ))
    poses = make_trajectory(n_frames)
    frames = []
    for i, pose in enumerate(poses):
        d, c = render_depth(pose, cam, scene, noise_sigma=0.002, seed=i)
        frames.append((jnp.asarray(np.nan_to_num(d, nan=0.0)),
                       jnp.asarray(c)))

    step = engine.make_step(cfg, donate=False)
    state = engine.create(cfg)
    force = jax.jit(lambda s: s.pose[0, 0] + s.frame)

    state, diag = step(state, *frames[0])
    state, diag = step(state, *frames[1])
    float(np.asarray(force(state)))

    t0 = time.perf_counter()
    for f in frames[2:]:
        state, diag = step(state, *f)
    float(np.asarray(force(state)))
    dt = time.perf_counter() - t0
    ms = dt / (n_frames - 2) * 1000.0
    print(f"VARIANT {variant}: {ms:.2f} ms/frame ({(n_frames-2)/dt:.2f} fps)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        run(sys.argv[1])
    elif len(sys.argv) > 1 and sys.argv[1] == "--all":
        for v in VARIANTS:
            subprocess.run([sys.executable, "scripts/ablate_step.py", v])
    else:
        print("variants:", VARIANTS)
