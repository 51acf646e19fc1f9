"""Steady-state stage ablation of the bench step.

Warms up a steady-state map with the REAL step (12 frames), then times an
ABLATED step (one stage monkeypatched to a cheap identity) from that
state, so each stage's TRUE marginal cost inside the fused program is
(full - ablated) — including whatever fusion/layout interactions the
isolated-stage profiler misses.  Warming up with the real step matters:
ablating allocation from frame 0 leaves the map empty and collapses every
downstream stage (the round-2 version of this script had that flaw).

Run each variant in a fresh subprocess (axon D2H sync rules).
Usage: python scripts/ablate_step.py [variant|--all]
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = ["full", "no_gc", "no_track", "no_raycast", "no_integrate",
            "no_alloc", "no_dda", "no_compactify2", "no_preprocess"]

WARMUP = 12          # frames run with the REAL step before ablating
N_FRAMES = 28


def apply_ablation(variant):
    import jax.numpy as jnp
    from voxelhashing_tpu import (blockmap, engine, integrate as integ,
                                  raycast, tracking)

    if variant == "no_gc":
        integ.garbage_collect = lambda s, ai, am, mp, **kw: s
        integ.starve = lambda s, ai, am: s
    elif variant == "no_track":
        def fake_track(ip, inn, mp_, mn, last_pose, cam_, tcfg, **kw):
            zs, zc = tracking.empty_stats(tcfg)
            from voxelhashing_tpu.tracking import TrackingResult
            return TrackingResult(pose=last_pose, valid=jnp.array(True),
                                  residual=jnp.float32(0.0),
                                  corr_count=jnp.int32(1000),
                                  condition=jnp.float32(1.0),
                                  level_stats=zs, iter_residuals=zc)
        tracking.track = fake_track
    elif variant == "no_raycast":
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
        blockmap.allocate = lambda s, keys, mp_, rounds=1: (s, jnp.int32(0))
    elif variant == "no_dda":
        from voxelhashing_tpu.geometry import INVALID_KEY

        def fake_cand(d, pose, cam_, mp_, tile=1, phase=None,
                      model_depth=None, **kw):
            p = d.shape[0] * d.shape[1]
            n = (mp_.alloc_fold_tile * p // (tile * tile) if tile > 1
                 else mp_.alloc_fold * p)
            return jnp.full((n,), INVALID_KEY, jnp.int32)
        integ.alloc_candidates = fake_cand
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
        from voxelhashing_tpu import engine

        def fake_pre(d, c, cam_, fcfg):
            h, w = cam_.height, cam_.width
            z3 = jnp.zeros((h, w, 3), jnp.float32)
            return img_mod.FrameInputs(depth=d, color=c, intensity=d,
                                       points=z3, normals=z3)
        img_mod.preprocess = fake_pre
        engine.preprocess = fake_pre


def run(variant):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import engine
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
    scene = Scene(spheres=(
        Sphere(center=(0.0, 0.2, 1.8), radius=0.3),
        Sphere(center=(-0.5, -0.2, 2.0), radius=0.25, color=(0.2, 0.5, 0.8)),
        Sphere(center=(0.6, 0.1, 1.5), radius=0.2, color=(0.3, 0.7, 0.3)),
        Sphere(center=(0.3, -0.4, 2.2), radius=0.28, color=(0.7, 0.7, 0.2)),
        Sphere(center=(-0.3, 0.45, 1.4), radius=0.18, color=(0.6, 0.3, 0.7)),
    ))
    poses = make_trajectory(N_FRAMES)
    frames = []
    for i, pose in enumerate(poses):
        d, c = render_depth(pose, cam, scene, noise_sigma=0.002, seed=i)
        frames.append((jnp.asarray(np.nan_to_num(d, nan=0.0)),
                       jnp.asarray(c)))

    force = jax.jit(lambda s: s.pose[0, 0] + s.frame)

    # --- steady-state warmup with the REAL step --------------------------
    step_real = jax.jit(lambda s, d, c: engine.step(s, d, c, cfg))
    state = engine.create(cfg)
    for f in frames[:WARMUP]:
        state, _ = step_real(state, *f)
    float(np.asarray(force(state)))

    # --- ablate, re-trace, time ------------------------------------------
    apply_ablation(variant)
    step_abl = jax.jit(lambda s, d, c: engine.step(s, d, c, cfg))
    state, _ = step_abl(state, *frames[WARMUP])        # compile + warm
    float(np.asarray(force(state)))

    t0 = time.perf_counter()
    for f in frames[WARMUP + 1:]:
        state, _ = step_abl(state, *f)
    float(np.asarray(force(state)))
    dt = time.perf_counter() - t0
    k = N_FRAMES - WARMUP - 1
    ms = dt / k * 1000.0
    print(f"VARIANT {variant}: {ms:.2f} ms/frame ({k/dt:.2f} fps)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        run(sys.argv[1])
    elif len(sys.argv) > 1 and sys.argv[1] == "--all":
        for v in VARIANTS:
            subprocess.run([sys.executable, "scripts/ablate_step.py", v])
    else:
        print("variants:", VARIANTS)
