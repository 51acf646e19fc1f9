"""Measure the cost + accuracy effect of ``RaycastConfig.refine_trilinear``
on the tracking path at the bench operating point.

The splat renderer's surface depth carries an O(view-angle-delta) bias
(raycast.render_splat docstring); one trilinear TSDF correction per pixel
removes it (STATUS.md round-3 item 4). This script times the full engine
step with refine off vs on (chained, single forcing readback — axon
measurement rules) and reports the marginal ms/frame, plus free-tracking
ATE on the bench trajectory for both settings.

Usage: /opt/venv/bin/python scripts/measure_refine.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(refine: bool):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import engine, evaluation
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         MapConfig, RaycastConfig)
    from voxelhashing_tpu.io.synthetic import (Scene, Sphere,
                                               make_trajectory, render_depth)

    cam = CameraConfig()
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
        raycast=RaycastConfig(refine_trilinear=refine),
        offline=False,
    )
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

    est = []
    state, _ = step(state, *frames[0])
    state, _ = step(state, *frames[1])
    float(np.asarray(force(state)))
    t0 = time.perf_counter()
    for f in frames[2:]:
        state, _ = step(state, *f)
    float(np.asarray(force(state)))
    dt = time.perf_counter() - t0
    ms = dt / (n_frames - 2) * 1e3

    # second pass for ATE (reads pose per frame -> synchronous, untimed)
    state = engine.create(cfg)
    for f in frames:
        state, _ = step(state, *f)
        est.append(np.asarray(state.pose))
    ate = evaluation.ate_rmse(np.stack(est), np.stack(poses))
    return ms, ate * 1e3


def main():
    ms_off, ate_off = run(False)
    ms_on, ate_on = run(True)
    print(f"refine OFF: {ms_off:6.2f} ms/frame   ATE {ate_off:5.2f} mm")
    print(f"refine ON : {ms_on:6.2f} ms/frame   ATE {ate_on:5.2f} mm")
    print(f"marginal  : {ms_on - ms_off:+.2f} ms/frame")


if __name__ == "__main__":
    main()
