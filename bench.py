"""Benchmark: fused frames/sec of the full per-frame pipeline on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): >= 30 fused frames/sec/chip at 4 mm voxels — the
reference's real-time operating point (zParametersDefault.txt:9-29) on a
~2013 GPU; vs_baseline = fps / 30.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import engine
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         MapConfig)
    from voxelhashing_tpu.io.synthetic import (Scene, make_trajectory,
                                               render_depth)

    cam = CameraConfig()                 # 320x240 processing resolution
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
    )

    n_frames = 20
    scene = Scene()
    poses = make_trajectory(n_frames)
    frames = []
    for i, pose in enumerate(poses):
        d, c = render_depth(pose, cam, scene, noise_sigma=0.002, seed=i)
        frames.append((jnp.asarray(np.nan_to_num(d, nan=0.0)),
                       jnp.asarray(c)))

    step = engine.make_step(cfg, donate=True)
    state = engine.create(cfg)

    # Warmup: compile + first two frames (alloc-heavy).
    state, diag = step(state, *frames[0])
    state, diag = step(state, *frames[1])
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for f in frames[2:]:
        state, diag = step(state, *f)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    fps = (n_frames - 2) / dt

    print(json.dumps({
        "metric": "fused_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
