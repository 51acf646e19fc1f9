"""Benchmark: fused frames/sec of the full per-frame pipeline on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): >= 30 fused frames/sec/chip at 4 mm voxels — the
reference's real-time operating point (zParametersDefault.txt:9-29) on a
~2013 GPU; vs_baseline = fps / 30.
"""

import json
import time

import numpy as np


def main(streaming: bool = False):
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
        offline=False,   # online allocation semantics (real-time mode)
    )

    n_frames = 20
    # Feature-rich scene: keeps the 6-DoF ICP system well-conditioned over
    # the whole trajectory (a bare wall degenerates the yaw/translation
    # nullspace exactly as it would for the reference tracker).
    from voxelhashing_tpu.io.synthetic import Sphere
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

    # NOTE: donate=True deadlocks the axon tunnel runtime (hang observed
    # 2026-08-17, no output for 15 min); keep donate=False here.
    step = engine.make_step(cfg, donate=False,
                            with_stream_mask=streaming)
    state = engine.create(cfg)
    mgr = None
    if streaming:
        from voxelhashing_tpu.config import StreamingConfig
        from voxelhashing_tpu.streaming import AsyncStreamingManager
        # defer_host: the worker's D2H readbacks would flip the axon tunnel
        # into synchronous-dispatch mode and poison the measurement; the
        # deferred mode times exactly the device halves, which is the
        # marginal streaming cost when the host half overlaps (real HW).
        mgr = AsyncStreamingManager(
            cfg.map, StreamingConfig(enabled=True, radius=4.0),
            out_cap=512, defer_host=True)

    def run_frame(state, d, c):
        if mgr is None:
            return step(state, d, c)
        st, diag = step(state, d, c, mgr.bitmask)
        # fixed origin camera position: reading st.pose back would D2H-sync
        # every frame (the bench trajectory stays within ~10 cm of origin)
        new_map = mgr.step(st.map, [0.0, 0.0, 0.0])
        return st._replace(map=new_map), diag

    # Measurement protocol for the tunnelled TPU runtime: block_until_ready
    # does not reliably wait before the process's first device->host
    # transfer, so the warmup is force-synced by a real scalar readback and
    # the timed loop is forced the same way at the end.
    force = jax.jit(lambda s: s.pose[0, 0] + s.frame)

    # Warmup: compile + first two frames (alloc-heavy), truly synced.
    state, diag = run_frame(state, *frames[0])
    state, diag = run_frame(state, *frames[1])
    float(np.asarray(force(state)))

    t0 = time.perf_counter()
    for f in frames[2:]:
        state, diag = run_frame(state, *f)
    float(np.asarray(force(state)))          # single forcing readback
    dt = time.perf_counter() - t0
    fps = (n_frames - 2) / dt

    # Per-round kernel regression gate (verify_tpu.py check 0+1 on the
    # bench's own final state — seconds of chip time): a Pallas layout
    # regression fails the bench instead of hiding until the next manual
    # verify run.
    from voxelhashing_tpu.verify import quick_kernel_check
    ok, vmsg = quick_kernel_check(state.map, *frames[-1], state.pose,
                                  cam, cfg.map)

    print(json.dumps({
        "metric": ("fused_frames_per_sec_streaming" if streaming
                   else "fused_frames_per_sec"),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "verify": "PASS" if ok else f"FAIL {vmsg}",
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    import sys
    sys.exit(main(streaming="--streaming" in sys.argv))
