"""Replicated-vs-sharded cost decomposition of the distributed step — the
2-host scaling projection the single-chip environment can't measure
directly (BASELINE "Multi-host scaling >= 70%" row).

Wall-clock on the 8-virtual-device CPU mesh is meaningless (all devices
share the host cores), so this measures PER-DEVICE WORK from XLA's own
cost model: ``compiled.cost_analysis()`` flops/bytes of the sharded step
at mesh sizes 1/2/4/8. A stage sharded over the map or image rows shrinks
its per-device flops ~1/D; replicated stages (preprocess, DDA candidate
generation, the 6x6 solve) stay constant. Fitting

    work(D) = replicated + sharded / D

over the measured points yields the serial fraction s =
replicated / work(1), and the Amdahl efficiency ceiling at D devices

    eff(D) = work(1) / (D * work(D)) = 1 / (s*D + (1-s))

which bounds what 2-host hardware can deliver before collective costs.
Results are published in BASELINE.md (round 5).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/scaling_projection.py
(JAX_PLATFORMS=cpu would swallow the device-count flag — the script sets
the platform via jax.config instead; see the verify skill.)
"""

import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         MapConfig)
    from voxelhashing_tpu.parallel import sharded

    devs = jax.devices()
    if len(devs) < 8:
        print("needs 8 virtual devices "
              "(XLA_FLAGS=--xla_force_host_platform_device_count=8)")
        return 1

    # bench operating point (320x240, 4 mm voxels)
    cam = CameraConfig()
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
        offline=False,
    )

    depth = jnp.zeros((cam.height, cam.width), jnp.float32)
    color = jnp.zeros((cam.height, cam.width, 3), jnp.float32)

    rows = []
    for d in (1, 2, 4, 8):
        mesh = jax.sharding.Mesh(np.array(devs[:d]), ("d",))
        state, _ = sharded.create_sharded(cfg, mesh)
        step = sharded.make_sharded_step(cfg, mesh)
        lowered = jax.jit(step._fun if hasattr(step, "_fun") else step
                          ).lower(state, depth, color)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        bytes_ = float(ca.get("bytes accessed", float("nan")))
        # cost_analysis reports the WHOLE program; under SPMD each device
        # executes the same program over its shard, so this IS the
        # per-device work
        rows.append((d, flops, bytes_))
        print(f"D={d}: per-device flops {flops:.3e}  bytes {bytes_:.3e}")

    # fit work(D) = a + b/D (least squares over the four points)
    for name, col in (("flops", 1), ("bytes", 2)):
        ds = np.array([r[0] for r in rows], np.float64)
        ws = np.array([r[col] for r in rows], np.float64)
        A = np.stack([np.ones_like(ds), 1.0 / ds], axis=1)
        (a, b), *_ = np.linalg.lstsq(A, ws, rcond=None)
        w1 = a + b
        s = a / w1
        print(f"\n[{name}] replicated={a:.3e} sharded={b:.3e} "
              f"serial fraction s={s:.3f}")
        for d in (2, 4, 8):
            eff = 1.0 / (s * d + (1 - s))
            print(f"  Amdahl ceiling eff({d}) = {eff:.2%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
