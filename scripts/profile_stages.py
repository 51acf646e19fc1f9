"""Per-stage timing of the reconstruction pipeline (TimingLog analog).

Axon-tunnel measurement rules (empirically established):
* ``block_until_ready`` does not actually wait until the process has done
  its first device->host readback (timings look impossibly fast);
* after ANY D2H readback, every dispatch becomes synchronous (~33 ms RTT).

So each stage is timed in a FRESH subprocess: warmup, then K data-chained
iterations, then ONE readback that both forces and ends the clock.

Run on TPU: /opt/venv/bin/python scripts/profile_stages.py [stage]
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STAGES = ["preprocess", "alloc", "compactify", "integrate",
          "pallas_integrate", "splat", "raycast", "raycast_color", "track",
          "gc", "trilinear", "lookup", "step"]


def run_stage(stage):
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import (blockmap, engine, geometry as geom,
                                  integrate, raycast, tracking)
    from voxelhashing_tpu.config import CameraConfig, EngineConfig, MapConfig
    from voxelhashing_tpu.io.synthetic import Scene, make_trajectory, render_depth
    from voxelhashing_tpu.ops.image import preprocess

    cam = CameraConfig()
    cfg = EngineConfig(
        camera=cam,
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
    )
    mp = cfg.map
    d0, c0 = render_depth(make_trajectory(1)[0], cam, Scene())
    depth = jnp.asarray(np.nan_to_num(d0, nan=0.0))
    color = jnp.asarray(c0)
    pose0 = jnp.eye(4, dtype=jnp.float32)

    force_fn = jax.jit(lambda leaf: jnp.ravel(leaf)[0])

    def measure(fn, x0, k=10):
        x = fn(x0)          # compile (async, but compilation blocks trace)
        x = fn(x)
        # pre-compile the force program too (no D2H yet!)
        force_fn(jax.tree_util.tree_leaves(x)[0])
        time.sleep(4.0)     # let queued warmups drain (no D2H allowed!)
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = fn(x)
        np.asarray(force_fn(jax.tree_util.tree_leaves(x)[0]))
        dt = (time.perf_counter() - t0) / k
        print(f"STAGE {stage}: {dt*1000:.2f} ms/iter (k={k}, "
              f"incl ~33ms/k RTT)")

    # shared setup (device-only, no D2H)
    state = blockmap.create(mp)
    f_alloc = jax.jit(lambda s: integrate.allocate_from_depth(
        s, depth, pose0, cam, mp)[0])
    state = f_alloc(state)
    f_comp = jax.jit(lambda s: blockmap.compactify(
        s, geom.invert_rigid(pose0), cam, mp))
    active_idx, n_active, _ = f_comp(state)
    mask = jnp.arange(active_idx.shape[0]) < n_active

    if stage == "preprocess":
        f = jax.jit(lambda d: preprocess(d, color, cam, cfg.filter).depth)
        measure(lambda x: f(x), depth, k=20)
    elif stage == "alloc":
        measure(f_alloc, blockmap.create(mp), k=10)
    elif stage == "compactify":
        f = jax.jit(lambda s: blockmap.compactify(
            s, geom.invert_rigid(pose0), cam, mp)[1])
        measure(lambda s: s._replace(n_tombstones=f(s)), state, k=20)
    elif stage == "integrate":
        f = jax.jit(lambda s: integrate.integrate(
            s, depth, color, pose0, cam, mp,
            active_idx=active_idx, active_mask=mask))
        measure(f, state, k=10)
    elif stage == "splat":
        f = jax.jit(lambda s: raycast.ray_interval_splat(
            s, active_idx, mask, geom.invert_rigid(pose0), cam, mp,
            cfg.raycast)[0])
        measure(lambda s: s._replace(n_tombstones=state.n_tombstones
                                     + 0 * f(s)[0, 0].astype(jnp.int32)),
                state, k=20)
    elif stage == "raycast":
        # the tracking path (with_color=False; Pallas splat on TPU)
        f = jax.jit(lambda s, p: raycast.render(
            s, p, cam, mp, cfg.raycast, active_idx=active_idx,
            active_mask=mask, with_color=False).depth)
        measure(lambda p: p + 0.0 * jnp.nan_to_num(f(state, p)[0, 0]),
                pose0, k=5)
    elif stage == "raycast_color":
        f = jax.jit(lambda s, p: raycast.render(
            s, p, cam, mp, cfg.raycast, active_idx=active_idx,
            active_mask=mask).depth)
        measure(lambda p: p + 0.0 * jnp.nan_to_num(f(state, p)[0, 0]),
                pose0, k=5)
    elif stage == "track":
        f_model = jax.jit(lambda s, p: raycast.render(
            s, p, cam, mp, cfg.raycast, active_idx=active_idx,
            active_mask=mask))
        model = f_model(state, pose0)
        frame = jax.jit(lambda d, c: preprocess(d, c, cam, cfg.filter))(
            depth, color)
        f = jax.jit(lambda p: tracking.track(
            frame.points, frame.normals, model.points, model.normals,
            p, cam, cfg.tracker).pose)
        measure(lambda p: p + 0.0 * f(p), pose0, k=10)
    elif stage == "pallas_integrate":
        from voxelhashing_tpu.ops.pallas_integrate import integrate_pallas
        f = jax.jit(lambda s: integrate_pallas(
            s, depth, color, pose0, cam, mp, active_idx, n_active))
        measure(f, state, k=10)
    elif stage == "gc":
        f = jax.jit(lambda s: integrate.garbage_collect(
            s, active_idx, mask, mp))
        measure(f, state, k=10)
    elif stage == "trilinear":
        pts = jnp.asarray(np.random.default_rng(0).uniform(
            -0.5, 2.5, (76800, 3)).astype(np.float32))
        f = jax.jit(lambda p: raycast.trilinear_sample(state, p, mp)[0])
        measure(lambda p: p + 0.0 * f(p)[:, None], pts, k=20)
    elif stage == "lookup":
        keys0 = state.block_key[:65536]
        f = jax.jit(lambda k: blockmap.lookup(state, k, mp)[0])
        measure(lambda k: k + 0 * f(k), keys0, k=20)
    elif stage == "step":
        stepf = engine.make_step(cfg, donate=False)
        est = engine.create(cfg)
        measure(lambda s: stepf(s, depth, color)[0], est, k=5)


def main():
    if len(sys.argv) > 1:
        run_stage(sys.argv[1])
        return
    for stage in STAGES:
        r = subprocess.run([sys.executable, __file__, stage],
                           capture_output=True, text=True, timeout=900)
        out = [l for l in (r.stdout + r.stderr).splitlines()
               if l.startswith("STAGE")]
        print(out[0] if out else f"STAGE {stage}: FAILED\n{r.stderr[-500:]}")


if __name__ == "__main__":
    main()
