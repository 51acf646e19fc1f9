"""Sub-step timing of the allocate stage at the bench operating point.

Splits blockmap.allocate into its pipeline pieces and times each
cumulatively (chained, one forcing readback — axon rules), so the
marginal cost of each piece is the delta between consecutive rows.

Usage: python scripts/profile_alloc_parts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from voxelhashing_tpu import blockmap, geometry as geom
    from voxelhashing_tpu import integrate as integ
    from voxelhashing_tpu.blockmap import _probe_slot, INVALID_KEY
    from scripts.profile_bench_stages import bench_setup

    cfg, state, (depth, color), diag = bench_setup()
    cam, mp = cfg.camera, cfg.map
    keys = jax.jit(lambda s, d: integ.alloc_candidates(
        d, s.pose, cam, mp))(state, depth)
    print("stream shape:", keys.shape,
          "valid:", int(jnp.sum(keys != INVALID_KEY)))

    h = mp.table_size
    cap = min(mp.max_active_blocks, mp.num_blocks)
    precap = min(4 * cap, keys.shape[0])

    def upto_precompact(k0):
        valid0 = k0 != INVALID_KEY
        prank = jnp.cumsum(valid0.astype(jnp.int32)) - 1
        keep0 = valid0 & (prank < precap)
        return jnp.full((precap,), INVALID_KEY, jnp.int32).at[
            jnp.where(keep0, prank, precap)].set(k0, mode="drop")

    def upto_staging(k0):
        keys0 = upto_precompact(k0)
        valid = keys0 != INVALID_KEY
        slot0 = _probe_slot(keys0, 0, h)
        inst = jnp.arange(keys0.shape[0], dtype=jnp.int32)
        stage = jnp.full((h,), jnp.int32(0x7FFFFFFF)).at[
            jnp.where(valid, slot0, h)].min(inst, mode="drop")
        rep = valid & (stage[jnp.where(valid, slot0, 0)] == inst)
        rank = jnp.cumsum(rep.astype(jnp.int32)) - 1
        keep = rep & (rank < cap)
        return jnp.full((cap,), INVALID_KEY, jnp.int32).at[
            jnp.where(keep, rank, cap)].set(keys0, mode="drop")

    def full(state_, k0):
        st, n = blockmap.allocate(state_, k0, mp, rounds=1)
        return st, n

    eps = 1e-30

    def timed(name, fn, x0, k=10):
        fnj = jax.jit(fn)
        x = fnj(x0)
        x = fnj(x)
        force = jax.jit(
            lambda t: jnp.ravel(jax.tree_util.tree_leaves(t)[0])[0])
        force(x)
        time.sleep(3.0)
        t0 = time.perf_counter()
        x = x0
        for _ in range(k):
            x = fnj(x)
        float(np.asarray(force(x)))
        dt = time.perf_counter() - t0
        print(f"PART {name}: {dt/k*1000:.2f} ms/iter (k={k}, incl ~RTT/k)")

    def mk(fnk):
        def f(x):
            acc, k0 = x
            out = fnk(k0)
            return (acc + out[0].astype(jnp.float32) * eps, k0)
        return f

    timed("dda_only", lambda x: (
        (x[0] + integ.alloc_candidates(depth, x[1], cam, mp)[0] * eps),
        x[1]), (jnp.float32(0), state.pose))
    timed("precompact", mk(upto_precompact), (jnp.float32(0), keys))
    timed("staging", mk(upto_staging), (jnp.float32(0), keys))

    def f_full(x):
        acc, st, k0 = x
        st2, n = full(st, k0)
        return (acc + n * eps, st2, k0)
    timed("full_allocate", f_full, (jnp.float32(0), state.map, keys))

    # how many new keys per steady frame?
    uni = upto_staging(keys)
    _, found = blockmap.lookup(state.map, uni, mp)
    print("unique candidates:", int(jnp.sum(uni != INVALID_KEY)),
          "already resident:", int(jnp.sum(found)))


if __name__ == "__main__":
    main()
