"""Unit + property tests for the block-sparse map.

The property tests mirror the reference's own invariant checker
``debugHash()`` (CUDASceneRepHashSDF.h:129-233): no duplicates, table<->pool
consistency, pool conservation; plus allocate/lookup/delete behaviour under
random workloads (including collisions and re-allocation after free).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voxelhashing_tpu import blockmap, geometry as geom
from voxelhashing_tpu.config import MapConfig, CameraConfig
from voxelhashing_tpu.geometry import INVALID_KEY


SMALL = MapConfig(num_blocks=256, table_size=1024, max_probes=16,
                  max_active_blocks=128, world_blocks=1024)


def random_keys(rng, n, lo=-100, hi=100):
    blocks = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
    return np.asarray(geom.pack_block_key(jnp.asarray(blocks), 1024)), blocks


def assert_healthy(state, cfg):
    viol = blockmap.check_invariants(state, cfg)
    assert all(v == 0 for v in viol.values()), viol


class TestAllocateLookup:
    def test_allocate_then_lookup(self):
        rng = np.random.default_rng(0)
        keys, _ = random_keys(rng, 50)
        state = blockmap.create(SMALL)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        n_unique = len(np.unique(keys))
        assert int(n) == n_unique
        idx, found = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        assert bool(jnp.all(found))
        # each entry resolves to a pool slot holding its key
        np.testing.assert_array_equal(
            np.asarray(state.block_key)[np.asarray(idx)], keys)
        assert_healthy(state, SMALL)

    def test_lookup_missing(self):
        rng = np.random.default_rng(1)
        keys, _ = random_keys(rng, 20, lo=-50, hi=0)
        other, _ = random_keys(rng, 20, lo=1, hi=50)
        state = blockmap.create(SMALL)
        state, _ = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        _, found = blockmap.lookup(state, jnp.asarray(other), SMALL)
        assert not bool(jnp.any(found))

    def test_allocate_idempotent(self):
        rng = np.random.default_rng(2)
        keys, _ = random_keys(rng, 40)
        state = blockmap.create(SMALL)
        state, n1 = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        state, n2 = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        assert int(n2) == 0
        assert int(blockmap.stats(state, SMALL)["n_allocated"]) == int(n1)
        assert_healthy(state, SMALL)

    def test_allocate_with_duplicates_and_invalid(self):
        keys = jnp.asarray([5, 5, 5, int(INVALID_KEY), 9, 9], jnp.int32)
        state = blockmap.create(SMALL)
        state, n = blockmap.allocate(state, keys, SMALL)
        assert int(n) == 2
        assert_healthy(state, SMALL)

    def test_pool_exhaustion_drops_excess(self):
        cfg = dataclasses.replace(SMALL, num_blocks=16, table_size=64)
        rng = np.random.default_rng(3)
        keys, _ = random_keys(rng, 200)
        keys = np.unique(keys)
        assert len(keys) > 16
        state = blockmap.create(cfg)
        state, n = blockmap.allocate(state, jnp.asarray(keys), cfg)
        assert int(n) == 16
        st = blockmap.stats(state, cfg)
        assert int(st["n_allocated"]) == 16
        assert int(st["n_free"]) == 0
        assert_healthy(state, cfg)

    def test_incremental_allocation_rounds(self):
        """Many small allocations accumulate consistently (per-frame use)."""
        rng = np.random.default_rng(4)
        state = blockmap.create(SMALL)
        seen = set()
        for i in range(8):
            keys, _ = random_keys(rng, 30, lo=-40, hi=40)
            state, _ = blockmap.allocate(state, jnp.asarray(keys), SMALL)
            seen.update(int(k) for k in keys)
            idx, found = blockmap.lookup(
                state, jnp.asarray(sorted(seen), jnp.int32), SMALL)
            assert bool(jnp.all(found))
        assert int(blockmap.stats(state, SMALL)["n_allocated"]) == len(seen)
        assert_healthy(state, SMALL)


class TestDeleteRehash:
    def _alloc(self, n=60, seed=5):
        rng = np.random.default_rng(seed)
        keys, _ = random_keys(rng, n)
        keys = np.unique(keys)
        state = blockmap.create(SMALL)
        state, _ = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        return state, keys

    def test_delete_frees_and_tombstones(self):
        state, keys = self._alloc()
        idx, found = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        kill = jnp.arange(len(keys)) % 2 == 0
        state = blockmap.delete_blocks(state, idx, kill, SMALL)
        _, found2 = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        np.testing.assert_array_equal(np.asarray(found2), ~np.asarray(kill))
        assert int(state.n_tombstones) == int(kill.sum())
        assert_healthy(state, SMALL)

    def test_delete_zeroes_voxels_and_allows_realloc(self):
        state, keys = self._alloc()
        # dirty the allocated blocks' voxels
        idx, _ = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        state = state._replace(weight=state.weight.at[idx].add(3.0),
                               sdf=state.sdf.at[idx].add(0.5))
        state = blockmap.delete_blocks(
            state, idx, jnp.ones(len(keys), bool), SMALL)
        # freed voxels zeroed
        assert float(state.weight[np.asarray(idx)].sum()) == 0.0
        # re-allocate the same keys: lands on clean blocks
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        assert int(n) == len(keys)
        idx2, found = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        assert bool(jnp.all(found))
        assert float(state.weight[np.asarray(idx2)].sum()) == 0.0
        assert_healthy(state, SMALL)

    def test_lookup_survives_tombstones_in_probe_chain(self):
        """Deleting a key must not hide other keys probing past its slot."""
        rng = np.random.default_rng(6)
        keys, _ = random_keys(rng, 150)   # dense: plenty of probe collisions
        keys = np.unique(keys)
        cfg = dataclasses.replace(SMALL, table_size=256, num_blocks=200)
        state = blockmap.create(cfg)
        state, _ = blockmap.allocate(state, jnp.asarray(keys), cfg)
        idx, found = blockmap.lookup(state, jnp.asarray(keys), cfg)
        keys = keys[np.asarray(found)]   # keep those that fit
        idx, _ = blockmap.lookup(state, jnp.asarray(keys), cfg)
        kill = jnp.arange(len(keys)) % 3 == 0
        state = blockmap.delete_blocks(state, idx, kill, cfg)
        _, found2 = blockmap.lookup(state, jnp.asarray(keys), cfg)
        survivors = ~np.asarray(kill)
        np.testing.assert_array_equal(np.asarray(found2), survivors)
        assert_healthy(state, cfg)

    def test_realloc_resident_keys_after_partial_delete(self):
        """ADVICE r1 (high): re-offering still-resident keys after deletes
        must not claim a tombstone earlier in their probe chain — that would
        shadow the resident block (losing its TSDF) and leak the pool slot.
        """
        state, keys = self._alloc(n=90, seed=9)
        idx, found0 = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        # keys can miss the initial alloc under staging collisions (online
        # drop-retry semantics); the property under test concerns residents
        keys = keys[np.asarray(found0)]
        idx, _ = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        kill = jnp.arange(len(keys)) % 3 == 0
        state = blockmap.delete_blocks(state, idx, kill, SMALL)
        # dirty the survivors so shadowing would be observable
        survivors = keys[~np.asarray(kill)]
        sidx, _ = blockmap.lookup(state, jnp.asarray(survivors), SMALL)
        state = state._replace(weight=state.weight.at[sidx].add(5.0),
                               # direct array pokes must keep the surface
                               # flags consistent (integrate/insert do)
                               surf=state.surf.at[sidx].set(True))

        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        state, n2 = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        # only the deleted keys re-allocate (two passes = retry semantics);
        # survivors keep their blocks
        assert int(n) + int(n2) == int(kill.sum())
        assert_healthy(state, SMALL)
        sidx2, found = blockmap.lookup(state, jnp.asarray(survivors), SMALL)
        assert bool(jnp.all(found))
        np.testing.assert_array_equal(np.asarray(sidx2), np.asarray(sidx))
        assert float(state.weight[np.asarray(sidx2)].sum()) > 0.0

    def test_rehash_clears_tombstones_preserves_contents(self):
        state, keys = self._alloc(n=80, seed=7)
        idx, _ = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        kill = jnp.arange(len(keys)) % 2 == 0
        state = blockmap.delete_blocks(state, idx, kill, SMALL)
        state = blockmap.rehash(state, SMALL)
        assert int(state.n_tombstones) == 0
        _, found = blockmap.lookup(state, jnp.asarray(keys), SMALL)
        np.testing.assert_array_equal(np.asarray(found), ~np.asarray(kill))
        assert_healthy(state, SMALL)


class TestCompactify:
    def test_compactify_filters_by_frustum(self):
        cam = CameraConfig()
        cfg = dataclasses.replace(SMALL, voxel_size=0.05)  # blocks of 0.4m
        # one block straight ahead (in view), one behind the camera
        b_in = geom.world_to_block(jnp.asarray([0.0, 0.0, 2.0]), cfg.voxel_size)
        b_out = geom.world_to_block(jnp.asarray([0.0, 0.0, -2.0]), cfg.voxel_size)
        keys = geom.pack_block_key(jnp.stack([b_in, b_out]), cfg.world_blocks)
        state = blockmap.create(cfg)
        state, _ = blockmap.allocate(state, keys, cfg)
        view = jnp.eye(4)
        active_idx, n_active, overflow = blockmap.compactify(
            state, view, cam, cfg)
        assert int(n_active) == 1
        assert int(overflow) == 0
        key_active = int(state.block_key[active_idx[0]])
        assert key_active == int(keys[0])

    def test_compactify_all(self):
        state, keys = TestDeleteRehash()._alloc(n=30, seed=8)
        idx, n = blockmap.compactify_all(state, SMALL)
        ks = np.asarray(state.block_key)[np.asarray(idx[:int(n)])]
        assert set(ks.tolist()) == set(np.asarray(keys).tolist())

    def test_compactify_two_tier_equivalence(self):
        """The half-pool watermark tier must return the identical active
        list as a full-pool scan (invariant 8: allocated rows <
        dense_upto), in both tiers."""
        cam = CameraConfig()
        cfg = dataclasses.replace(SMALL, num_blocks=256, table_size=1024,
                                  max_active_blocks=256, voxel_size=0.05)
        rng = np.random.default_rng(3)
        blocks = np.unique(
            rng.integers(-6, 6, size=(220, 3)).astype(np.int32), axis=0)
        keys = geom.pack_block_key(jnp.asarray(blocks), cfg.world_blocks)
        view = jnp.eye(4)

        def full_scan(s):
            # reference result: force the full-width branch by lying
            # about the watermark
            return blockmap.compactify(
                s._replace(dense_upto=jnp.int32(cfg.num_blocks)),
                view, cam, cfg)

        # tier 1: few blocks, watermark below half
        state = blockmap.create(cfg)
        state, _ = blockmap.allocate(state, keys[:90], cfg, rounds=4)
        assert int(state.dense_upto) <= cfg.num_blocks // 2
        ai_t, n_t, ov_t = blockmap.compactify(state, view, cam, cfg)
        ai_f, n_f, ov_f = full_scan(state)
        assert int(n_t) == int(n_f) and int(ov_t) == int(ov_f)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ai_t[:int(n_t)])),
            np.sort(np.asarray(ai_f[:int(n_f)])))

        # tier 2: fill past half, watermark above half -> full branch
        state, _ = blockmap.allocate(state, keys, cfg, rounds=6)
        if int(state.dense_upto) > cfg.num_blocks // 2:
            ai_t, n_t, _ = blockmap.compactify(state, view, cam, cfg)
            ai_f, n_f, _ = full_scan(state)
            assert int(n_t) == int(n_f)
            np.testing.assert_array_equal(
                np.sort(np.asarray(ai_t[:int(n_t)])),
                np.sort(np.asarray(ai_f[:int(n_f)])))


class TestGatherVoxels:
    def test_gather_unallocated_is_zero_weight(self):
        state = blockmap.create(SMALL)
        vox = jnp.asarray([[3, 4, 5], [-9, 2, 1]], jnp.int32)
        sdf, w, c = blockmap.gather_voxels(state, vox, SMALL)
        assert float(jnp.sum(w)) == 0.0

    def test_gather_reads_written_voxel(self):
        cfg = SMALL
        block = jnp.asarray([[2, -3, 1]], jnp.int32)
        key = geom.pack_block_key(block, cfg.world_blocks)
        state = blockmap.create(cfg)
        state, _ = blockmap.allocate(state, key, cfg)
        idx, found = blockmap.lookup(state, key, cfg)
        assert bool(found[0])
        # write voxel (local 1,2,3) of that block
        vox = geom.block_to_voxel(block)[0] + jnp.asarray([1, 2, 3])
        local = int(geom.voxel_local_index(vox))
        state = state._replace(
            sdf=state.sdf.at[idx[0], local].set(0.25),
            weight=state.weight.at[idx[0], local].set(7.0))
        sdf, w, _ = blockmap.gather_voxels(state, vox[None], cfg)
        assert abs(float(sdf[0]) - 0.25) < 1e-6
        assert float(w[0]) == 7.0


class TestFreeStack:
    """The incremental free-slot stack (d_heap/d_heapCounter analog):
    conservation through allocate -> delete -> re-allocate cycles."""

    def test_counter_tracks_pool(self):
        rng = np.random.default_rng(7)
        state = blockmap.create(SMALL)
        assert int(state.n_free) == SMALL.num_blocks
        keys, _ = random_keys(rng, 60)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        assert int(state.n_free) == SMALL.num_blocks - int(n)
        assert_healthy(state, SMALL)

        # delete a third, stack grows back
        idx, total = blockmap.compactify_all(state, SMALL)
        mask = (jnp.arange(idx.shape[0]) < total) & (idx % 3 == 0)
        n_del = int(mask.sum())
        state = blockmap.delete_blocks(state, idx, mask, SMALL)
        assert int(state.n_free) == SMALL.num_blocks - int(n) + n_del
        assert_healthy(state, SMALL)

        # re-offer every original key: deleted ones re-allocate from the
        # stack, resident ones are dropped by the pre-drop
        state, n2 = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        assert int(n2) == n_del
        assert int(state.n_free) == SMALL.num_blocks - int(n)
        assert_healthy(state, SMALL)

    def test_rehash_zeroes_lost_slot_voxels(self):
        # Force re-insertion failures: with max_probes=1, three keys
        # sharing the single probe slot mean rehash keeps one and LOSES
        # two. Lost slots return to the TOP of the free stack (popped
        # first by the next allocate), so their voxel rows must be zeroed
        # or stale TSDF leaks straight into the next allocated key.
        cfg = dataclasses.replace(SMALL, max_probes=1)
        cand = jnp.arange(1, 4096, dtype=jnp.int32)
        slots = np.asarray(blockmap._probe_slot(cand, 0, cfg.table_size))
        vals, counts = np.unique(slots, return_counts=True)
        assert counts.max() >= 3
        slot = vals[np.argmax(counts)]
        keys = np.asarray(cand)[slots == slot][:3].astype(np.int32)

        state = blockmap.create(cfg)
        nb = cfg.num_blocks
        state = state._replace(
            block_key=state.block_key.at[:3].set(jnp.asarray(keys)),
            sdf=state.sdf.at[:3].set(0.5),
            weight=state.weight.at[:3].set(2.0),
            color=state.color.at[:3].set(jnp.uint32(0xABCDEF)),
            surf=state.surf.at[:3].set(True),
            free_stack=jnp.concatenate(
                [jnp.arange(3, nb, dtype=jnp.int32),
                 jnp.zeros((3,), jnp.int32)]),
            n_free=jnp.int32(nb - 3),
            dense_upto=jnp.int32(3),
        )
        state = blockmap.rehash(state, cfg)
        assert int(state.n_free) == nb - 1
        # invariants 5/6/7: free rows zero, no surf on free, stack exact
        assert_healthy(state, cfg)

    def test_rehash_returns_lost_slots(self):
        rng = np.random.default_rng(11)
        state = blockmap.create(SMALL)
        keys, _ = random_keys(rng, 100)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        state = blockmap.rehash(state, SMALL)
        assert_healthy(state, SMALL)
        assert int(state.n_free) + int(
            (np.asarray(state.block_key) != int(INVALID_KEY)).sum()) \
            == SMALL.num_blocks


class TestDensePool:
    def test_allocation_keeps_dense_prefix(self):
        rng = np.random.default_rng(21)
        state = blockmap.create(SMALL)
        assert int(state.dense_upto) == 0
        keys, _ = random_keys(rng, 60)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        assert int(state.dense_upto) == int(n)
        assert_healthy(state, SMALL)   # incl. invariant 8 (dense prefix)
        # second batch keeps extending contiguously
        keys2, _ = random_keys(rng, 40, lo=200, hi=300)
        state, n2 = blockmap.allocate(state, jnp.asarray(keys2), SMALL)
        assert int(state.dense_upto) == int(n) + int(n2)
        assert_healthy(state, SMALL)

    def test_holes_reused_before_watermark_moves(self):
        rng = np.random.default_rng(23)
        state = blockmap.create(SMALL)
        keys, _ = random_keys(rng, 50)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        wm0 = int(state.dense_upto)
        idx = jnp.asarray([3, 11, 19], jnp.int32)
        state = blockmap.delete_blocks(state, idx, jnp.ones(3, bool), SMALL)
        keys2, _ = random_keys(rng, 3, lo=300, hi=340)
        keys2 = np.unique(keys2)
        state, n2 = blockmap.allocate(state, jnp.asarray(keys2), SMALL)
        # the freed holes serve the new allocations; watermark unmoved
        assert int(state.dense_upto) == wm0
        pool_idx, found = blockmap.lookup(state, jnp.asarray(keys2), SMALL)
        assert bool(jnp.all(found))
        assert set(np.asarray(pool_idx)[:int(n2)].tolist()) <= {3, 11, 19}
        assert_healthy(state, SMALL)

    def test_delete_breaks_density_compact_restores(self):
        rng = np.random.default_rng(22)
        state = blockmap.create(SMALL)
        keys, _ = random_keys(rng, 80)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        # give allocated rows distinguishable payloads (|sdf| > voxel_size
        # so no surface flags are implied)
        state = state._replace(
            weight=state.weight.at[:int(n)].set(
                jnp.asarray(2.0, state.weight.dtype)),
            sdf=state.sdf.at[:int(n)].set(
                jnp.asarray(0.5, state.sdf.dtype)))
        idx = jnp.arange(SMALL.num_blocks, dtype=jnp.int32)
        mask = (idx < n) & (idx % 3 == 1)
        n_del = int(mask.sum())
        state = blockmap.delete_blocks(state, idx, mask, SMALL)
        # deletes punch holes BELOW the watermark; it doesn't move
        assert int(state.dense_upto) == int(n)
        assert_healthy(state, SMALL)

        state = blockmap.compact_pool(state, SMALL)
        n_now = int(n) - n_del
        assert int(state.dense_upto) == n_now
        assert_healthy(state, SMALL)
        # every surviving key still resolves to a row holding its payload
        kept = np.asarray(state.block_key)[:n_now]
        pool_idx, found = blockmap.lookup(state, jnp.asarray(kept), SMALL)
        assert bool(jnp.all(found))
        w = np.asarray(state.weight, np.float32)
        assert np.all(w[np.asarray(pool_idx), 0] == 2.0)
        # and new allocations extend the restored prefix
        keys3, _ = random_keys(rng, 10, lo=400, hi=450)
        state, n3 = blockmap.allocate(state, jnp.asarray(keys3), SMALL)
        assert int(state.dense_upto) == n_now + int(n3)
        assert_healthy(state, SMALL)

    def test_maybe_maintain_compacts_on_fragmentation(self):
        # fabricate fragmentation: allocate, delete most, re-allocate a
        # few (watermark stays high, allocated count low) -> the trigger
        # (wm - n_alloc > num_blocks//16 on the interval frame) fires
        rng = np.random.default_rng(31)
        state = blockmap.create(SMALL)
        keys, _ = random_keys(rng, 120)
        state, n = blockmap.allocate(state, jnp.asarray(keys), SMALL)
        idx = jnp.arange(SMALL.num_blocks, dtype=jnp.int32)
        mask = (idx < n) & (idx % 4 != 0)       # free 3/4 of the prefix
        state = blockmap.delete_blocks(state, idx, mask, SMALL)
        wm = int(state.dense_upto)
        n_alloc = SMALL.num_blocks - int(state.n_free)
        assert wm - n_alloc > SMALL.num_blocks // 16
        # off-interval frame: no compaction
        s2 = blockmap.maybe_maintain(state, SMALL,
                                     jnp.int32(SMALL.maintain_interval + 1))
        assert int(s2.dense_upto) == wm
        # interval frame: compacted to the allocated count
        s3 = blockmap.maybe_maintain(state, SMALL, jnp.int32(0))
        assert int(s3.dense_upto) == n_alloc
        assert_healthy(s3, SMALL)
