"""Native C++ host runtime: chunk store + mesh weld (skip if no g++)."""

import os

import numpy as np
import pytest

from voxelhashing_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def make_blocks(n, key0=1000):
    rng = np.random.default_rng(0)
    keys = np.arange(key0, key0 + n, dtype=np.int32)
    sdf = rng.standard_normal((n, 512)).astype(np.float32)
    w = rng.random((n, 512)).astype(np.float32)
    c = rng.integers(0, 1 << 24, (n, 512)).astype(np.uint32)
    return keys, sdf, w, c


class TestNativeChunkStore:
    def test_file_count_pop_roundtrip(self):
        store = native.NativeChunkStore(blocks_per_chunk=4,
                                        world_blocks=1024)
        # keys near world centre: world coords ~ 0 -> chunks near origin
        centre_key = (512 * 1024 + 512) * 1024 + 512
        keys, sdf, w, c = make_blocks(16, key0=centre_key)
        store.file_blocks(keys, sdf, w, c)
        assert store.block_count() == 16
        assert store.chunk_count() >= 1

        # pop everything with a huge sphere at the block location
        k2, s2, w2, c2 = store.pop_in_sphere(
            np.zeros(3, np.float32), radius=1e6, chunk_size_world=0.128,
            max_chunks=100, cap=64)
        assert store.block_count() == 0
        order = np.argsort(k2)
        np.testing.assert_array_equal(np.sort(k2), keys)
        np.testing.assert_allclose(s2[order], sdf, atol=0)
        np.testing.assert_array_equal(c2[order], c)

    def test_sphere_filter(self):
        store = native.NativeChunkStore(blocks_per_chunk=4,
                                        world_blocks=1024)
        centre_key = (512 * 1024 + 512) * 1024 + 512
        keys, sdf, w, c = make_blocks(4, key0=centre_key)
        store.file_blocks(keys, sdf, w, c)
        # sphere far away: nothing pops
        k2, *_ = store.pop_in_sphere(
            np.array([100.0, 0, 0], np.float32), radius=1.0,
            chunk_size_world=0.128, max_chunks=10, cap=16)
        assert len(k2) == 0 and store.block_count() == 4

    def test_save_load(self, tmp_path):
        store = native.NativeChunkStore(4, 1024)
        centre_key = (512 * 1024 + 512) * 1024 + 512
        keys, sdf, w, c = make_blocks(8, key0=centre_key)
        store.file_blocks(keys, sdf, w, c)
        p = os.path.join(tmp_path, "chunks.bin")
        store.save(p)
        store2 = native.NativeChunkStore(4, 1024)
        store2.load_file(p)
        assert store2.block_count() == 8

    def test_chunk_ids(self):
        store = native.NativeChunkStore(4, 1024)
        centre_key = (512 * 1024 + 512) * 1024 + 512
        keys, sdf, w, c = make_blocks(4, key0=centre_key)
        store.file_blocks(keys, sdf, w, c)
        ids = store.chunk_ids(grid_dim=65)
        assert len(ids) == store.chunk_count()
        assert (ids >= 0).all() and (ids < 65 ** 3).all()


class TestNativeWeld:
    def test_weld_dedups_shared_vertices(self, tmp_path):
        # two triangles sharing an edge: 6 corners -> 4 welded vertices
        tris = np.array([
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ], np.float32)
        p = os.path.join(tmp_path, "m.ply")
        n = native.weld_save_ply(p, tris, None, 1e-5)
        assert n == 2
        data = open(p, "rb").read()
        assert b"element vertex 4" in data
        assert b"element face 2" in data

    def test_weld_with_colors(self, tmp_path):
        tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        cols = np.full((1, 3, 3), 0.5, np.float32)
        p = os.path.join(tmp_path, "mc.ply")
        n = native.weld_save_ply(p, tris, cols, 1e-5)
        assert n == 1
        assert b"property uchar red" in open(p, "rb").read()
