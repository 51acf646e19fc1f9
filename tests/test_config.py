"""Reference parameter-file parsing: all three shipped zParameters*.txt
files must produce an EngineConfig whose capacities/geometry match the
files (GlobalAppState::readMembers semantics, GlobalAppState.h:28-131)."""

import os

import pytest

from voxelhashing_tpu.config import (EngineConfig, engine_config_from_parameters,
                                     parse_parameter_file)

REF = "/root/reference"


def _load(name):
    path = os.path.join(REF, name)
    if not os.path.exists(path):
        pytest.skip(f"reference parameter file {name} not available")
    with open(path, "r", errors="replace") as f:
        return parse_parameter_file(f.read())


class TestParameterFiles:
    def test_default_file(self):
        """zParametersDefault.txt:9-111 — the real-time operating point."""
        cfg = engine_config_from_parameters(_load("zParametersDefault.txt"))
        assert cfg.camera.width == 320 and cfg.camera.height == 240
        assert cfg.camera.depth_min == pytest.approx(0.5)
        assert cfg.camera.depth_max == pytest.approx(5.0)
        assert cfg.map.voxel_size == pytest.approx(0.004)
        assert cfg.map.truncation == pytest.approx(0.02)
        assert cfg.map.truncation_scale == pytest.approx(0.01)
        # capacities (zParametersDefault.txt:34-36): 1M SDF blocks; table
        # = next pow2 >= max(2*blocks, 500k buckets)
        assert cfg.map.num_blocks == 1_000_000
        assert cfg.map.table_size == 1 << 21
        assert cfg.map.table_size >= 2 * cfg.map.num_blocks
        assert cfg.map.max_active_blocks <= cfg.map.num_blocks
        # GC (zParametersDefault.txt:66-67)
        assert cfg.map.gc_enabled is False
        assert cfg.map.gc_starve_interval == 15
        # streaming geometry (zParametersDefault.txt:94-101)
        assert cfg.streaming.enabled is False
        assert cfg.streaming.chunk_size == pytest.approx(1.0)
        assert cfg.streaming.grid_dim == 257
        assert cfg.streaming.radius == pytest.approx(5.0)
        assert cfg.streaming.out_parts == 80
        assert cfg.mesh.max_triangles == 2_500_000
        assert cfg.offline is False

    def test_manolis_scan_file(self):
        """zParametersManolisScan.txt:29-106 — the large-scale scan point."""
        cfg = engine_config_from_parameters(
            _load("zParametersManolisScan.txt"))
        assert cfg.camera.depth_max == pytest.approx(8.0)
        assert cfg.camera.depth_min == pytest.approx(0.4)
        assert cfg.map.voxel_size == pytest.approx(0.010)
        assert cfg.map.truncation == pytest.approx(0.06)
        assert cfg.map.num_blocks == 800_000
        assert cfg.map.table_size == 1 << 21      # >= 1.6M
        assert cfg.streaming.chunk_size == pytest.approx(2.0)
        assert cfg.streaming.grid_dim == 513
        assert cfg.streaming.radius == pytest.approx(4.0)
        assert cfg.mesh.max_triangles == 9_000_000

    def test_tracking_file(self):
        """zParametersTrackingDefault.txt:1-37 — ICP budgets."""
        cfg = engine_config_from_parameters(
            _load("zParametersTrackingDefault.txt"))
        tk = cfg.tracker
        assert tk.levels == 3
        assert tk.max_outer_iter == (8, 6, 4)
        assert tk.dist_thres == pytest.approx((0.15, 0.15, 0.15))

    def test_vector_value_grammar(self):
        """Space-separated vec3 values parse to numeric lists."""
        p = parse_parameter_file(
            's_streamingVoxelExtents = 1.0f 1.0f 1.0f;\n'
            's_streamingGridDimensions = 513 513 513;\n'
            's_name = "hello world";\n')
        assert p["s_streamingVoxelExtents"] == [1.0, 1.0, 1.0]
        assert p["s_streamingGridDimensions"] == [513, 513, 513]
        assert p["s_name"] == "hello world"

    def test_capacity_from_params_keeps_invariants(self):
        """Arbitrary capacities keep table power-of-two/2x invariants."""
        cfg = engine_config_from_parameters(
            {"s_hashNumSDFBlocks": 12345, "s_hashNumBuckets": 1000})
        assert cfg.map.num_blocks == 12345
        ts = cfg.map.table_size
        assert ts >= 2 * 12345 and (ts & (ts - 1)) == 0
