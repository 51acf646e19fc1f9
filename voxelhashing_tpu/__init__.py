"""voxelhashing_tpu: a TPU-native dense RGB-D SLAM engine.

Brand-new JAX/XLA/Pallas implementation of the full VoxelHashing pipeline
(Nießner et al. 2013; reference surveyed in SURVEY.md): sparse TSDF voxel
map, per-frame depth integration, raycast surface prediction,
multi-resolution projective-ICP tracking, garbage collection, marching
cubes, and host<->HBM streaming — re-designed for TPU (sorted/hashed
block-sparse map instead of a pointer-chasing GPU hash; deterministic
prefix-sum allocation instead of atomics; the whole solve on device).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import EngineConfig, CameraConfig, MapConfig  # noqa: F401
