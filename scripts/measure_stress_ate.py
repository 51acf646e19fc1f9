"""Regenerate the BASELINE.md stress-ATE table (tests/test_stress.py
scenarios, free tracking, CPU backend is fine).

The test suite asserts each scenario at 1.5x these values; when a
legitimate change moves a floor, rerun this, update the table AND the
bounds together.

Run: python scripts/measure_stress_ate.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voxelhashing_tpu import engine, evaluation  # noqa: E402
from voxelhashing_tpu.config import (CameraConfig, EngineConfig,  # noqa: E402
                                     FilterConfig, MapConfig, TrackerConfig)
from voxelhashing_tpu.io.synthetic import (Scene, clutter_scene,  # noqa: E402
                                           kinect_noise, make_trajectory,
                                           render_depth)

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
CFG = EngineConfig(
    camera=CAM,
    map=MapConfig(voxel_size=0.02, truncation=0.06, truncation_scale=0.01,
                  num_blocks=16384, table_size=65536,
                  max_active_blocks=16384, world_blocks=1024),
    tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                          max_inner_iter=(1, 1),
                          dist_thres=(0.15, 0.15), normal_thres=(0.9, 0.9),
                          angle_trans_thres=(1.0, 1.0),
                          dist_trans_thres=(1.0, 1.0),
                          residual_early_out=(1e-9, 1e-9)),
    filter=FilterConfig(depth_filter=True),
)


def run(scene, poses, noisy):
    step = engine.make_step(CFG, donate=False)
    state = engine.create(CFG, initial_pose=poses[0])
    est, lost = [], 0
    for i, p in enumerate(poses):
        d, c = render_depth(p, CAM, scene)
        if noisy:
            d = kinect_noise(d, CAM, seed=i)
        state, diag = step(state, jnp.asarray(np.nan_to_num(d, nan=0.0)),
                           jnp.asarray(c))
        est.append(np.asarray(state.pose))
        lost += not bool(diag.tracking_valid)
    return evaluation.ate_rmse(est, poses, align=False), lost


def main():
    rows = [
        ("easy (plane+spheres), exact", Scene(), make_trajectory(10), False),
        ("easy + Kinect noise", Scene(), make_trajectory(10), True),
        ("clutter + occlusion, exact", clutter_scene(),
         make_trajectory(10), False),
        ("clutter + occlusion + noise", clutter_scene(),
         make_trajectory(10), True),
        ("clutter, 5x fast", clutter_scene(),
         make_trajectory(8, translation_step=0.04, rotation_step=0.02),
         False),
        ("clutter, 5x fast + noise", clutter_scene(),
         make_trajectory(8, translation_step=0.04, rotation_step=0.02),
         True),
    ]
    for name, scene, poses, noisy in rows:
        ate, lost = run(scene, poses, noisy)
        print(f"{name:38s} ATE {ate*1000:6.1f} mm   lost {lost}/{len(poses)}")


if __name__ == "__main__":
    main()
