"""Offline SLAM driver: the headless analog of the reference's offline
batch mode (s_offlineProcessing, DepthSensing.cpp:885-892,1143-1148).

Replays a sequence (synthetic for now; TUM/.sens readers plug in here),
runs the full per-frame engine, reports per-stage counters and final
ATE RMSE vs the ground-truth trajectory.

Usage:
    python scripts/run_slam.py --frames 20 --preset tiny
    python scripts/run_slam.py --frames 30 --preset default --gt-init
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_config(preset: str):
    from voxelhashing_tpu.config import (CameraConfig, EngineConfig,
                                         FilterConfig, MapConfig,
                                         RaycastConfig, TrackerConfig)
    if preset == "tiny":
        cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                           cx=79.5, cy=59.5)
        return EngineConfig(
            camera=cam,
            map=MapConfig(voxel_size=0.02, truncation=0.06,
                          truncation_scale=0.01,
                          num_blocks=16384, table_size=65536,
                          max_active_blocks=16384),
            tracker=TrackerConfig(levels=2, max_outer_iter=(6, 4),
                                  max_inner_iter=(1, 1),
                                  dist_thres=(0.15, 0.15),
                                  normal_thres=(0.9, 0.9),
                                  angle_trans_thres=(1.0, 1.0),
                                  dist_trans_thres=(1.0, 1.0),
                                  residual_early_out=(1e-9, 1e-9)),
            filter=FilterConfig(depth_filter=False),
        )
    # default: the reference's real-time operating point (320x240, 4mm)
    return EngineConfig(
        camera=CameraConfig(),
        map=MapConfig(voxel_size=0.004, truncation=0.02,
                      truncation_scale=0.01,
                      num_blocks=1 << 16, table_size=1 << 18,
                      max_active_blocks=1 << 15),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--preset", default="tiny", choices=["tiny", "default"])
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--gt-init", action="store_true",
                    help="seed ICP from the GT pose each frame "
                         "(s_binaryDumpSensorUseTrajectoryOnlyInit)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import dataclasses
    from voxelhashing_tpu import blockmap, engine, evaluation
    from voxelhashing_tpu.io.synthetic import Scene, make_trajectory, render_depth

    cfg = build_config(args.preset)
    if args.gt_init:
        cfg = dataclasses.replace(cfg, use_trajectory_only_init=True)
    cam = cfg.camera
    scene = Scene()
    poses = make_trajectory(args.frames)

    step = engine.make_step(cfg, with_hint=args.gt_init, donate=False)
    state = engine.create(cfg, initial_pose=poses[0])

    est = []
    t0 = time.time()
    for i, pose_np in enumerate(poses):
        d, c = render_depth(pose_np, cam, scene, noise_sigma=args.noise,
                            seed=i)
        a = (state, jnp.asarray(np.nan_to_num(d, nan=0.0)), jnp.asarray(c))
        if args.gt_init:
            a += (jnp.asarray(pose_np),)
        state, diag = step(*a)
        est.append(np.asarray(state.pose))
        print(f"frame {i:3d}: blocks={int(diag.n_allocated_blocks):6d} "
              f"active={int(diag.n_active_blocks):6d} "
              f"res={float(diag.icp_residual):.2e} "
              f"corr={int(diag.icp_corr_count):6d} "
              f"valid={bool(diag.tracking_valid)}")
    dt = time.time() - t0

    ate = evaluation.ate_rmse(est, poses, align=False)
    viol = blockmap.check_invariants(state.map, cfg.map)
    print(f"\n{args.frames} frames in {dt:.1f}s "
          f"({args.frames/dt:.2f} fps incl. host loop)")
    print(f"ATE RMSE: {ate*1000:.2f} mm")
    print(f"invariants: {viol}")
    ok = ate < 0.02 and all(v == 0 for v in viol.values())
    print("RESULT:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
