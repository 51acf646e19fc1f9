"""Calibrate the planar-degeneracy gate (tracking._planarity).

Prints the normal-scatter second invariant I2 ~ lam2/lam1 per frame for
the stress-suite scenarios: the bare-wall pan (frames 4-7 must fire the
gate), the cluttered/easy/fast-motion scenes (must never fire). The
threshold `TrackerConfig.normal_aniso_thres` sits between the two bands.

I2 here is computed over the valid input-frame normals with unit weights —
the gate weighs by correspondence confidence, but the normal distribution
(what I2 measures) is set by the scene, so the bands match.

Run: python scripts/measure_planarity.py   (CPU is fine)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax.numpy as jnp

from voxelhashing_tpu.config import CameraConfig, FilterConfig
from voxelhashing_tpu.io.synthetic import (Box, Scene, Sphere, clutter_scene,
                                           kinect_noise, make_trajectory,
                                           render_depth)
from voxelhashing_tpu.ops.image import preprocess

CAM = CameraConfig(width=160, height=120, fx=130.0, fy=130.0,
                   cx=79.5, cy=59.5)
FLT = FilterConfig(depth_filter=True)


def i2_of_frame(depth):
    f = preprocess(jnp.asarray(np.nan_to_num(depth, nan=0.0)), None, CAM,
                   FLT)
    n = np.asarray(f.normals).reshape(-1, 3)
    ok = np.isfinite(n).all(axis=1)
    n = n[ok]
    s = n.T @ n
    tr = np.trace(s)
    sh = s / max(tr, 1e-12)
    return 0.5 * (1.0 - np.sum(sh * sh.T)), len(n)


def wall_pan_scene():
    return Scene(
        wall_z=2.6, floor_y=None,
        spheres=(Sphere(center=(-0.5, 0.2, 2.0), radius=0.3),
                 Sphere(center=(-0.9, -0.2, 2.2), radius=0.25,
                        color=(0.2, 0.5, 0.8))),
        boxes=(Box(lo=(-0.7, -0.1, 1.3), hi=(-0.4, 0.4, 1.6)),
               Box(lo=(-1.1, 0.3, 1.7), hi=(-0.7, 0.7, 2.0),
                   color=(0.4, 0.3, 0.6))))


def roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def main():
    scene = wall_pan_scene()
    print("== wall-pan scenario (frames 4-7 = bare wall) ==")
    for i in range(12):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = roty(0.55) if 4 <= i < 8 else roty(-0.15 + 0.004 * i)
        p[0, 3] = 0.005 * i
        d, _ = render_depth(p, CAM, scene)
        i2, n = i2_of_frame(d)
        print(f"frame {i:2d}: I2={i2:.3e}  ({n} px)"
              + ("   <- BARE WALL" if 4 <= i < 8 else ""))

    for name, sc, noisy in (("clutter", clutter_scene(), True),
                            ("clutter clean", clutter_scene(), False),
                            ("easy default", Scene(), False)):
        vals = []
        for i, p in enumerate(make_trajectory(8)):
            d, _ = render_depth(p, CAM, sc)
            if noisy:
                d = kinect_noise(d, CAM, seed=i)
            vals.append(i2_of_frame(d)[0])
        print(f"== {name}: I2 min={min(vals):.3e} max={max(vals):.3e}")


if __name__ == "__main__":
    main()
