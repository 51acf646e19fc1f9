"""Visualization: shading, render modes, image/point-cloud export.

The display stack of the reference app re-expressed as pure image math
(/root/reference/DepthSensingCUDA/Source/DepthSensing.cpp:1050-1126 render
modes; DX11PhongLighting deferred shading; Util.h writeToImage;
RGBDSensor::savePointCloud RGBDSensor.h:82).  No window system — outputs
are arrays / files (the headless renderToFile path, :1159-1255).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import CameraConfig
from .ops.image import depth_to_hsv
from .raycast import RaycastResult

RENDER_MODES = ("phong", "depth", "color", "normal", "input_depth",
                "input_color", "input_normal")


def phong_shade(points, normals, albedo=None,
                light_dir=(0.3, -0.5, -0.8), ambient=0.2, diffuse=0.7,
                specular=0.3, shininess=16.0):
    """Per-pixel Phong shading of a camera-space position+normal map
    (DX11PhongLighting's deferred pass with the default material/light
    parameters from the config block)."""
    ld = jnp.asarray(light_dir, jnp.float32)
    ld = ld / jnp.linalg.norm(ld)
    n = normals
    valid = jnp.all(jnp.isfinite(n), axis=-1) \
        & jnp.all(jnp.isfinite(points), axis=-1)
    n = jnp.where(valid[..., None], n, 0.0)
    # make normals face the camera (z towards viewer at -z of the ray dir)
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)

    ndotl = jnp.clip(jnp.sum(n * (-ld), axis=-1), 0.0, 1.0)
    view = -points / jnp.maximum(
        jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-9)
    h = view - ld
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    spec = jnp.clip(jnp.sum(n * h, axis=-1), 0.0, 1.0) ** shininess

    base = albedo if albedo is not None else jnp.full(
        points.shape[:-1] + (3,), 0.7, jnp.float32)
    shade = (ambient + diffuse * ndotl)[..., None] * base \
        + (specular * spec)[..., None]
    out = jnp.clip(shade, 0.0, 1.0)
    return jnp.where(valid[..., None], out, 0.0)


def normals_to_rgb(normals):
    """Normal map -> RGB visualization ([-1,1] -> [0,1])."""
    ok = jnp.all(jnp.isfinite(normals), axis=-1, keepdims=True)
    return jnp.where(ok, 0.5 * (normals + 1.0), 0.0)


def render_frame(mode: str, model: Optional[RaycastResult],
                 input_frame=None, cam: Optional[CameraConfig] = None):
    """One of the app's render modes (keys '1'-'7',
    DepthSensing.cpp:1050-1126) as an RGB [h,w,3] array in [0,1]."""
    cam = cam or CameraConfig()
    if mode == "phong":
        albedo = model.color if model.color is not None else None
        return phong_shade(model.points, model.normals, albedo)
    if mode == "depth":
        return depth_to_hsv(model.depth, cam.depth_min, cam.depth_max)
    if mode == "color":
        return model.color
    if mode == "normal":
        return normals_to_rgb(model.normals)
    if mode == "input_depth":
        return depth_to_hsv(input_frame.depth, cam.depth_min, cam.depth_max)
    if mode == "input_color":
        return input_frame.color
    if mode == "input_normal":
        return normals_to_rgb(input_frame.normals)
    raise ValueError(f"unknown render mode {mode!r}")


def march_cost_map(state, pose, cam: CameraConfig, map_cfg, rc,
                   active_idx=None, active_mask=None):
    """Per-pixel march-sample-count heat map in [0,1] — the diagnostic the
    DX11 app renders via RayMarchingStepsSplatting.hlsl (visualizes how
    tight the per-tile ray-interval bounds are; white = full budget).

    Returns RGB [h,w,3]: grayscale steps/num_samples. With splat bounds
    enabled most pixels should be well below budget; a white image means
    the tile bounds degenerated to the global depth range.
    """
    import jax.numpy as _jnp
    from . import blockmap as _bm, geometry as _geom, raycast as _rc
    view = _geom.invert_rigid(pose)
    if active_idx is None:
        active_idx, n_active, _ = _bm.compactify(state, view, cam, map_cfg)
        active_mask = _jnp.arange(active_idx.shape[0]) < n_active
    h, w = cam.height, cam.width
    d = rc.derived(map_cfg)
    if rc.splat_enabled:
        tmin_t, tmax_t = _rc.ray_interval_splat(
            state, active_idx, active_mask, view, cam, map_cfg, rc)
        tile = rc.splat_tile
        iy = (_jnp.arange(h) // tile)
        ix = (_jnp.arange(w) // tile)
        t_min = _jnp.maximum(
            tmin_t[iy[:, None], ix[None, :]] - map_cfg.truncation,
            cam.depth_min)
        t_max = _jnp.minimum(
            tmax_t[iy[:, None], ix[None, :]] + map_cfg.truncation,
            cam.depth_max)
    else:
        t_min = _jnp.full((h, w), cam.depth_min, _jnp.float32)
        t_max = _jnp.full((h, w), cam.depth_max, _jnp.float32)
    band = _jnp.maximum(t_max - t_min, 0.0)
    dt = _jnp.maximum(d["ray_increment"], band / (rc.num_samples - 1))
    steps = _jnp.clip(band / dt + 1.0, 0.0, float(rc.num_samples))
    g = (steps / float(rc.num_samples))[..., None]
    return _jnp.broadcast_to(g, (h, w, 3))


def save_image(path: str, rgb) -> None:
    """Write an RGB [h,w,3] array in [0,1] as PNG (Util::writeToImage)."""
    from PIL import Image
    arr = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class RenderToFile:
    """Per-frame image-stream dumper (renderToFile,
    DepthSensing.cpp:1159-1255: input color/depth + reconstruction
    renders, numbered files per stream)."""

    def __init__(self, out_dir: str, modes=("phong", "depth")):
        self.out_dir = out_dir
        self.modes = modes
        self.frame = 0
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, model: RaycastResult, input_frame=None,
                 cam: Optional[CameraConfig] = None):
        for mode in self.modes:
            img = render_frame(mode, model, input_frame, cam)
            save_image(os.path.join(
                self.out_dir, f"{mode}_{self.frame:06d}.png"), img)
        self.frame += 1


def save_point_cloud(path: str, points, colors=None, normals=None) -> int:
    """Write a camera/world-space position map (or [N,3] array) as a PLY
    point cloud (RGBDSensor::savePointCloud). Returns point count."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    ok = np.isfinite(pts).all(axis=1)
    pts = pts[ok]
    cols = None
    if colors is not None:
        cols = np.clip(np.asarray(colors, np.float32).reshape(-1, 3)[ok]
                       * 255.0, 0, 255).astype(np.uint8)
    nrm = None
    if normals is not None:
        nrm = np.asarray(normals, np.float32).reshape(-1, 3)[ok]
        nrm = np.nan_to_num(nrm)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(pts)}",
               "property float x", "property float y", "property float z"]
        if nrm is not None:
            hdr += ["property float nx", "property float ny",
                    "property float nz"]
        if cols is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += ["end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        fields = [("p", np.float32, 3)]
        if nrm is not None:
            fields.append(("n", np.float32, 3))
        if cols is not None:
            fields.append(("c", np.uint8, 3))
        rec = np.zeros(len(pts), dtype=fields)
        rec["p"] = pts
        if nrm is not None:
            rec["n"] = nrm
        if cols is not None:
            rec["c"] = cols
        f.write(rec.tobytes())
    return len(pts)
