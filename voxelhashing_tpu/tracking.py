"""Frame-to-model camera tracking: multi-resolution projective ICP.

TPU-native re-derivation of ``CUDACameraTrackingMultiRes`` (/root/reference/
DepthSensingCUDA/Source/CUDACameraTrackingMultiRes.cpp:252-348) and its
kernels:

* Projective correspondence search (``projectiveCorrespondencesKernel``,
  CUDAImageHelper.cu:70-125) as one fused gather + mask pass per iteration.
* Point-to-plane normal equations: instead of the reference's shared-memory
  tree reduction into 30 floats per CUDA block followed by a **CPU** sum and
  an Eigen SVD solve (CUDABuildLinearSystem.cu:92-181,
  CUDABuildLinearSystem.cpp:45-92, CUDACameraTrackingMultiRes.cpp:232-233),
  the whole system is reduced with one XLA reduction and solved on device
  with a 6x6 SVD — the per-iteration device->host sync is gone; only the
  final pose ever leaves the chip.
* Coarse-to-fine over a decimation pyramid with per-level iteration budgets
  and residual early-out (GlobalCameraTrackingState defaults,
  zParametersTrackingDefault.txt:1-37); iteration counts are static so the
  whole tracker jits as straight-line code with `done` masking.
* Tracking-lost detection mirrors the reference's three levels: per-step
  pose-delta thresholds (checkRigidTransformation,
  CUDACameraTrackingMultiRes.cpp:183-192), system degeneracy / condition
  number (:228-237), and the -inf-matrix "lost" sentinel becomes a boolean
  in :class:`TrackingResult`.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import CameraConfig, TrackerConfig
from . import geometry as geom
from .ops.image import resample_half


class TrackingResult(NamedTuple):
    pose: jax.Array        # f32[4,4] new camera-to-world estimate
    valid: jax.Array       # bool[]   False = tracking lost (keep last pose)
    residual: jax.Array    # f32[]    mean point-to-plane residual (finest lvl)
    corr_count: jax.Array  # i32[]    correspondences at the finest level
    condition: jax.Array   # f32[]    condition number of the last 6x6 system


def _level_camera(cam: CameraConfig, level: int) -> CameraConfig:
    """Intrinsics for pyramid level built by even-pixel decimation:
    u_l = u/2^l exactly at kept pixels => fx,cx scale by 1/2^l."""
    s = 1 << level
    return dataclasses.replace(
        cam, width=cam.width // s, height=cam.height // s,
        fx=cam.fx / s, fy=cam.fy / s, cx=cam.cx / s, cy=cam.cy / s)


def build_pyramid(points, normals, levels: int):
    """Decimation pyramid of (points, normals), level 0 = finest.

    The reference resamples both maps then renormalises the normals
    (CUDACameraTrackingMultiRes.cpp:271-278); decimation keeps the exact
    camera model of :func:`_level_camera`.
    """
    pyr = [(points, normals)]
    for _ in range(1, levels):
        points = resample_half(points)
        normals = resample_half(normals)
        pyr.append((points, normals))
    return pyr


def _build_system(delta, in_pts, in_nrm, tgt_pts, tgt_nrm,
                  cam: CameraConfig, dist_thres: float, normal_thres: float,
                  depth_min: float, depth_max: float):
    """One projective-association + normal-equation pass.

    Returns (A[6,6], b[6], sum_res, sum_w, count): the point-to-plane
    Gauss-Newton system about the current delta.

    Linearisation (matches the reference's packing semantics,
    CUDABuildLinearSystem.cu:71-114): residual e = n_q . (p' - q) with
    p' = delta(p); about identity p'' = p' + w x p' + t, so the Jacobian row
    is j = [p' x n_q | n_q] and the rhs accumulates -j * e.
    """
    r = delta[:3, :3]
    p = in_pts @ r.T + delta[:3, 3]                # [..,3] transformed input
    n = in_nrm @ r.T

    uv = geom.camera_to_screen_int(p, cam)
    ui = jnp.clip(uv[..., 0], 0, cam.width - 1)
    vi = jnp.clip(uv[..., 1], 0, cam.height - 1)
    on = ((uv[..., 0] >= 0) & (uv[..., 0] < cam.width)
          & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height))

    q = tgt_pts[vi, ui]                            # [..,3]
    nq = tgt_nrm[vi, ui]

    d = p - q
    dist = jnp.linalg.norm(d, axis=-1)
    ndot = jnp.sum(n * nq, axis=-1)
    ok = (on
          & jnp.all(jnp.isfinite(p), axis=-1) & jnp.all(jnp.isfinite(n), -1)
          & jnp.all(jnp.isfinite(q), axis=-1) & jnp.all(jnp.isfinite(nq), -1)
          & (dist <= dist_thres) & (ndot >= normal_thres))

    # Confidence weight (CUDAImageHelper.cu:117): distance + depth falloff.
    depth01 = jnp.clip((p[..., 2] - depth_min) / (depth_max - depth_min),
                       0.0, 1.0)
    wgt = 0.5 * ((1.0 - dist / dist_thres) + (1.0 - depth01))
    wgt = jnp.where(ok, jnp.maximum(wgt, 0.0), 0.0)

    e = jnp.sum(nq * d, axis=-1)                   # point-to-plane residual
    # Jacobian row about identity: e ~ e0 + (p x n).w + n.t.  The solve's x
    # is delinearised as Euler ZYX (pose_from_x), whose small-angle rotation
    # vector is (gamma, beta, alpha) = (w_x, w_y, w_z) with x = (alpha, beta,
    # gamma, t): so the rotation block is REVERSED: (w_z, w_y, w_x).
    cr = jnp.cross(p, nq)
    j = jnp.concatenate([cr[..., ::-1], nq], axis=-1)      # [..,6]
    j = jnp.where(ok[..., None], j, 0.0)
    e = jnp.where(ok, e, 0.0)

    jw = j * wgt[..., None]
    a = jnp.einsum("...i,...j->ij", jw, j)
    b = -jnp.sum(jw * e[..., None], axis=tuple(range(e.ndim)))
    sum_res = jnp.sum(wgt * e * e)
    sum_w = jnp.sum(wgt)
    count = jnp.sum(ok.astype(jnp.int32))
    return a, b, sum_res, sum_w, count


def _solve6(a, b, cond_thres: float):
    """Solve the 6x6 system with SVD + condition gate, on device.

    Mirrors the Eigen JacobiSVD solve and sigma0/sigma5 condition check
    (CUDACameraTrackingMultiRes.cpp:228-237).
    """
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    cond = s[0] / jnp.maximum(s[5], 1e-20)
    degenerate = (s[5] < 1e-10) | (cond > cond_thres) | ~jnp.all(
        jnp.isfinite(a))
    s_inv = jnp.where(s > 1e-10, 1.0 / s, 0.0)
    x = vt.T @ (s_inv * (u.T @ b))
    x = jnp.where(degenerate, jnp.zeros_like(x), x)
    return x, cond, degenerate


def _check_step(x, angle_thres: float, dist_thres: float):
    """Per-step plausibility gate (checkRigidTransformation,
    CUDACameraTrackingMultiRes.cpp:183-192)."""
    r = geom.euler_zyx_to_matrix(x[:3])
    ang = geom.rotation_angle(r)
    return (ang <= angle_thres) & (jnp.linalg.norm(x[3:6]) <= dist_thres)


def _build_system_color(delta, in_pts, in_int, tgt_int, tgt_gx, tgt_gy,
                        cam: CameraConfig, dist_sigma: float):
    """Photometric (intensity) rows of the joint RGB-D system.

    The reference's RGBD variant adds intensity + intensity-derivative
    residuals (CUDABuildLinearSystemRGBD.cu:78-104, jacobians from
    ICPUtil.h dehomogenize-derivative :16-28): residual
    e = I_model(pi(delta p)) - I_input(p); the jacobian row is
    a = J_pi^T grad(I); j = [(p x a) reversed | a].
    """
    r = delta[:3, :3]
    p = in_pts @ r.T + delta[:3, 3]

    uv = geom.camera_to_screen_int(p, cam)
    ui = jnp.clip(uv[..., 0], 0, cam.width - 1)
    vi = jnp.clip(uv[..., 1], 0, cam.height - 1)
    on = ((uv[..., 0] >= 0) & (uv[..., 0] < cam.width)
          & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height))

    i_t = tgt_int[vi, ui]
    gx = tgt_gx[vi, ui]
    gy = tgt_gy[vi, ui]
    e = i_t - in_int

    z = jnp.where(p[..., 2] == 0.0, 1e-12, p[..., 2])
    # a = J_pi^T [gx, gy]
    ax = gx * cam.fx / z
    ay = gy * cam.fy / z
    az = -(gx * cam.fx * p[..., 0] + gy * cam.fy * p[..., 1]) / (z * z)
    a = jnp.stack([ax, ay, az], axis=-1)

    ok = (on & jnp.all(jnp.isfinite(p), axis=-1) & jnp.isfinite(in_int)
          & jnp.isfinite(i_t) & jnp.isfinite(gx) & jnp.isfinite(gy)
          & (jnp.abs(e) < dist_sigma))
    wgt = jnp.where(ok, 1.0 - jnp.abs(e) / dist_sigma, 0.0)

    cr = jnp.cross(p, a)
    j = jnp.concatenate([cr[..., ::-1], a], axis=-1)
    j = jnp.where(ok[..., None], j, 0.0)
    e = jnp.where(ok, e, 0.0)
    jw = j * wgt[..., None]
    a_mat = jnp.einsum("...i,...j->ij", jw, j)
    b = -jnp.sum(jw * e[..., None], axis=tuple(range(e.ndim)))
    return a_mat, b, jnp.sum(wgt * e * e), jnp.sum(wgt), \
        jnp.sum(ok.astype(jnp.int32))


def intensity_gradients(intensity):
    """Central-difference image gradients (the intensity-derivative maps of
    CameraTrackingInput.h:17-27)."""
    gx = jnp.zeros_like(intensity)
    gy = jnp.zeros_like(intensity)
    gx = gx.at[:, 1:-1].set(0.5 * (intensity[:, 2:] - intensity[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (intensity[2:, :] - intensity[:-2, :]))
    return gx, gy


def track(input_points, input_normals, model_points, model_normals,
          last_pose, cam: CameraConfig, cfg: TrackerConfig,
          input_intensity=None, model_intensity=None,
          weight_depth: float = 1.0, weight_color: float = 0.1,
          color_sigma: float = 0.1) -> TrackingResult:
    """Align the current frame to the raycast model; returns the new pose.

    ``input_*``: current-frame camera-space maps; ``model_*``: raycast maps
    in the last pose's camera frame. The solved delta maps current-frame
    camera space to last-frame camera space; new_pose = last_pose @ delta
    (the reference's applyCT contract, CUDACameraTrackingMultiRes.cpp:252-348).

    When both intensities are given, photometric residuals join the system
    (the RGBD variant, CUDACameraTrackingMultiResRGBD; disabled by default
    like the reference's useRGBDTracking=false, DepthSensing.cpp:816).
    """
    levels = cfg.levels
    in_pyr = build_pyramid(input_points, input_normals, levels)
    md_pyr = build_pyramid(model_points, model_normals, levels)
    use_rgbd = input_intensity is not None and model_intensity is not None
    if use_rgbd:
        ii_pyr, mi_pyr = [input_intensity], [model_intensity]
        for _ in range(1, levels):
            ii_pyr.append(resample_half(ii_pyr[-1]))
            mi_pyr.append(resample_half(mi_pyr[-1]))

    delta = jnp.eye(4, dtype=jnp.float32)
    lost = jnp.array(False)
    residual = jnp.float32(0.0)
    corr = jnp.int32(0)
    condition = jnp.float32(0.0)

    for level in range(levels - 1, -1, -1):        # coarse -> fine
        cam_l = _level_camera(cam, level)
        in_p, in_n = in_pyr[level]
        md_p, md_n = md_pyr[level]
        done = jnp.array(False)
        last_res = jnp.float32(jnp.inf)
        for _ in range(cfg.max_outer_iter[level]):
            a, b, sum_res, sum_w, count = _build_system(
                delta, in_p, in_n, md_p, md_n, cam_l,
                cfg.dist_thres[level], cfg.normal_thres[level],
                cam.depth_min, cam.depth_max)
            if use_rgbd:
                gx, gy = intensity_gradients(mi_pyr[level])
                a_c, b_c, res_c, w_c, n_c = _build_system_color(
                    delta, in_p, ii_pyr[level], mi_pyr[level], gx, gy,
                    cam_l, color_sigma)
                a = weight_depth * a + weight_color * a_c
                b = weight_depth * b + weight_color * b_c
                sum_res = weight_depth * sum_res + weight_color * res_c
                sum_w = weight_depth * sum_w + weight_color * w_c
            mean_res = sum_res / jnp.maximum(sum_w, 1e-12)
            # Residual early-out (reference :300-335).
            done |= jnp.abs(last_res - mean_res) < cfg.residual_early_out[level]
            last_res = mean_res

            x, cond, degen = _solve6(a, b, cfg.cond_thres)
            step_ok = _check_step(x, cfg.angle_trans_thres[level],
                                  cfg.dist_trans_thres[level])
            # Degenerate or implausible at any level => tracking lost
            # (reference signals with the -inf matrix, :96, :228-246).
            bad = degen | ~step_ok | (count < 64)
            lost |= bad & ~done
            use = ~done & ~bad
            delta = jnp.where(use, geom.pose_from_x(x) @ delta, delta)
            residual = jnp.where(use | done, mean_res, residual)
            corr = jnp.where(use | done, count, corr)
            condition = jnp.where(use, cond, condition)
            done |= bad

    new_pose = last_pose @ delta
    valid = ~lost & jnp.all(jnp.isfinite(new_pose))
    pose_out = jnp.where(valid, new_pose, last_pose)
    return TrackingResult(pose=pose_out, valid=valid, residual=residual,
                          corr_count=corr, condition=condition)
