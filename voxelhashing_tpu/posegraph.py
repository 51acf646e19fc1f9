"""SLAM layer: keyframes, loop closure, pose-graph optimization.

Beyond the reference's scope (SURVEY.md §7 phase 5; the reference is pure
frame-to-model odometry with no global consistency): a keyframe graph with
relative-pose constraints, ICP-verified loop closures, an on-device
Gauss-Newton pose-graph solver (autodiff jacobians, dense normal equations
— keyframe counts are small), and trajectory-consistent re-integration of
the map (the capability InfiniTAM v3 added over the original VoxelHashing).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CameraConfig, TrackerConfig
from . import geometry as geom, tracking


# ---------------------------------------------------------------------------
# SE(3) helpers
# ---------------------------------------------------------------------------


def se3_exp(xi):
    """se(3) 6-vector (rx,ry,rz,tx,ty,tz) -> 4x4 Rodrigues rotation.

    Taylor-safe coefficients: GN linearizes the residuals EXACTLY at
    xi = 0, and ``jnp.linalg.norm``'s sqrt has a NaN jacobian there (the
    original norm-based form silently NaN'd the rotation block of every
    optimized pose while translations solved fine — caught by run_slam
    --reintegrate). sin(t)/t and (1-cos t)/t^2 switch to their Taylor
    expansions below t^2 = 1e-10; both where-branches stay finite for all
    inputs so the gradients are clean."""
    w = xi[:3]
    t2 = jnp.sum(w * w)
    small = t2 < 1e-10
    t2s = jnp.where(small, 1.0, t2)       # keeps the exact branch finite
    th = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2s)
    wx = jnp.array([[0.0, -w[2], w[1]],
                    [w[2], 0.0, -w[0]],
                    [-w[1], w[0], 0.0]])
    r = jnp.eye(3) + a * wx + b * (wx @ wx)
    out = jnp.eye(4)
    out = out.at[:3, :3].set(r)
    out = out.at[:3, 3].set(xi[3:])
    return out


def se3_log_residual(t):
    """Residual 6-vector of a near-identity transform (small-angle log)."""
    r = t[:3, :3]
    w = 0.5 * jnp.array([r[2, 1] - r[1, 2],
                         r[0, 2] - r[2, 0],
                         r[1, 0] - r[0, 1]])
    return jnp.concatenate([w, t[:3, 3]])


# ---------------------------------------------------------------------------
# Keyframes and constraints
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Keyframe:
    index: int                 # frame index in the sequence
    pose: np.ndarray           # camera-to-world at creation [4,4]
    points: np.ndarray         # camera-space position map (decimated)
    normals: np.ndarray        # camera-space normal map (decimated)


@dataclasses.dataclass
class Edge:
    i: int                     # keyframe ids (graph indices)
    j: int
    z_ij: np.ndarray           # measured relative pose: T_i^-1 T_j
    weight: float = 1.0
    is_loop: bool = False


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    keyframe_every: int = 10          # min frames between keyframes
    keyframe_angle: float = 0.15      # or when motion exceeds these
    keyframe_dist: float = 0.15
    loop_max_dist: float = 0.6        # candidate gating
    loop_max_angle: float = 0.8
    loop_min_separation: int = 3      # keyframes apart
    loop_residual_max: float = 2e-4   # ICP residual acceptance
    gn_iters: int = 10
    loop_weight: float = 1.0
    odom_weight: float = 1.0


class PoseGraph:
    """Keyframe pose graph (host orchestration; solves on device)."""

    def __init__(self, cam: CameraConfig, cfg: PoseGraphConfig = None,
                 tracker: Optional[TrackerConfig] = None):
        self.cam = cam
        self.cfg = cfg or PoseGraphConfig()
        self.tracker = tracker or TrackerConfig(
            levels=2, max_outer_iter=(8, 6), max_inner_iter=(1, 1),
            dist_thres=(0.3, 0.3), normal_thres=(0.8, 0.8),
            angle_trans_thres=(1.5, 1.5), dist_trans_thres=(1.5, 1.5),
            residual_early_out=(1e-9, 1e-9))
        self.keyframes: List[Keyframe] = []
        self.edges: List[Edge] = []
        self._last_kf_pose: Optional[np.ndarray] = None
        self._last_kf_index = -10**9

    # -- keyframe policy --------------------------------------------------

    def should_add_keyframe(self, frame_index: int, pose: np.ndarray) -> bool:
        if not self.keyframes:
            return True
        if frame_index - self._last_kf_index < self.cfg.keyframe_every:
            # early keyframe on large motion
            d = np.linalg.inv(self._last_kf_pose) @ pose
            ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
            return (np.linalg.norm(d[:3, 3]) > self.cfg.keyframe_dist
                    or ang > self.cfg.keyframe_angle)
        return True

    def add_keyframe(self, frame_index: int, pose: np.ndarray,
                     points, normals) -> int:
        """Add a keyframe (+odometry edge) and search for loop closures.
        Returns the number of loop edges added."""
        pose = np.asarray(pose, np.float64)
        kf = Keyframe(index=frame_index, pose=pose.copy(),
                      points=np.asarray(points), normals=np.asarray(normals))
        k = len(self.keyframes)
        self.keyframes.append(kf)
        self._last_kf_pose = pose.copy()
        self._last_kf_index = frame_index
        if k > 0:
            prev = self.keyframes[k - 1]
            z = np.linalg.inv(prev.pose) @ pose
            self.edges.append(Edge(i=k - 1, j=k, z_ij=z,
                                   weight=self.cfg.odom_weight))
        return self._detect_loops(k)

    # -- loop closure -----------------------------------------------------

    def _detect_loops(self, k: int) -> int:
        """Gate old keyframes by pose proximity, verify by ICP
        (register k's frame against the candidate's maps)."""
        cfg = self.cfg
        kf = self.keyframes[k]
        added = 0
        for c in range(k - cfg.loop_min_separation):
            cand = self.keyframes[c]
            d = np.linalg.inv(cand.pose) @ kf.pose
            ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
            if np.linalg.norm(d[:3, 3]) > cfg.loop_max_dist \
                    or ang > cfg.loop_max_angle:
                continue
            z, ok = self.register(kf, cand, init=d)
            if ok:
                # z maps k-frame coords into c-frame coords, i.e.
                # z = T_c^-1 T_k — exactly the (i=c, j=k) constraint
                self.edges.append(Edge(i=c, j=k, z_ij=z,
                                       weight=cfg.loop_weight, is_loop=True))
                added += 1
        return added

    def register(self, kf_src: Keyframe, kf_dst: Keyframe, init=None
                 ) -> Tuple[np.ndarray, bool]:
        """ICP-register src's maps against dst's (camera frames);
        returns (delta mapping src camera space into dst camera space, ok).
        """
        # track() seeds its delta at identity, so a warm start is applied
        # by pre-transforming the source maps into the predicted dst frame.
        pts = jnp.asarray(kf_src.points)
        nrm = jnp.asarray(kf_src.normals)
        if init is not None:
            r = jnp.asarray(init, jnp.float32)
            pts = pts @ r[:3, :3].T + r[:3, 3]
            nrm = nrm @ r[:3, :3].T
        res = tracking.track(
            pts, nrm, jnp.asarray(kf_dst.points),
            jnp.asarray(kf_dst.normals),
            jnp.eye(4, dtype=jnp.float32), self.cam, self.tracker)
        delta = np.asarray(res.pose, np.float64)
        if init is not None:
            delta = delta @ np.asarray(init)
        ok = bool(res.valid) and \
            float(res.residual) < self.cfg.loop_residual_max
        return delta, ok

    # -- relocalization -----------------------------------------------------

    def relocalize(self, points, normals, last_pose=None,
                   max_candidates: int = 8) -> Tuple[np.ndarray, bool]:
        """Recover the camera pose after tracking loss by ICP-registering
        the current frame against stored keyframes.

        The reference has no recovery path — it skips integration and
        waits for ICP to re-latch from the stale pose
        (DepthSensing.cpp:874-879), which fails if the camera moved while
        blind. Here (the InfiniTAM-v3-style capability the SLAM layer
        enables): try the keyframes nearest the last known pose first,
        accept the best verified registration. Returns
        (camera_to_world, ok).
        """
        if not self.keyframes:
            return (np.eye(4) if last_pose is None
                    else np.asarray(last_pose)), False
        cands = list(range(len(self.keyframes)))
        if last_pose is not None:
            lp = np.asarray(last_pose, np.float64)
            cands.sort(key=lambda k: float(np.linalg.norm(
                self.keyframes[k].pose[:3, 3] - lp[:3, 3])))
        cands = cands[:max_candidates]
        frame = Keyframe(index=-1, pose=np.eye(4),
                         points=np.asarray(points),
                         normals=np.asarray(normals))
        best = None
        for k in cands:
            kf = self.keyframes[k]
            init = None
            if last_pose is not None:
                # predicted frame->keyframe delta from the stale pose
                init = np.linalg.inv(kf.pose) @ np.asarray(last_pose,
                                                           np.float64)
            z, ok = self.register(frame, kf, init=init)
            if not ok:
                # retry cold (identity init) — the stale pose may be the
                # problem when the camera moved far while blind
                z, ok = self.register(frame, kf, init=None)
            if ok:
                pose = kf.pose @ z          # T_w_kf @ T_kf_frame
                return pose, True
        return (np.eye(4) if last_pose is None
                else np.asarray(last_pose)), False

    # -- optimization ------------------------------------------------------

    def optimize(self) -> np.ndarray:
        """Gauss-Newton over all keyframe poses (pose 0 fixed, autodiff
        jacobians, dense 6K x 6K normal equations on device). Updates
        keyframe poses in place; returns them stacked [K,4,4]."""
        k = len(self.keyframes)
        if k < 2 or not self.edges:
            return np.stack([kf.pose for kf in self.keyframes]) \
                if self.keyframes else np.zeros((0, 4, 4))

        poses0 = jnp.asarray(
            np.stack([kf.pose for kf in self.keyframes]), jnp.float32)
        ei = jnp.asarray([e.i for e in self.edges], jnp.int32)
        ej = jnp.asarray([e.j for e in self.edges], jnp.int32)
        zs = jnp.asarray(np.stack([e.z_ij for e in self.edges]), jnp.float32)
        ws = jnp.asarray([e.weight for e in self.edges], jnp.float32)

        def residuals(xi_flat, poses):
            xi = xi_flat.reshape(k, 6)
            # pose 0 gauge-fixed
            xi = xi.at[0].set(0.0)
            t = jnp.stack([poses[m] @ se3_exp(xi[m]) for m in range(k)])

            def edge_res(i, j, z, w):
                err = jnp.linalg.solve(z, jnp.linalg.solve(t[i], t[j]))
                return jnp.sqrt(w) * se3_log_residual(err)

            return jnp.concatenate(
                [edge_res(ei[m], ej[m], zs[m], ws[m])
                 for m in range(len(self.edges))])

        jac = jax.jacfwd(residuals)

        @jax.jit
        def gn_step(poses):
            xi0 = jnp.zeros((k * 6,))
            r = residuals(xi0, poses)
            j = jac(xi0, poses)
            a = j.T @ j + 1e-6 * jnp.eye(k * 6)
            b = -j.T @ r
            dx = jnp.linalg.solve(a, b).reshape(k, 6)
            dx = dx.at[0].set(0.0)
            new_poses = jnp.stack(
                [poses[m] @ se3_exp(dx[m]) for m in range(k)])
            return new_poses, jnp.sum(r * r)

        poses = poses0
        for _ in range(self.cfg.gn_iters):
            poses, loss = gn_step(poses)
        out = np.asarray(poses, np.float64)
        for m, kf in enumerate(self.keyframes):
            kf.pose = out[m]
        return out

    def optimize_distributed(self, mesh=None) -> np.ndarray:
        """Edge-sharded Gauss-Newton over a device mesh (SURVEY §7 phase
        5's distributed pose optimization: each device linearises its
        edge shard, the [6K,6K] normal equations are ``psum``-reduced
        over ICI, and the solve runs replicated).

        Note the reference/VoxelHashing problem has no landmark blocks —
        the graph is pose-pose only — so there is no Schur complement to
        form; the psum'd dense-H reduction IS the whole system. Matches
        :meth:`optimize` numerically (same residuals/iterations).
        """
        import jax
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        k = len(self.keyframes)
        if k < 2 or not self.edges:
            return np.stack([kf.pose for kf in self.keyframes]) \
                if self.keyframes else np.zeros((0, 4, 4))
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("e",))
        n_dev = mesh.devices.size

        ne = len(self.edges)
        pad = -(-ne // n_dev) * n_dev
        ei = np.zeros((pad,), np.int32)
        ej = np.zeros((pad,), np.int32)
        zs = np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))
        ws = np.zeros((pad,), np.float32)
        for m, e in enumerate(self.edges):
            ei[m], ej[m], ws[m] = e.i, e.j, e.weight
            zs[m] = e.z_ij
        ei, ej = jnp.asarray(ei), jnp.asarray(ej)
        zs, ws = jnp.asarray(zs), jnp.asarray(ws)
        poses0 = jnp.asarray(
            np.stack([kf.pose for kf in self.keyframes]), jnp.float32)

        def edge_residual(xi_flat, poses, i, j, z, w):
            xi = xi_flat.reshape(k, 6)
            xi = xi.at[0].set(0.0)            # gauge fix
            ti = poses[i] @ se3_exp(xi[i])
            tj = poses[j] @ se3_exp(xi[j])
            err = jnp.linalg.solve(z, jnp.linalg.solve(ti, tj))
            return jnp.sqrt(w) * se3_log_residual(err)

        e_jac = jax.jacfwd(edge_residual)

        def shard_system(poses, ei_s, ej_s, zs_s, ws_s):
            """One device's Σ JᵀJ / Jᵀr over its edge shard, psum'd."""
            xi0 = jnp.zeros((k * 6,))

            def one(i, j, z, w):
                r = edge_residual(xi0, poses, i, j, z, w)
                jm = e_jac(xi0, poses, i, j, z, w)   # [6, k*6]
                return jm.T @ jm, -jm.T @ r, jnp.sum(r * r)

            hs, bs, ls = jax.vmap(one)(ei_s, ej_s, zs_s, ws_s)
            h = jax.lax.psum(jnp.sum(hs, 0), "e")
            b = jax.lax.psum(jnp.sum(bs, 0), "e")
            loss = jax.lax.psum(jnp.sum(ls), "e")
            return h, b, loss

        smapped = shard_map(
            shard_system, mesh=mesh,
            in_specs=(P(), P("e"), P("e"), P("e"), P("e")),
            out_specs=(P(), P(), P()))

        @jax.jit
        def gn_step(poses):
            h, b, loss = smapped(poses, ei, ej, zs, ws)
            a = h + 1e-6 * jnp.eye(k * 6)
            dx = jnp.linalg.solve(a, b).reshape(k, 6)
            dx = dx.at[0].set(0.0)
            new_poses = jnp.stack(
                [poses[m] @ se3_exp(dx[m]) for m in range(k)])
            return new_poses, loss

        poses = poses0
        for _ in range(self.cfg.gn_iters):
            poses, loss = gn_step(poses)
        out = np.asarray(poses, np.float64)
        for m, kf in enumerate(self.keyframes):
            kf.pose = out[m]
        return out

    def corrected_trajectory(self, frame_poses: List[np.ndarray]
                             ) -> List[np.ndarray]:
        """Propagate optimized keyframe corrections to all frames: each
        frame inherits the correction of its most recent keyframe
        (trajectory-consistent update for re-integration)."""
        if not self.keyframes:
            return list(frame_poses)
        out = []
        kf_iter = 0
        corr = np.eye(4)
        for fi, p in enumerate(frame_poses):
            while (kf_iter < len(self.keyframes)
                   and self.keyframes[kf_iter].index <= fi):
                kf = self.keyframes[kf_iter]
                # correction = optimized * original^-1 at the keyframe
                corr = kf.pose @ np.linalg.inv(self._orig_poses[kf_iter])
                kf_iter += 1
            out.append(corr @ np.asarray(p, np.float64))
        return out

    def snapshot_originals(self):
        """Record pre-optimization poses (call before optimize) so
        corrected_trajectory can compute per-keyframe corrections."""
        self._orig_poses = [kf.pose.copy() for kf in self.keyframes]


def reintegrate(frames, poses, cfg, make_state, integrate_fn):
    """Rebuild a map from stored frames under corrected poses
    (trajectory-consistent re-integration; the capability loop closure
    exists to enable). ``frames``: iterable of (depth, color);
    ``make_state()``: fresh map; ``integrate_fn(state, depth, color, pose)``.
    """
    state = make_state()
    for (depth, color), pose in zip(frames, poses):
        state = integrate_fn(state, depth, color, pose)
    return state
