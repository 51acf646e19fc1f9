"""Cheap real-chip kernel regression checks, callable from the bench
harness (so a Pallas layout regression cannot hide between manual
`scripts/verify_tpu.py` runs — that script remains the extended suite).

The checks mirror verify_tpu.py checks 0 and 1 on whatever state the
caller already has in hand: the bf16 limb split must survive XLA:TPU
simplification, and the Pallas fused integrate must match the portable
XLA path to documented bounds.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quick_kernel_check(state, depth, color, pose, cam, mp
                       ) -> Tuple[bool, str]:
    """Run the limb-split + Pallas-vs-XLA-integrate checks on one frame.

    ``state``: a MapState with a non-trivial block population; ``depth`` /
    ``color`` / ``pose``: the frame to integrate both ways. Returns
    (ok, one-line summary). Costs one extra integrate dispatch pair —
    seconds of chip time at bench scale.
    """
    import jax
    import jax.numpy as jnp

    from . import blockmap, geometry as geom, integrate as integ
    from .ops.pallas_integrate import integrate_pallas, split_bf16_limbs

    # 0. bf16 limb split survives simplification (x - bf16(x) folds to
    # zero on real TPU hardware if expressed naively)
    xs = jnp.asarray(np.linspace(0.1, 7.9, 1024, dtype=np.float32))
    hi, lo = jax.jit(split_bf16_limbs)(xs)
    rec = np.asarray(hi, np.float32) + np.asarray(lo, np.float32)
    limb_err = float(np.abs(rec - np.asarray(xs)).max())
    limb_nz = float(np.abs(np.asarray(lo, np.float32)).max())
    ok0 = limb_err < 1e-4 and limb_nz > 1e-5

    view = geom.invert_rigid(pose)
    active_idx, n_active, _ = blockmap.compactify(state, view, cam, mp)
    active_mask = jnp.arange(active_idx.shape[0]) < n_active
    ref = jax.jit(lambda s, d, c, p, ai, am: integ.integrate(
        s, d, c, p, cam, mp, active_idx=ai, active_mask=am))(
        state, depth, color, pose, active_idx, active_mask)
    out = jax.jit(lambda s, d, c, p, ai, na: integrate_pallas(
        s, d, c, p, cam, mp, ai, na))(
        state, depth, color, pose, active_idx, n_active)
    w_ref = np.asarray(ref.weight, np.float32)
    w_out = np.asarray(out.weight, np.float32)
    w_mismatch = np.abs(w_out - w_ref) > 1e-3
    nmis = int(w_mismatch.sum())
    agree = (w_ref > 0) & ~w_mismatch
    s_err = np.abs(np.asarray(out.sdf, np.float32)[agree]
                   - np.asarray(ref.sdf, np.float32)[agree])
    # noise bound: limb recombination differences (5e-4) + 2 independent
    # bf16 storage roundings at the bench map's sdf magnitudes —
    # truncation_at(5 m) ~ 0.07 => ulp 4.88e-4, 2 ulps ~ 1e-3.
    # Borderline-pixel voxels (projection rounds to adjacent pixels in
    # the two kernels across a depth edge — see verify_tpu.py check 1)
    # are excluded from the noise bound and COUNTED instead.
    borderline = s_err > 1.6e-3
    n_border = int(borderline.sum())
    sdf_noise = float(s_err[~borderline].max()) if (~borderline).any() \
        else 0.0
    ok1 = (nmis < w_ref.size * 1e-4) and sdf_noise < 1.6e-3 \
        and n_border < max(int(s_err.size * 1e-5), 1)
    ok = ok0 and ok1
    msg = (f"limb(err={limb_err:.1e},|lo|={limb_nz:.1e}) "
           f"integrate(wmis={nmis}/{w_ref.size},noise={sdf_noise:.1e},"
           f"border={n_border})")
    return ok, msg
