"""Direct photometric image alignment: residuals + Gauss-Newton system.

TPU-native re-design of the reference coarse tracker's hot loops
(CoarseTracker::calcRes, src/dso/FullSystem/CoarseTracker.cpp:361-517, and
CoarseTracker::calcGSSSE, :299-356). Instead of a scalar loop over warped
points feeding hand-written SSE shift-register accumulators
(MatrixAccumulators.h), we batch every point into fixed-shape arrays, compute
residuals + analytic Jacobians vectorized, and reduce the 8x8 Gauss-Newton
system with one [N,8]^T @ [N,8] matmul on the MXU. Masked lanes contribute
exact zeros.

State convention for the local 8-dof system (matches utils/lie: left-
multiplicative se3 increment on the ref-to-new pose):
    delta = [v(3), w(3), rho, b]
with brightness model  r = I_new(u',v') - (a * c_ref + b),  a = exp(rho_rel).

Derivation (own, standard direct-alignment chain rule):
    ray   x_r = K_l^{-1} (u_r, v_r, 1)
    p     = R x_r + t * d_r          (scaled point; real point X' = p / d_r)
    x',y' = p.x/p.z, p.y/p.z         (normalized new-frame coords)
    d'    = d_r / p.z                (new inverse depth)
    u'    = fx x' + cx ; v' = fy y' + cy
    du'/dv = fx d' (1, 0, -x')             dv'/dv = fy d' (0, 1, -y')
    du'/dw = fx (-x'y', 1+x'^2, -y')       dv'/dw = fy (-(1+y'^2), x'y', x')
    dr/d[u',v'] = image gradient (gx, gy) at (u',v')
    dr/drho = -a c_ref ; dr/db = -1
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import interp
from dmvio_tpu.utils.camera import Calib


# Levels whose pixel count is at or below this sample via one-hot MXU
# matmuls (resolution-bound, trivially cheap on small images); larger
# levels keep the scalar-unit gather (N-bound, ~80us/corner regardless of
# resolution — cheaper than an N*H*W matmul only at full resolution).
_MXU_SAMPLE_AREA = 256 * 256


def _sample_stack(tgt_level, un, vn):
    h, w = tgt_level.shape[-2:]
    if h * w <= _MXU_SAMPLE_AREA:
        return interp.bilinear_mxu_stack(tgt_level, un, vn)
    return interp.bilinear_stack(tgt_level, un, vn)


def _sample_intensity(tgt_level, un, vn):
    h, w = tgt_level.shape[-2:]
    if h * w <= _MXU_SAMPLE_AREA:
        return interp.bilinear_mxu(tgt_level[0], un, vn)
    return interp.bilinear(tgt_level[0], un, vn)


class AlignStats(NamedTuple):
    energy: jnp.ndarray      # Huber energy over inlier terms
    num_terms: jnp.ndarray   # number of in-bounds, non-saturated terms
    num_saturated: jnp.ndarray
    flow_t: jnp.ndarray      # mean squared pixel motion, translation only
    flow_rt: jnp.ndarray     # mean squared pixel motion, full warp


class PointCloud(NamedTuple):
    """Reference semi-dense point cloud at one pyramid level (SoA, masked)."""

    u: jnp.ndarray       # [N] pixel x in ref frame at this level
    v: jnp.ndarray       # [N] pixel y
    idepth: jnp.ndarray  # [N] inverse depth in ref frame
    color: jnp.ndarray   # [N] ref intensity
    mask: jnp.ndarray    # [N] bool validity


def warp_points(
    pc: PointCloud,
    calib_l: Calib,
    R: jnp.ndarray,
    t: jnp.ndarray,
):
    """Warp reference points into the new frame.

    Returns (u_new, v_new, x', y', d', valid_depth).
    """
    xr = (pc.u - calib_l.cx) / calib_l.fx
    yr = (pc.v - calib_l.cy) / calib_l.fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)  # [N, 3]
    p = ray @ R.T + t[None, :] * pc.idepth[:, None]
    pz = p[..., 2]
    valid = pz > 1e-6
    pz_safe = jnp.where(valid, pz, 1.0)
    xn = p[..., 0] / pz_safe
    yn = p[..., 1] / pz_safe
    dn = pc.idepth / pz_safe
    un = xn * calib_l.fx + calib_l.cx
    vn = yn * calib_l.fy + calib_l.cy
    return un, vn, xn, yn, dn, valid


def calc_energy(
    tgt_level: jnp.ndarray,
    calib_l: Calib,
    pc: PointCloud,
    R: jnp.ndarray,
    t: jnp.ndarray,
    aff_a: jnp.ndarray,
    aff_b: jnp.ndarray,
    huber_th: float = 9.0,
    cutoff_th: float = 20.0,
    cutoff_mult: jnp.ndarray | float = 1.0,
):
    """Energy-only evaluation (no Jacobians) for LM accept/reject steps.

    Returns (energy, num_terms, num_saturated).
    """
    h, w = tgt_level.shape[-2:]
    un, vn, xn, yn, dn, valid_z = warp_points(pc, calib_l, R, t)
    inb = interp.in_bounds(un, vn, h, w, pad=2.0) & valid_z & pc.mask
    i_new = _sample_intensity(tgt_level, un, vn)
    r = i_new - (aff_a * pc.color + aff_b)
    abs_r = jnp.abs(r)
    cutoff = cutoff_th * cutoff_mult
    saturated = (abs_r > cutoff) & inb
    active = inb & ~saturated
    hw = jnp.where(abs_r < huber_th, 1.0, huber_th / jnp.maximum(abs_r, 1e-12))
    energy = jnp.sum(
        jnp.where(active, hw * r * r * (2.0 - hw), 0.0)
        + jnp.where(saturated, cutoff * cutoff * 2.0, 0.0)
    )
    return energy, jnp.sum(active.astype(jnp.float32)), jnp.sum(saturated.astype(jnp.float32))


def calc_sat_profile(
    tgt_level: jnp.ndarray,
    calib_l: Calib,
    pc: PointCloud,
    R: jnp.ndarray,
    t: jnp.ndarray,
    aff_a: jnp.ndarray,
    aff_b: jnp.ndarray,
    cutoff_th: float = 20.0,
    mults=(1.0, 2.0, 4.0),
):
    """Saturation ratios at several cutoff multipliers from ONE gather pass.

    Replaces the reference's levelCutoffRepeat re-evaluation loop
    (CoarseTracker.cpp:569-597, which re-runs calcRes with a doubled cutoff
    until <60% of terms saturate): the residuals don't depend on the
    cutoff, so every candidate multiplier's ratio comes from the same
    sampled residuals. Returns [len(mults)] saturation ratios."""
    h, w = tgt_level.shape[-2:]
    un, vn, xn, yn, dn, valid_z = warp_points(pc, calib_l, R, t)
    inb = interp.in_bounds(un, vn, h, w, pad=2.0) & valid_z & pc.mask
    i_new = _sample_intensity(tgt_level, un, vn)
    abs_r = jnp.abs(i_new - (aff_a * pc.color + aff_b))
    n_inb = jnp.maximum(jnp.sum(inb.astype(jnp.float32)), 1.0)
    ratios = [jnp.sum(((abs_r > cutoff_th * m) & inb).astype(jnp.float32))
              / n_inb for m in mults]
    return jnp.stack(ratios)


def calc_res_and_gs(
    tgt_level: jnp.ndarray,   # [3, H, W] target pyramid level (I, gx, gy)
    calib_l: Calib,
    pc: PointCloud,
    R: jnp.ndarray,           # ref -> new rotation
    t: jnp.ndarray,           # ref -> new translation
    aff_a: jnp.ndarray,       # brightness gain a = exp(rho_rel)
    aff_b: jnp.ndarray,       # brightness offset
    huber_th: float = 9.0,
    cutoff_th: float = 20.0,
    cutoff_mult: jnp.ndarray | float = 1.0,
):
    """Residuals + 8x8 GN system for one pyramid level, fully batched.

    Mirrors the semantics of calcRes + calcGSSSE (CoarseTracker.cpp:299-517):
    Huber-weighted photometric residuals, saturation cutoff (residuals above
    cutoff_th * cutoff_mult count a fixed max energy and are excluded from
    the linear system), and optical-flow indicators for the keyframe
    decision heuristic.

    Returns (H [8,8], b [8], AlignStats). Solve H d = -b for the step.
    """
    h, w = tgt_level.shape[-2:]
    un, vn, xn, yn, dn, valid_z = warp_points(pc, calib_l, R, t)
    inb = interp.in_bounds(un, vn, h, w, pad=2.0) & valid_z & pc.mask

    samp = _sample_stack(tgt_level, un, vn)  # [N, 3]
    i_new, gx, gy = samp[..., 0], samp[..., 1], samp[..., 2]

    r = i_new - (aff_a * pc.color + aff_b)
    abs_r = jnp.abs(r)
    cutoff = cutoff_th * cutoff_mult
    saturated = (abs_r > cutoff) & inb
    active = inb & ~saturated

    hw = jnp.where(abs_r < huber_th, 1.0, huber_th / jnp.maximum(abs_r, 1e-12))
    # Huber energy: hw * r^2 * (2 - hw); saturated terms count max energy.
    energy = jnp.sum(
        jnp.where(active, hw * r * r * (2.0 - hw), 0.0)
        + jnp.where(saturated, cutoff * cutoff * 2.0, 0.0)
    )

    fx, fy = calib_l.fx, calib_l.fy
    gxf = gx * fx
    gyf = gy * fy
    J = jnp.stack(
        [
            dn * gxf,                                   # v_x
            dn * gyf,                                   # v_y
            -dn * (xn * gxf + yn * gyf),                # v_z
            -(xn * yn * gxf + (1.0 + yn * yn) * gyf),   # w_x
            (1.0 + xn * xn) * gxf + xn * yn * gyf,      # w_y
            -yn * gxf + xn * gyf,                       # w_z
            -aff_a * pc.color,                          # rho (log gain)
            -jnp.ones_like(r),                          # b offset
        ],
        axis=-1,
    )  # [N, 8]

    wgt = jnp.where(active, hw, 0.0)
    Jw = J * wgt[:, None]
    H = Jw.T @ J                       # MXU: [8,N]@[N,8]
    b = Jw.T @ r

    # Flow indicators (CoarseTracker.cpp: sums of squared pixel displacement
    # under translation-only and full warp), for the KF decision.
    un_t, vn_t, *_ , valid_t = warp_points(pc, calib_l, jnp.eye(3, dtype=R.dtype), t)
    n_act = jnp.maximum(jnp.sum(active), 1.0)
    flow_rt = jnp.sum(jnp.where(active, (un - pc.u) ** 2 + (vn - pc.v) ** 2, 0.0)) / n_act
    flow_t = (
        jnp.sum(jnp.where(active & valid_t, (un_t - pc.u) ** 2 + (vn_t - pc.v) ** 2, 0.0))
        / n_act
    )

    stats = AlignStats(
        energy=energy,
        num_terms=jnp.sum(active.astype(jnp.float32)),
        num_saturated=jnp.sum(saturated.astype(jnp.float32)),
        flow_t=jnp.sqrt(flow_t),
        flow_rt=jnp.sqrt(flow_rt),
    )
    return H, b, stats
