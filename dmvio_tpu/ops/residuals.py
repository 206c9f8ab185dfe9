"""Batched photometric BA residual linearization.

TPU-native re-design of PointFrameResidual::linearize
(src/dso/FullSystem/Residuals.cpp:78-274) and the projection helpers
(src/dso/FullSystem/ResidualProjections.h:25-93). The reference linearizes
one (point, targetKF) residual at a time into a RawResidualJacobian object;
we linearize ALL (point, target) pairs of the window at once into dense
[F, P, ...] arrays with validity masks, so the Hessian accumulation
downstream is plain MXU matmuls (see ops/ba_solve.py).

First-Estimate-Jacobian discipline (reference FrameFramePrecalc PRE_RTll vs
PRE_RTll_0, HessianBlocks.cpp:193): geometric Jacobians are evaluated at the
frames' linearization-point poses and the point's idepth_zero; residuals and
image gradients are evaluated at the CURRENT state.

State vector ordering used throughout the BA stack:
    x = [calib(4) | frame 0: (xi(6), a, b) | frame 1: ... | frame F-1]
so dim C = 4 + 8 F. Pose increments are LEFT-multiplicative on world-to-cam
poses T_cw (utils/lie convention). Brightness model per frame (a_i, b_i):
    I_i = exp(a_i) * B + b_i   =>   predicted target intensity of a host
    pixel with color c: exp(a_t - a_h) * (c - b_h) + b_t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import interp, patch_sample
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib, PATTERN

# Per-pixel gradient-dependent weight constant (reference settings.h
# setting_outlierTHSumComponent = 50*50).
OUTLIER_TH_SUM_COMPONENT = 50.0 * 50.0
# Huber threshold on the weighted residual (reference settings.cpp:149).
HUBER_TH = 9.0
# Per-residual outlier energy threshold (reference settings.cpp:111
# setting_outlierTH = 12*12, scaled by patternNum at use sites).
OUTLIER_TH = 12.0 * 12.0


class BAFrames(NamedTuple):
    """SoA window frame state, fixed capacity F (reference FrameHessian)."""

    R_cw: jnp.ndarray    # [F, 3, 3] current world-to-cam rotation
    t_cw: jnp.ndarray    # [F, 3]
    aff: jnp.ndarray     # [F, 2] brightness (a, b)
    R0_cw: jnp.ndarray   # [F, 3, 3] linearization point (FEJ / evalPT)
    t0_cw: jnp.ndarray   # [F, 3]
    aff0: jnp.ndarray    # [F, 2]
    mask: jnp.ndarray    # [F] bool: slot occupied


class BAPoints(NamedTuple):
    """SoA active point state, fixed capacity P (reference PointHessian)."""

    host: jnp.ndarray          # [P] int32 host frame slot
    u: jnp.ndarray             # [P] host pixel x (level 0)
    v: jnp.ndarray             # [P] host pixel y
    idepth: jnp.ndarray        # [P] current inverse depth (host frame)
    idepth_zero: jnp.ndarray   # [P] linearization-point inverse depth (FEJ)
    color: jnp.ndarray         # [P, 8] host pattern intensities
    weight: jnp.ndarray        # [P, 8] host-gradient weights (fixed at birth)
    mask: jnp.ndarray          # [P] bool: slot active


class BAResiduals(NamedTuple):
    """Dense linearization of all (target frame, point) photometric pairs.

    Leading axes [F, P]; K = 8 pattern pixels. `J_*` are residual Jacobians
    (FEJ); `r` is the raw residual at the current state; `wt` the combined
    per-pixel IRLS weight (gradient weight^2 * huber); `active` masks pixels
    contributing to the system; `energy` the per-pair Huber energy (for
    outlier decisions); `oob` marks pairs whose projection left the image.
    """

    r: jnp.ndarray         # [F, P, K]
    wt: jnp.ndarray        # [F, P, K]
    J_pose_t: jnp.ndarray  # [F, P, K, 6] d r / d (target pose, left inc)
    J_pose_h: jnp.ndarray  # [F, P, K, 6] d r / d (host pose)
    J_aff_t: jnp.ndarray   # [F, P, K, 2]
    J_aff_h: jnp.ndarray   # [F, P, K, 2]
    J_calib: jnp.ndarray   # [F, P, K, 4]
    J_dd: jnp.ndarray      # [F, P, K]  d r / d idepth
    active: jnp.ndarray    # [F, P, K] bool
    energy: jnp.ndarray    # [F, P] robust energy of the pair
    oob: jnp.ndarray       # [F, P] bool
    u_new: jnp.ndarray     # [F, P] warped central-pixel x (current state)
    v_new: jnp.ndarray     # [F, P] warped central-pixel y
    idepth_new: jnp.ndarray  # [F, P] inverse depth in target frame


def _project(calib: Calib, R, t, u, v, idepth):
    """Project host pixel (u, v, idepth) through relative pose (R, t).

    Returns (u', v', x, y, pz, d_new, valid) in the pt = R K^-1 p + t * d
    scaled-point formulation (mirrors ResidualProjections.h:25-93).
    """
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    pt = jnp.einsum("ij,...j->...i", R, ray) + t * idepth[..., None]
    pz = pt[..., 2]
    valid = pz > 1e-6
    pz_safe = jnp.where(valid, pz, 1.0)
    x = pt[..., 0] / pz_safe
    y = pt[..., 1] / pz_safe
    d_new = idepth / pz_safe
    un = x * calib.fx + calib.cx
    vn = y * calib.fy + calib.cy
    return un, vn, x, y, pz_safe, d_new, valid


def _geometric_jacobians(calib: Calib, R, t, u, v, idepth):
    """Central-pixel geometric Jacobians at the FEJ state.

    Returns (J_uv_xi [2,6], J_uv_dd [2], J_uv_calib [2,4], valid):
    derivatives of the warped pixel (u', v') w.r.t. the relative-pose
    left-increment [v, w], the host inverse depth, and the intrinsics
    (fx, fy, cx, cy). Closed forms rederived from the warp (docstring of
    ops/align.py); validated against jax.jacfwd in tests/test_residuals.py.
    """
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    xr = (u - cx) / fx
    yr = (v - cy) / fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    pt = jnp.einsum("ij,...j->...i", R, ray) + t * idepth[..., None]
    pz = pt[..., 2]
    valid = pz > 1e-6
    pz = jnp.where(valid, pz, 1.0)
    x = pt[..., 0] / pz
    y = pt[..., 1] / pz
    dn = idepth / pz

    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    Ju = jnp.stack(
        [fx * dn, zero, -fx * dn * x,
         -fx * x * y, fx * (1.0 + x * x), -fx * y],
        axis=-1,
    )
    Jv = jnp.stack(
        [zero, fy * dn, -fy * dn * y,
         -fy * (1.0 + y * y), fy * x * y, fy * x],
        axis=-1,
    )
    J_uv_xi = jnp.stack([Ju, Jv], axis=-2)  # [..., 2, 6]

    Jd = jnp.stack(
        [fx * (t[..., 0] - t[..., 2] * x) / pz,
         fy * (t[..., 1] - t[..., 2] * y) / pz],
        axis=-1,
    )

    # Intrinsics: both the forward projection (u' = fx x + cx) and the
    # back-projected ray depend on (fx, fy, cx, cy).
    def dpix_dpt(dpt):
        du = fx * (dpt[..., 0] - x * dpt[..., 2]) / pz
        dv = fy * (dpt[..., 1] - y * dpt[..., 2]) / pz
        return du, dv

    Rc0 = R[..., :, 0]
    Rc1 = R[..., :, 1]
    du_fx, dv_fx = dpix_dpt(-(xr / fx)[..., None] * Rc0)
    du_fy, dv_fy = dpix_dpt(-(yr / fy)[..., None] * Rc1)
    du_cx, dv_cx = dpix_dpt((-1.0 / fx) * jnp.broadcast_to(Rc0, ray.shape))
    du_cy, dv_cy = dpix_dpt((-1.0 / fy) * jnp.broadcast_to(Rc1, ray.shape))
    J_calib_u = jnp.stack([x + du_fx, du_fy, one + du_cx, du_cy], axis=-1)
    J_calib_v = jnp.stack([dv_fx, y + dv_fy, dv_cx, one + dv_cy], axis=-1)
    J_uv_calib = jnp.stack([J_calib_u, J_calib_v], axis=-2)

    return J_uv_xi, Jd, J_uv_calib, valid


def fej_geometry(frames: BAFrames, points: BAPoints, calib: Calib):
    """Precompute the FEJ-state geometric quantities shared by every LM
    iteration: per-(target, point) central-pixel Jacobians and the FEJ
    relative-pose adjoints. The FEJ states (and, to first order in the
    1e8-prior-pinned intrinsics, the calibration) do not move inside one
    window optimization, so this is hoisted out of the LM loop."""
    Rh0 = frames.R0_cw[points.host]
    th0 = frames.t0_cw[points.host]
    geoj = jax.vmap(
        lambda Rr, tr, uu, vv, dd: _geometric_jacobians(calib, Rr, tr,
                                                        uu, vv, dd)
    )

    def per_target(R_t0, t_t0):
        R_th0 = jnp.einsum("ij,pkj->pik", R_t0, Rh0)
        t_th0 = t_t0[None] - jnp.einsum("pij,pj->pi", R_th0, th0)
        J_uv_xi, J_uv_dd, J_uv_calib, vz0 = geoj(
            R_th0, t_th0, points.u, points.v, points.idepth_zero)
        adj0 = lie.se3_adj(R_th0, t_th0)
        return J_uv_xi, J_uv_dd, J_uv_calib, vz0, adj0

    return jax.vmap(per_target)(frames.R0_cw, frames.t0_cw)


def linearize(
    frames: BAFrames,
    points: BAPoints,
    calib: Calib,
    images: jnp.ndarray,      # [F, 3, H, W] level-0 (I, gx, gy) per frame
    pair_mask: jnp.ndarray,   # [F, P] candidate (target, point) residuals
    geo=None,                 # optional precomputed fej_geometry(...)
) -> BAResiduals:
    """Linearize every candidate photometric residual of the window."""
    h, w = images.shape[-2:]

    # Per-point host-frame state (gathers).
    Rh = frames.R_cw[points.host]
    th = frames.t_cw[points.host]
    aff_h = frames.aff[points.host]   # [P, 2]

    pat = jnp.asarray(PATTERN)
    up = points.u[:, None] + pat[None, :, 0]   # [P, K]
    vp = points.v[:, None] + pat[None, :, 1]

    proj = jax.vmap(
        lambda Rr, tr, uu, vv, dd: _project(calib, Rr, tr, uu, vv, dd)
    )
    if geo is None:
        geo = fej_geometry(frames, points, calib)

    def per_target(img_t, R_t, t_t, aff_t, pmask, geo_t):
        # Relative poses host -> target (current): T_th = T_t T_h^-1.
        R_th = jnp.einsum("ij,pkj->pik", R_t, Rh)
        t_th = t_t[None] - jnp.einsum("pij,pj->pi", R_th, th)

        # --- Residual path (current state), all pattern pixels.
        dpat = jnp.broadcast_to(points.idepth[:, None], up.shape)
        un, vn, _, _, _, _, vz = proj(R_th, t_th, up, vp, dpat)
        inb = interp.in_bounds(un, vn, h, w, pad=2.0) & vz

        # One 16x16 intensity patch per pair (Pallas gather on TPU); all
        # pattern samples + gradients come from in-patch dense math.
        # Profiled: the scattered [F*P*K, 3] bilinear gathers were the
        # dominant BA-iteration kernels (~4 ms/iteration at F=8, P=2048);
        # the patch path costs ~1.2 ms. Pattern pixels warped outside
        # their patch (extreme perspective stretch) fold into the OOB mask
        # — the reference drops such wide-warp residuals via its own OOB
        # checks (Residuals.cpp:118-140).
        CENTER = 4  # PATTERN[4] == (0, 0)
        patches, px0, py0 = patch_sample.gather_patches(
            img_t[0], un[:, CENTER], vn[:, CENTER])
        i_t, gx, gy, okp = patch_sample.sample3(patches, px0, py0, un, vn)
        inb = inb & okp

        rel_a = jnp.exp(aff_t[0] - aff_h[:, 0])
        pred = rel_a[:, None] * (points.color - aff_h[:, 1:2]) + aff_t[1]
        r = i_t - pred

        gw = jnp.sqrt(
            OUTLIER_TH_SUM_COMPONENT
            / (OUTLIER_TH_SUM_COMPONENT + gx * gx + gy * gy)
        )
        wpx = 0.5 * (gw + points.weight)
        abs_wr = jnp.abs(wpx * r)
        hw = jnp.where(abs_wr < HUBER_TH, 1.0,
                       HUBER_TH / jnp.maximum(abs_wr, 1e-12))
        wt = hw * wpx * wpx

        # --- Jacobian path (FEJ state, precomputed), central pixel only
        # (the reference shares the geometric Jacobian across the pattern).
        J_uv_xi, J_uv_dd, J_uv_calib, vz0, adj0 = geo_t

        g = jnp.stack([gx, gy], axis=-1)  # [P, K, 2] gradient at current warp
        Jr_xi_t = jnp.einsum("pkx,pxd->pkd", g, J_uv_xi)
        Jr_dd = jnp.einsum("pkx,px->pk", g, J_uv_dd)
        Jr_cal = jnp.einsum("pkx,pxd->pkd", g, J_uv_calib)
        # Host-pose Jacobian via the adjoint of the FEJ relative pose:
        # T_h <- exp(d) T_h  =>  T_th <- T_th exp(-d) = exp(-Adj(T_th) d) T_th.
        Jr_xi_h = -jnp.einsum("pkd,pde->pke", Jr_xi_t, adj0)

        # Affine: r = I_t - exp(a_t - a_h)(c - b_h) - b_t.
        d_at = -(rel_a[:, None] * (points.color - aff_h[:, 1:2]))
        J_aff_t = jnp.stack([d_at, -jnp.ones_like(d_at)], axis=-1)
        J_aff_h = jnp.stack([-d_at, rel_a[:, None] * jnp.ones_like(d_at)], -1)

        pair_ok = pmask & points.mask
        all_inb = jnp.all(inb, axis=-1) & vz0
        oob = pair_ok & ~all_inb
        act = jnp.broadcast_to((pair_ok & all_inb)[:, None], inb.shape)

        energy = jnp.sum(jnp.where(act, wt * r * r * (2.0 - hw), 0.0), axis=-1)

        ucn, vcn, _, _, _, dcn, _ = proj(
            R_th, t_th, points.u, points.v, points.idepth
        )

        return (r, wt, Jr_xi_t, Jr_xi_h, J_aff_t, J_aff_h, Jr_cal, Jr_dd,
                act, energy, oob, ucn, vcn, dcn)

    outs = jax.vmap(per_target)(
        images, frames.R_cw, frames.t_cw, frames.aff, pair_mask, geo,
    )
    (r, wt, J_pose_t, J_pose_h, J_aff_t, J_aff_h, J_calib, J_dd,
     active, energy, oob, u_new, v_new, idepth_new) = outs

    wt = jnp.where(active, wt, 0.0)
    return BAResiduals(
        r=r, wt=wt, J_pose_t=J_pose_t, J_pose_h=J_pose_h,
        J_aff_t=J_aff_t, J_aff_h=J_aff_h, J_calib=J_calib, J_dd=J_dd,
        active=active, energy=energy, oob=oob,
        u_new=u_new, v_new=v_new, idepth_new=idepth_new,
    )
