"""Coarse-tracking IMU logic: predict, fuse, propagate.

TPU-native re-design of CoarseIMULogic (src/IMU/CoarseIMULogic.{h,cpp}):
instead of a rolling GTSAM factor graph that is marginalized down every
frame (CoarseIMULogic.cpp:66-96), we carry an explicit 15-dof Gaussian
[pose(6), v(3), bias(6)] on the CURRENT frame and propagate it through each
IMU preintegration chunk with one dense Schur step (predict), then hand it
to the tracker as a 17-dof prior (models/coarse_tracker.CoarsePrior) for
the per-iteration joint solve. After tracking, the visual Hessian is folded
in (addVisualToCoarseGraph, CoarseTracker.cpp:766) before the next predict.

Poses are DSO-world worldToCam like everything else; scale/gravity are
FIXED here (they come from the VIO BA / IMU initializer — the reference's
coarse graph also holds them fixed between keyframes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.models.coarse_tracker import CoarsePrior
from dmvio_tpu.models.vio_ba import _pair_residual, dso_to_body
from dmvio_tpu.ops import preint
from dmvio_tpu.utils import lie

# BA -> coarse handoff variances (reference IMUSettings.h:95-99: fixed
# variances for the prior placed on the coarse graph after each KF).
SIG_POSE_ROT = 0.005
SIG_POSE_TRANS = 0.01
SIG_VEL = 0.05
SIG_BG = 0.005
SIG_BA = 0.05


class CoarseIMUState(NamedTuple):
    """Gaussian belief about the current frame's [pose, v, bias]."""

    R_cw: jnp.ndarray    # [3,3] DSO worldToCam (center of the belief)
    t_cw: jnp.ndarray
    v: jnp.ndarray       # [3] metric velocity
    bias: jnp.ndarray    # [6] [bg, ba]
    H: jnp.ndarray       # [15,15] information on [xi, v, bias] at center
    s_log: jnp.ndarray   # fixed scale (from BA)
    g2: jnp.ndarray      # fixed gravity tangent


def body_to_dso(R_wb, p_wb, s_log, g2, R_cb, t_cb):
    """Inverse of vio_ba.dso_to_body."""
    s = jnp.exp(s_log)
    R_g = lie.so3_exp(jnp.concatenate([g2, jnp.zeros(1)]))
    # T_wc_m = T_wb o T_bc
    R_bc, t_bc = lie.se3_inv(R_cb, t_cb)
    R_wc_m = R_wb @ R_bc
    t_wc_m = R_wb @ t_bc + p_wb
    R_wc_d = R_g @ R_wc_m
    t_wc_d = s * (R_g @ t_wc_m)
    return lie.se3_inv(R_wc_d, t_wc_d)


def init_from_ba(R_cw, t_cw, v, bias, s_log, g2) -> CoarseIMUState:
    """Fresh belief after a keyframe's BA (finishKeyframeOptimization /
    initCoarseGraph handoff, BAIMULogic.cpp:641 / CoarseIMULogic.cpp:212):
    fixed-variance prior around the BA estimates."""
    sig = jnp.concatenate([
        jnp.full(3, SIG_POSE_TRANS), jnp.full(3, SIG_POSE_ROT),
        jnp.full(3, SIG_VEL), jnp.full(3, SIG_BG), jnp.full(3, SIG_BA),
    ])
    H = jnp.diag(1.0 / sig ** 2)
    return CoarseIMUState(R_cw=R_cw, t_cw=t_cw, v=v, bias=bias, H=H,
                          s_log=s_log, g2=g2)


@jax.jit
def predict(state: CoarseIMUState, pre: preint.PreintState,
            R_cb: jnp.ndarray, t_cb: jnp.ndarray) -> CoarseIMUState:
    """Propagate the belief through one IMU chunk (prev -> new frame).

    Equivalent of addIMUData's preintegrate + marginalize-old-frames +
    LM-predict (CoarseIMULogic.cpp:55-209): the predicted mean integrates
    the preintegrated measurement; the information is pushed through the
    IMU factor and the previous frame is Schur-eliminated.
    """
    # --- mean prediction: integrate in the metric body frame.
    Rb, pb = dso_to_body(state.R_cw, state.t_cw, state.s_log, state.g2,
                         R_cb, t_cb)
    g = jnp.array([0.0, 0.0, -preint.GRAVITY])
    dt = pre.dt
    dbg = state.bias[:3] - pre.bias_lin[:3]
    dba = state.bias[3:6] - pre.bias_lin[3:6]
    dR = pre.dR @ lie.so3_exp(pre.dR_dbg @ dbg)
    dv = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    Rb_new = Rb @ dR
    pb_new = pb + state.v * dt + 0.5 * g * dt ** 2 + Rb @ dp
    v_new = state.v + g * dt + Rb @ dv
    R_cw_new, t_cw_new = body_to_dso(Rb_new, pb_new, state.s_log, state.g2,
                                     R_cb, t_cb)

    # --- information propagation: joint [prev(15) | new(15)], Schur prev.
    def fac(z):
        z36 = jnp.concatenate([
            z[0:6], z[15:21],        # xi_prev, xi_new
            z[6:9], z[21:24],        # v_prev, v_new
            z[9:15], z[24:30],       # b_prev, b_new
            jnp.zeros(3),            # ds, dg2 fixed here
        ])
        return _pair_residual(pre, state.R_cw, state.t_cw,
                              R_cw_new, t_cw_new, z36, R_cb, t_cb,
                              preint.GRAVITY)

    z0 = jnp.concatenate([
        jnp.zeros(6), state.v, state.bias,
        jnp.zeros(6), v_new, state.bias,
    ])
    J = jax.jacfwd(fac)(z0)          # [15, 30]
    H_joint = J.T @ J
    H_joint = H_joint.at[:15, :15].add(state.H)
    # Account for the residual at the prediction (nonzero only through
    # bias-correction rounding): gradient term folded into the new prior's
    # center via one Newton step is skipped — the predict mean already
    # satisfies the factor to first order.
    A = H_joint[:15, :15]
    Bm = H_joint[:15, 15:]
    D = H_joint[15:, 15:]
    evals, evecs = jnp.linalg.eigh(A)
    inv_evals = jnp.where(evals > 1e-6 * jnp.maximum(evals.max(), 1e-10),
                          1.0 / evals, 0.0)
    A_inv = (evecs * inv_evals[None]) @ evecs.T
    H_new = D - Bm.T @ A_inv @ Bm
    H_new = 0.5 * (H_new + H_new.T)

    return CoarseIMUState(
        R_cw=R_cw_new, t_cw=t_cw_new, v=v_new, bias=state.bias,
        H=H_new, s_log=state.s_log, g2=state.g2,
    )


def make_tracker_prior(state: CoarseIMUState, R_ref_cw, t_ref_cw,
                       rho0, b_aff0) -> CoarsePrior:
    """Express the belief in the tracker's chart (pose relative to the
    tracking reference) as a 17-dof prior with zero affine information."""
    Ri, ti = lie.se3_inv(R_ref_cw, t_ref_cw)
    R_rel, t_rel = lie.se3_mul(state.R_cw, state.t_cw, Ri, ti)
    # Pose block chart: left-increment on T_new_ref equals left-increment
    # on T_new_w (the reference frame is fixed), so H transfers unchanged.
    H17 = jnp.zeros((17, 17), state.H.dtype)
    H17 = H17.at[:6, :6].set(state.H[:6, :6])
    H17 = H17.at[:6, 8:].set(state.H[:6, 6:])
    H17 = H17.at[8:, :6].set(state.H[6:, :6])
    H17 = H17.at[8:, 8:].set(state.H[6:, 6:])
    return CoarsePrior(H=H17, R0=R_rel, t0=t_rel,
                       aff0=jnp.stack([rho0, b_aff0]),
                       v0=state.v, b0=state.bias)


@jax.jit
def fuse_visual(state: CoarseIMUState, H_vis8: jnp.ndarray,
                R_cw, t_cw, v, bias) -> CoarseIMUState:
    """Fold the tracker's final visual Hessian into the belief and move the
    center to the tracked state (addVisualToCoarseGraph,
    CoarseIMULogic.cpp:391)."""
    H = state.H
    H = H.at[:6, :6].add(H_vis8[:6, :6])
    return CoarseIMUState(R_cw=R_cw, t_cw=t_cw, v=v, bias=bias, H=H,
                          s_log=state.s_log, g2=state.g2)
