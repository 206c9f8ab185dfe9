"""Coarse-tracking IMU logic: predict, fuse, propagate (host float64).

TPU-native re-design of CoarseIMULogic (src/IMU/CoarseIMULogic.{h,cpp}):
instead of a rolling GTSAM factor graph that is marginalized down every
frame (CoarseIMULogic.cpp:66-96), we carry an explicit 15-dof Gaussian
[pose(6), v(3), bias(6)] on the CURRENT frame and propagate it through each
IMU preintegration chunk with one dense Schur step (predict), then hand it
to the tracker as a 17-dof prior (models/coarse_tracker.CoarsePrior) for
the per-iteration joint solve.

Why HOST, why float64: this state is 15-dimensional — microseconds of
NumPy — while the information propagation Schur cancels terms of order
(chunk sqrt-info)^2 ~ 1e9, which float32 on device turns into an indefinite
mess. Keeping the filter on the host also removes a per-frame device round
trip (the tunnel dominates frame latency). Only the final prior ships to
the device. The reference runs this math in double on the CPU too.

Poses are DSO-world worldToCam; scale/gravity are FIXED here (they come
from the VIO BA / IMU initializer, as in the reference's coarse graph).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models.coarse_tracker import CoarsePrior

GRAVITY = 9.8082

# BA -> coarse handoff variances (reference IMUSettings.h:95-99).
SIG_POSE_ROT = 0.005
SIG_POSE_TRANS = 0.01
SIG_VEL = 0.05
SIG_BG = 0.005
SIG_BA = 0.05

# Down-weight of the folded per-frame visual Hessian: folding the full
# photometric information every frame double-counts (the same map
# constrains every subsequent frame), making the propagated prior so
# confident the tracker cannot correct prediction errors. The reference
# down-weights its coarse visual factor similarly (IMUSettings.h:57).
VISUAL_FOLD_WEIGHT = 0.02


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _exp_so3(w):
    t = np.linalg.norm(w)
    W = _hat(w)
    if t < 1e-8:
        return np.eye(3) + W + 0.5 * W @ W
    return (np.eye(3) + np.sin(t) / t * W
            + (1 - np.cos(t)) / (t * t) * W @ W)


def _log_so3(R):
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    anti = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin_t = 0.5 * np.linalg.norm(anti)
    t = np.arctan2(sin_t, cos_t)
    if sin_t < 1e-8:
        return 0.5 * anti
    return anti * (0.5 * t / sin_t)


def dso_to_body_np(R_cw, t_cw, s, R_g, R_cb, t_cb):
    R_wc = R_cw.T
    t_wc = -R_wc @ t_cw
    R_wc_m = R_g.T @ R_wc
    t_wc_m = (R_g.T @ t_wc) / s
    R_wb = R_wc_m @ R_cb
    p_wb = R_wc_m @ t_cb + t_wc_m
    return R_wb, p_wb


def body_to_dso_np(R_wb, p_wb, s, R_g, R_cb, t_cb):
    R_bc = R_cb.T
    t_bc = -R_bc @ t_cb
    R_wc_m = R_wb @ R_bc
    t_wc_m = R_wb @ t_bc + p_wb
    R_wc_d = R_g @ R_wc_m
    t_wc_d = s * (R_g @ t_wc_m)
    return R_wc_d.T, -R_wc_d.T @ t_wc_d


@dataclasses.dataclass
class CoarseIMUState:
    """Gaussian belief about the current frame's [pose, v, bias] (host)."""

    R_cw: np.ndarray     # [3,3] DSO worldToCam (belief center)
    t_cw: np.ndarray
    v: np.ndarray        # [3] metric velocity
    bias: np.ndarray     # [6] [bg, ba]
    H: np.ndarray        # [15,15] float64 information on [xi, v, bias]
    s_log: float
    g2: np.ndarray       # [2]


def init_from_ba(R_cw, t_cw, v, bias, s_log, g2) -> CoarseIMUState:
    """Fresh belief after a keyframe's BA (finishKeyframeOptimization /
    initCoarseGraph handoff): fixed-variance prior around BA estimates."""
    sig = np.concatenate([
        np.full(3, SIG_POSE_TRANS), np.full(3, SIG_POSE_ROT),
        np.full(3, SIG_VEL), np.full(3, SIG_BG), np.full(3, SIG_BA)])
    return CoarseIMUState(
        R_cw=np.asarray(R_cw, np.float64), t_cw=np.asarray(t_cw, np.float64),
        v=np.asarray(v, np.float64), bias=np.asarray(bias, np.float64),
        H=np.diag(1.0 / sig ** 2), s_log=float(s_log),
        g2=np.asarray(g2, np.float64))


def predict(state: CoarseIMUState, pre: dict,
            R_cb: np.ndarray, t_cb: np.ndarray) -> CoarseIMUState:
    """Propagate the belief through one IMU chunk (prev -> new frame).

    `pre` is a host preintegration dict (preint.preintegrate_np).
    Equivalent of addIMUData's preintegrate + marginalize + predict
    (CoarseIMULogic.cpp:55-209), as one dense float64 Schur step.
    """
    s = np.exp(state.s_log)
    R_g = _exp_so3(np.array([state.g2[0], state.g2[1], 0.0]))
    g = np.array([0.0, 0.0, -GRAVITY])
    dt = pre["dt"]

    dbg = state.bias[:3] - pre["bias_lin"][:3]
    dba = state.bias[3:6] - pre["bias_lin"][3:6]
    dR = pre["dR"] @ _exp_so3(pre["dR_dbg"] @ dbg)
    dv = pre["dv"] + pre["dv_dbg"] @ dbg + pre["dv_dba"] @ dba
    dp = pre["dp"] + pre["dp_dbg"] @ dbg + pre["dp_dba"] @ dba

    Rb, pb = dso_to_body_np(state.R_cw, state.t_cw, s, R_g, R_cb, t_cb)
    Rb_new = Rb @ dR
    pb_new = pb + state.v * dt + 0.5 * g * dt ** 2 + Rb @ dp
    v_new = state.v + g * dt + Rb @ dv
    R_cw_new, t_cw_new = body_to_dso_np(Rb_new, pb_new, s, R_g, R_cb, t_cb)

    # Information propagation via the ANALYTIC residual Jacobian over
    # [prev(15) | new(15)] (models/imu_factors.py; scale/gravity columns
    # dropped — they are fixed in the coarse filter, as in the reference's
    # coarse graph).
    W9 = np.linalg.inv(np.linalg.cholesky(
        pre["cov"] + 1e-14 * np.eye(9)))
    from dmvio_tpu.ops import preint as _P
    Wb = np.diag(np.concatenate([
        np.full(3, 1.0 / (_P.NOISE.sigma_gyro_walk
                          * np.sqrt(max(dt, 1e-6)))),
        np.full(3, 1.0 / (_P.NOISE.sigma_acc_walk
                          * np.sqrt(max(dt, 1e-6)))),
    ]))
    from dmvio_tpu.models import imu_factors

    sti = imu_factors.FrameState(state.R_cw, state.t_cw, state.v,
                                 state.bias[:3], state.bias[3:6])
    stj = imu_factors.FrameState(R_cw_new, t_cw_new, v_new,
                                 state.bias[:3], state.bias[3:6])
    _r, J33 = imu_factors.linearize_pair(
        sti, stj, pre, state.s_log, state.g2, R_cb, t_cb)
    Jw = np.concatenate([W9 @ J33[:9], Wb @ J33[9:]], axis=0)
    J = Jw[:, 3:33]   # [prev(15) | new(15)]; s/g2 columns dropped

    H_joint = J.T @ J
    H_joint[:15, :15] += state.H
    A = H_joint[:15, :15]
    Bm = H_joint[:15, 15:]
    D = H_joint[15:, 15:]
    H_new = D - Bm.T @ np.linalg.solve(
        A + 1e-9 * np.eye(15) * max(A.max(), 1.0), Bm)
    H_new = 0.5 * (H_new + H_new.T)

    return CoarseIMUState(
        R_cw=R_cw_new, t_cw=t_cw_new, v=v_new, bias=state.bias.copy(),
        H=H_new, s_log=state.s_log, g2=state.g2.copy())


def _left_jac(w):
    t = np.linalg.norm(w)
    W = _hat(w)
    if t < 1e-8:
        return np.eye(3) + 0.5 * W + W @ W / 6.0
    return (np.eye(3) + (1 - np.cos(t)) / (t * t) * W
            + (t - np.sin(t)) / (t ** 3) * W @ W)


def make_tracker_prior(state: CoarseIMUState, R_ref_np, t_ref_np,
                       rho0: float, b_aff0: float) -> CoarsePrior:
    """Express the belief in the tracker's chart (pose relative to the
    tracking reference) as a 17-dof device prior, zero affine information.
    The pose chart is the same left-increment (reference frame fixed), so
    H transfers unchanged."""
    R_rel = state.R_cw @ R_ref_np.T
    t_rel = state.t_cw - R_rel @ t_ref_np
    H17 = np.zeros((17, 17))
    H17[:6, :6] = state.H[:6, :6]
    H17[:6, 8:] = state.H[:6, 6:]
    H17[8:, :6] = state.H[6:, :6]
    H17[8:, 8:] = state.H[6:, 6:]
    return CoarsePrior(
        H=jnp.asarray(H17, jnp.float32),
        R0=jnp.asarray(R_rel, jnp.float32),
        t0=jnp.asarray(t_rel, jnp.float32),
        aff0=jnp.asarray([rho0, b_aff0], jnp.float32),
        v0=jnp.asarray(state.v, jnp.float32),
        b0=jnp.asarray(state.bias, jnp.float32))


def fuse_visual(state: CoarseIMUState, H_vis8_np: np.ndarray,
                R_cw, t_cw, v, bias) -> CoarseIMUState:
    """Fold the (down-weighted) tracked visual Hessian into the belief and
    move the center to the tracked state (addVisualToCoarseGraph)."""
    H = state.H.copy()
    H[:6, :6] += np.asarray(H_vis8_np[:6, :6],
                            np.float64) * VISUAL_FOLD_WEIGHT
    return CoarseIMUState(
        R_cw=np.asarray(R_cw, np.float64), t_cw=np.asarray(t_cw, np.float64),
        v=np.asarray(v, np.float64), bias=np.asarray(bias, np.float64),
        H=H, s_log=state.s_log, g2=state.g2.copy())
