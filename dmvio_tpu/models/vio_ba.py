"""Visual-inertial windowed bundle adjustment.

TPU-native re-design of BAIMULogic + BAGTSAMIntegration (reference
src/IMU/BAIMULogic.cpp:109-324, src/GTSAMIntegration/BAGTSAMIntegration.cpp:
123-250): the keyframe BA state is extended with per-KF velocity and biases
plus a global scale and gravity direction, and IMU preintegration factors
between consecutive keyframes are fused into the same damped solve as the
photometric camera system.

Where the reference needs the PoseTransformation machinery (1,229 LoC of
hand-written relative Jacobians + convention conversions,
src/GTSAMIntegration/PoseTransformation*.{h,cpp}), we express the
DSO-world -> metric-body transform as a plain differentiable function and
let jax.jacfwd produce every cross-Jacobian (pose/scale/gravity/extrinsic)
exactly.

Extended state layout:
    x = [x_vis (4+8F) | per-frame v(3), bg(3), ba(3) -> 9F | s_log, g2(2)]
so C_ext = 4 + 17F + 3. All coordinates follow the same zero-convention FEJ
discipline as the visual stack (delta = current (-) FEJ; priors and the
marginalization Hessian live at the FEJ point).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.models import ba as ba_mod
from dmvio_tpu.ops import ba_solve, preint, residuals
from dmvio_tpu.ops.ba_solve import CPART, cdim
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib

# Relative weight of the photometric system vs the (Mahalanobis-weighted)
# IMU factors. Our IMU side is sqrt-information weighted, so the photometric
# side must be interpreted as a noise model too: w = 1/sigma_I^2 with
# sigma_I ~ 8 intensity units — the same RMSE target the reference's
# dynamic weighting drives the DSO energy toward (setting_dynamicWeightRMSE
# = 8, IMUSettings.h:63; computeDynamicDSOWeight, BAIMULogic.cpp:801-808).
# (The reference's raw setting_weightDSOToGTSAM=1/60000 constant is tied to
# its GTSAM noise-model conventions and under-weights a properly
# Mahalanobis-normalized system: the IMU factors then warp the map freely.)
W_DSO = 1.0 / 64.0

# Dynamic photometric weight threshold: when the photometric RMSE exceeds
# this (intensity units), the visual system is down-weighted by
# (thresh/rmse)^2 — a threshold robust cost over the whole DSO factor
# (computeDynamicDSOWeight, BAIMULogic.cpp:801-808; applied via
# computeDSOWeight, BAGTSAMIntegration.cpp:521-524; rmse =
# sqrt(E/(patternNum*resInA)), FullSystemOptimize.cpp:537).
DYN_RMSE_TH = 8.0


def cdim_ext(F: int) -> int:
    return cdim(F) + 9 * F + 3


def imu_offset(F: int, f) -> int:
    return cdim(F) + 9 * f


class VIOStates(NamedTuple):
    """Per-frame IMU states + global scale/gravity, with FEJ mirrors."""

    v: jnp.ndarray        # [F, 3] metric-world velocity
    bg: jnp.ndarray       # [F, 3] gyro bias
    ba: jnp.ndarray       # [F, 3] accel bias
    v0: jnp.ndarray
    bg0: jnp.ndarray
    ba0: jnp.ndarray
    s_log: jnp.ndarray    # scalar log(scale): p_metric = p_dso / exp(s_log)
    g2: jnp.ndarray       # [2] gravity-direction rotation (x, y tangent)
    s_log0: jnp.ndarray
    g20: jnp.ndarray


def empty_vio_states(F: int) -> VIOStates:
    z3 = jnp.zeros((F, 3), jnp.float32)
    return VIOStates(
        v=z3, bg=z3, ba=z3, v0=z3, bg0=z3, ba0=z3,
        s_log=jnp.asarray(0.0, jnp.float32), g2=jnp.zeros(2, jnp.float32),
        s_log0=jnp.asarray(0.0, jnp.float32), g20=jnp.zeros(2, jnp.float32),
    )


class IMUPairs(NamedTuple):
    """Preintegrated measurements between consecutive keyframes.

    Fixed capacity Q = F-1; `i`/`j` are window slots, masked by `valid`."""

    pre: preint.PreintState   # batched [Q, ...]
    i: jnp.ndarray            # [Q] int32 older slot
    j: jnp.ndarray            # [Q] int32 newer slot
    valid: jnp.ndarray        # [Q] bool


class VIOProblem(NamedTuple):
    base: ba_mod.BAProblem        # visual window (HM/bM0 here are C_ext!)
    states: VIOStates
    pairs: IMUPairs
    HM: jnp.ndarray               # [C_ext, C_ext]
    bM0: jnp.ndarray              # [C_ext]
    prior_diag: jnp.ndarray       # [C_ext]
    R_cb: jnp.ndarray             # [3, 3] cam-from-body extrinsic (T_cam_imu)
    t_cb: jnp.ndarray             # [3]
    imu_on: jnp.ndarray           # scalar bool: fuse IMU factors


def dso_to_body(R_cw, t_cw, s_log, g2, R_cb, t_cb):
    """DSO worldToCam pose -> metric-world body pose (R_wb, p_wb).

    The TransformDSOToIMU capability (PoseTransformationIMU.h:45-133) as a
    plain function: invert, rotate the world by R_g = exp([g2, 0]) (z-fixed
    gravity direction), unscale translation, and append the cam-imu
    extrinsic. All Jacobians come from autodiff at the call sites.
    """
    s = jnp.exp(s_log)
    R_g = lie.so3_exp(jnp.concatenate([g2, jnp.zeros(1)]))
    R_wc, t_wc = lie.se3_inv(R_cw, t_cw)       # camToWorld (dso)
    R_wc_m = R_g.T @ R_wc
    t_wc_m = (R_g.T @ t_wc) / s
    # body -> cam is (R_cb, t_cb); cam -> body: invert.
    R_bc, t_bc = lie.se3_inv(R_cb, t_cb)
    # T_wb = T_wc_m o T_cb  (X_w = R_wc_m (R_cb X_b + t_cb) + t_wc_m)
    R_wb = R_wc_m @ R_cb
    p_wb = R_wc_m @ t_cb + t_wc_m
    return R_wb, p_wb


# Residual-floor inflation of the pair covariance (rad, m/s, m): the
# photometric system holds relative poses only to its own noise level;
# letting raw IMU sigmas (~10x tighter) dominate re-creates the
# shrink-the-world escape (s grows until metric positions are silent) that
# also afflicts the coarse init — see imu_init.SIG_VIS_*. The reference
# manages the same tension with its dynamic DSO re-weighting
# (computeDynamicDSOWeight, BAIMULogic.cpp:801-808).
SIG_FLOOR_ROT = 1e-3
SIG_FLOOR_VEL = 0.01
SIG_FLOOR_POS = 0.003


def _pair_residual(pre_leaf, R_i0, t_i0, R_j0, t_j0, z, R_cb, t_cb,
                   gravity_mag):
    """15-dim weighted residual of one IMU pair as a function of the local
    increment vector z = [xi_i(6), xi_j(6), v_i, v_j, bg_i, ba_i, bg_j,
    ba_j, ds, dg2] (36 dims), evaluated around the given base states."""
    xi_i, xi_j = z[0:6], z[6:12]
    v_i, v_j = z[12:15], z[15:18]
    b_i = z[18:24]
    b_j = z[24:30]
    s_log = z[30]
    g2 = z[31:33]
    R_i, t_i = lie.se3_retract(R_i0, t_i0, xi_i)
    R_j, t_j = lie.se3_retract(R_j0, t_j0, xi_j)
    Rb_i, pb_i = dso_to_body(R_i, t_i, s_log, g2, R_cb, t_cb)
    Rb_j, pb_j = dso_to_body(R_j, t_j, s_log, g2, R_cb, t_cb)
    r9 = preint.imu_residual(pre_leaf, Rb_i, pb_i, v_i, Rb_j, pb_j, v_j,
                             b_i, gravity_mag)
    infl = jnp.diag(jnp.concatenate([
        jnp.full(3, SIG_FLOOR_ROT ** 2), jnp.full(3, SIG_FLOOR_VEL ** 2),
        jnp.full(3, SIG_FLOOR_POS ** 2)]))
    cov = pre_leaf.cov + infl
    L = jnp.linalg.cholesky(0.5 * (cov + cov.T) + 1e-12 * jnp.eye(9))
    W9 = jnp.linalg.inv(L)
    r_bias = b_j - b_i
    Wb = preint.bias_walk_sqrt_info(pre_leaf.dt)
    return jnp.concatenate([W9 @ r9, Wb @ r_bias])


def imu_factor_system(
    frames: BAFrames, states: VIOStates, pairs: IMUPairs,
    R_cb, t_cb, F: int, gravity_mag: float = preint.GRAVITY,
):
    """Linearize all keyframe IMU factors into extended-state rows.

    Returns (J_rows [Q, 15, C_ext], r [Q, 15], energy scalar). Jacobians
    use the FEJ mirrors carried in `frames`/`states`; callers wanting
    current-state linearization (the reference linearizes active IMU
    factors at current values — FEJ only binds marg-connected keys) pass
    mirrors overwritten with the current state (see `at_current`).
    """
    C = cdim_ext(F)

    def one_pair(pre_leaf, si, sj, valid):
        Ri0, ti0 = frames.R0_cw[si], frames.t0_cw[si]
        Rj0, tj0 = frames.R0_cw[sj], frames.t0_cw[sj]
        Ric, tic = frames.R_cw[si], frames.t_cw[si]
        Rjc, tjc = frames.R_cw[sj], frames.t_cw[sj]

        base_fej = jnp.concatenate([
            jnp.zeros(12), states.v0[si], states.v0[sj],
            states.bg0[si], states.ba0[si], states.bg0[sj], states.ba0[sj],
            states.s_log0[None], states.g20,
        ])
        base_cur = jnp.concatenate([
            jnp.zeros(12), states.v[si], states.v[sj],
            states.bg[si], states.ba[si], states.bg[sj], states.ba[sj],
            states.s_log[None], states.g2,
        ])

        def res_fej(z):
            return _pair_residual(pre_leaf, Ri0, ti0, Rj0, tj0, z,
                                  R_cb, t_cb, gravity_mag)

        J = jax.jacfwd(res_fej)(base_fej)          # [15, 36]
        r = _pair_residual(pre_leaf, Ric, tic, Rjc, tjc,
                           base_cur.at[0:12].set(0.0), R_cb, t_cb,
                           gravity_mag)
        vz = valid.astype(J.dtype)
        return J * vz, r * vz

    J36, r = jax.vmap(one_pair)(pairs.pre, pairs.i, pairs.j, pairs.valid)

    # Scatter the 36 local columns into C_ext via slot one-hots.
    Q = pairs.i.shape[0]
    oh_i = jax.nn.one_hot(pairs.i, F, dtype=J36.dtype)   # [Q, F]
    oh_j = jax.nn.one_hot(pairs.j, F, dtype=J36.dtype)
    rows = jnp.zeros((Q, 15, C), J36.dtype)

    def scatter_block(rows, Jblk, oh, width, coord_fn):
        # Jblk: [Q, 15, width]; coord_fn(f) gives the offset of frame f.
        # Build [Q, 15, F, width] -> accumulate into rows.
        contrib = jnp.einsum("qrw,qf->qrfw", Jblk, oh)
        for f in range(F):
            off = coord_fn(f)
            rows = rows.at[:, :, off:off + width].add(contrib[:, :, f, :])
        return rows

    vis = lambda f: CPART + 8 * f
    imu = lambda f: imu_offset(F, f)
    rows = scatter_block(rows, J36[..., 0:6], oh_i, 6, vis)
    rows = scatter_block(rows, J36[..., 6:12], oh_j, 6, vis)
    rows = scatter_block(rows, J36[..., 12:15], oh_i, 3, imu)
    rows = scatter_block(rows, J36[..., 15:18], oh_j, 3, imu)
    rows = scatter_block(rows, J36[..., 18:24], oh_i, 6,
                         lambda f: imu(f) + 3)
    rows = scatter_block(rows, J36[..., 24:30], oh_j, 6,
                         lambda f: imu(f) + 3)
    Cg = cdim(F) + 9 * F
    rows = rows.at[:, :, Cg:Cg + 1].add(J36[..., 30:31])
    rows = rows.at[:, :, Cg + 1:Cg + 3].add(J36[..., 31:33])

    energy = jnp.sum(r * r)
    return rows, r, energy


def at_current(frames: BAFrames, states: VIOStates):
    """FEJ mirrors overwritten with the current state (for linearizing
    active factors at current values, gtsam-style)."""
    return (
        frames._replace(R0_cw=frames.R_cw, t0_cw=frames.t_cw,
                        aff0=frames.aff),
        states._replace(v0=states.v, bg0=states.bg, ba0=states.ba,
                        s_log0=states.s_log, g20=states.g2),
    )


def vio_delta(frames: BAFrames, calib: Calib, calib0, states: VIOStates,
              F: int) -> jnp.ndarray:
    """Extended delta = current (-) FEJ over all C_ext coordinates."""
    d_vis = ba_solve.state_delta(frames, calib, calib0)
    d_imu = jnp.concatenate([
        states.v - states.v0, states.bg - states.bg0, states.ba - states.ba0,
    ], axis=-1).reshape(-1)                       # [9F] (v,bg,ba per frame)
    d_glob = jnp.concatenate([
        (states.s_log - states.s_log0)[None], states.g2 - states.g20,
    ])
    return jnp.concatenate([d_vis, d_imu, d_glob])


def embed_vis(x_vis: jnp.ndarray, F: int) -> jnp.ndarray:
    """Pad a visual [Cv] or [Cv, Cv] object into C_ext."""
    Cv = cdim(F)
    C = cdim_ext(F)
    if x_vis.ndim == 1:
        return jnp.zeros(C, x_vis.dtype).at[:Cv].set(x_vis)
    out = jnp.zeros((C, C), x_vis.dtype)
    return out.at[:Cv, :Cv].set(x_vis)


class VIOResult(NamedTuple):
    frames: BAFrames
    points: BAPoints
    calib: Calib
    states: VIOStates
    energy: jnp.ndarray
    imu_energy: jnp.ndarray
    iters: jnp.ndarray
    pair_outlier: jnp.ndarray
    pair_energy: jnp.ndarray
    vis_rmse: jnp.ndarray     # photometric RMSE at solve entry
    dyn_weight: jnp.ndarray   # dynamic DSO weight applied (<=1)
    frame_th: jnp.ndarray     # [F] adaptive per-frame energy threshold


def optimize(problem: VIOProblem, images: jnp.ndarray,
             max_iters: int = 6, w_dso: float = W_DSO) -> VIOResult:
    """Joint visual-inertial LM over the extended window state.

    The interception point the reference implements in computeBAUpdate
    (BAGTSAMIntegration.cpp:123-250) — convert the DSO system, add the
    factor-graph system, solve jointly, retract — collapses here to
    "embed + add + solve" because both systems are born as dense H/b over
    one state vector.
    """
    base = problem.base
    F = base.frames.mask.shape[0]
    C = cdim_ext(F)
    Cv = cdim(F)

    # FEJ geometry is constant across the LM loop — hoist it.
    geo = residuals.fej_geometry(base.frames, base.points, base.calib)

    def lin_vis(frames, points, calib):
        return residuals.linearize(frames, points, calib, images,
                                   base.pair_mask, geo=geo)

    def energies(frames, points, calib, states, lin):
        delta = vio_delta(frames, calib, base.calib0, states, F)
        e_m = delta @ (2.0 * problem.bM0 + problem.HM @ delta)
        e_p = delta @ (problem.prior_diag * delta)
        _, r_imu, e_imu = imu_factor_system(
            frames._replace(R0_cw=frames.R_cw, t0_cw=frames.t_cw),
            states, problem.pairs, problem.R_cb, problem.t_cb, F)
        e_imu = jnp.where(problem.imu_on, e_imu, 0.0)
        return w_eff * jnp.sum(lin.energy) + e_imu + e_m + e_p, e_imu

    class _St(NamedTuple):
        frames: BAFrames
        points: BAPoints
        calib: Calib
        states: VIOStates
        # Accumulated visual system (~0.6 MB), NOT the raw [F,P,K]
        # linearization (~20 MB): while_loop double-buffers the carry
        # every iteration and carrying the Jacobians costs ~1.6 ms/it of
        # pure copy (measured; see models/ba.py _LoopState).
        sys: ba_solve.BASystem
        energy: jnp.ndarray
        imu_energy: jnp.ndarray
        lam: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    lin0 = lin_vis(base.frames, base.points, base.calib)
    # Dynamic photometric weight from the initial linearization: a bad
    # visual epoch (motion blur, occlusion) must not out-shout the IMU.
    # Fixed for the whole solve so the LM objective stays consistent.
    n_px = jnp.maximum(jnp.sum(lin0.active.astype(jnp.float32)), 1.0)
    rmse0 = jnp.sqrt(jnp.sum(lin0.energy) / n_px)
    dyn = jnp.where(rmse0 > DYN_RMSE_TH,
                    (DYN_RMSE_TH / jnp.maximum(rmse0, 1e-6)) ** 2, 1.0)
    w_eff = w_dso * jnp.where(problem.imu_on, dyn, 1.0)
    e0, ei0 = energies(base.frames, base.points, base.calib, problem.states,
                       lin0)
    st0 = _St(base.frames, base.points, base.calib, problem.states,
              ba_solve.accumulate(lin0, base.points.host, F),
              e0, ei0, jnp.asarray(1e-4, jnp.float32),
              jnp.asarray(0, jnp.int32), jnp.asarray(False))

    def cond(st):
        return (st.it < max_iters) & ~st.done

    def body(st):
        sys_v = st.sys
        delta = vio_delta(st.frames, st.calib, base.calib0, st.states, F)

        # Point-Schur on the visual system, then embed into C_ext.
        Hdd = sys_v.H_dd * (1.0 + st.lam) + 1e-10
        Hdd_inv = jnp.where(st.points.mask, 1.0 / Hdd, 0.0)
        H_sc = sys_v.H_fd.T @ (sys_v.H_fd * Hdd_inv[:, None])
        b_sc = sys_v.H_fd.T @ (sys_v.b_d * Hdd_inv)
        H_vis = (sys_v.H - H_sc) * w_eff
        b_vis = (sys_v.b - b_sc) * w_eff

        fr_cur, st_cur = at_current(st.frames, st.states)
        rows, r_imu, _ = imu_factor_system(
            fr_cur, st_cur, problem.pairs, problem.R_cb, problem.t_cb, F)
        Q = rows.shape[0]
        Jf = rows.reshape(Q * 15, C)
        imu_onf = problem.imu_on.astype(Jf.dtype)
        H_imu = (Jf.T @ Jf) * imu_onf
        b_imu = (Jf.T @ r_imu.reshape(-1)) * imu_onf

        H = embed_vis(H_vis, F) + H_imu + problem.HM \
            + jnp.diag(problem.prior_diag)
        b = embed_vis(b_vis, F) + b_imu + problem.bM0 + problem.HM @ delta \
            + problem.prior_diag * delta

        H = H + st.lam * jnp.diag(jnp.diag(H))

        # Coordinate mask: unoccupied frames; IMU coords gated by imu_on.
        fm = st.frames.mask
        cm_vis = jnp.concatenate([jnp.ones(CPART, bool), jnp.repeat(fm, 8)])
        cm_imu = jnp.repeat(fm, 9) & problem.imu_on
        cm_glob = jnp.broadcast_to(problem.imu_on, (3,))
        cm = jnp.concatenate([cm_vis, cm_imu, cm_glob]).astype(H.dtype)
        H = H * cm[:, None] * cm[None, :] + jnp.diag(1.0 - cm)
        b = b * cm

        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        Hp = H / (d[:, None] * d[None, :]) + 1e-7 * jnp.eye(C, dtype=H.dtype)
        dx = jnp.linalg.solve(Hp, -(b / d)) / d
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * cm

        # Back-substitute idepths from the visual part of the step.
        dx_vis = dx[:Cv]
        dx_d = -(sys_v.b_d + sys_v.H_fd @ dx_vis) * Hdd_inv

        frames_n, points_n, calib_n = ba_mod._apply_step(
            st.frames, st.points, st.calib, dx_vis, dx_d, F)
        off = Cv
        d_imu = dx[off:off + 9 * F].reshape(F, 9)
        stn = st.states._replace(
            v=st.states.v + d_imu[:, 0:3],
            bg=st.states.bg + d_imu[:, 3:6],
            ba=st.states.ba + d_imu[:, 6:9],
            s_log=st.states.s_log + dx[off + 9 * F],
            g2=st.states.g2 + dx[off + 9 * F + 1:off + 9 * F + 3],
        )

        lin_n = lin_vis(frames_n, points_n, calib_n)
        e_n, ei_n = energies(frames_n, points_n, calib_n, stn, lin_n)
        accept = (e_n < st.energy) & jnp.isfinite(e_n)
        sel = lambda a, o: jax.tree_util.tree_map(
            lambda x, y: jnp.where(accept, x, y), a, o)
        step_sq = jnp.sum(dx * dx)
        return _St(
            frames=sel(frames_n, st.frames), points=sel(points_n, st.points),
            calib=sel(calib_n, st.calib), states=sel(stn, st.states),
            sys=sel(ba_solve.accumulate(lin_n, points_n.host, F), st.sys),
            energy=jnp.where(accept, e_n, st.energy),
            imu_energy=jnp.where(accept, ei_n, st.imu_energy),
            lam=jnp.where(accept, jnp.maximum(st.lam * 0.25, 1e-6),
                          st.lam * 4.0),
            it=st.it + 1,
            # Small-step OR flat-step termination in EITHER direction
            # (the reference's canbreak, FullSystemOptimize.cpp:550-586):
            # at a converged state a trial step ties the energy, loses the
            # strict accept test, and a reject-only loop would burn every
            # remaining device iteration going nowhere.
            done=(step_sq < 1e-12) | (st.lam > 1e4)
            | (jnp.abs(st.energy - e_n)
               < 2e-4 * jnp.maximum(st.energy, 1e-12)),
        )

    out = jax.lax.while_loop(cond, body, st0)

    # Final-state linearization for outlier classification, recomputed once
    # (cheaper than carrying the [F,P,K] arrays through the loop).
    lin_f = lin_vis(out.frames, out.points, out.calib)
    pair_ok = base.pair_mask & base.points.mask[None, :]
    # Adaptive per-frame energy threshold (setNewFrameEnergyTH parity —
    # see ba.frame_energy_th; outlier above the looser of host/target,
    # Residuals.cpp:262).
    frame_th = ba_mod.frame_energy_th(lin_f.energy, pair_ok)
    th_pair = jnp.maximum(frame_th[:, None],
                          frame_th[base.points.host][None, :])
    outlier = pair_ok & ((lin_f.energy > th_pair) | lin_f.oob)
    return VIOResult(
        frames=out.frames, points=out.points, calib=out.calib,
        states=out.states, energy=jnp.sum(lin_f.energy),
        imu_energy=out.imu_energy, iters=out.it,
        pair_outlier=outlier, pair_energy=lin_f.energy,
        vis_rmse=rmse0, dyn_weight=dyn, frame_th=frame_th,
    )


optimize_jit = jax.jit(optimize, static_argnames=("max_iters", "w_dso"))


def marginalize_points_ext(problem: VIOProblem, images: jnp.ndarray,
                           marg_points: jnp.ndarray, F: int):
    """Visual point marginalization embedded into the extended prior."""
    base = problem.base
    lin = residuals.linearize(base.frames, base.points, base.calib, images,
                              base.pair_mask)
    delta = ba_solve.state_delta(base.frames, base.calib, base.calib0)
    delta_d = jnp.where(base.points.mask,
                        base.points.idepth - base.points.idepth_zero, 0.0)
    HM_add, bM_add = ba_solve.marginalize_points_system(
        lin, base.points.host, delta, delta_d, marg_points, F)
    return embed_vis(HM_add * W_DSO, F), embed_vis(bM_add * W_DSO, F)


marginalize_points_ext_jit = jax.jit(
    marginalize_points_ext, static_argnames="F")


def vio_marg_fused(problem: VIOProblem, images: jnp.ndarray,
                   age_rank: jnp.ndarray, n_drop: jnp.ndarray,
                   newest_slot):
    """The VIO keyframe marginalization tail as ONE device program, so the
    whole extended keyframe pipeline costs a single blocking fetch (the
    VIO twin of ba.marg_fused; each fetch is a full tunnel round trip):
    device victim selection, extended point-marginalization fold, the
    victims' IMU pair-factor fold (victim-touching pairs selected on
    device), and the point drops. With n_drop == 0 everything degenerates
    to zeros/no-ops — one compilation covers every keyframe.

    Returns (vlist [F], HM_add, bM_add, fold_H, fold_b, points_new,
    pair_mask_new, n_active_pre, n_active_post)."""
    from dmvio_tpu.models import ba as ba_mod
    from dmvio_tpu.models import window_ops

    base = problem.base
    F = base.frames.mask.shape[0]
    vlist = ba_mod.select_victims(base.frames, age_rank, n_drop,
                                  newest_slot)
    hosted, marg_pts, pm_cleared = window_ops.victims_masks(
        base.points, base.pair_mask, vlist)
    HM_add, bM_add = marginalize_points_ext(problem, images, marg_pts, F)
    is_v_i = jnp.any(problem.pairs.i[:, None] == vlist[None, :], axis=1)
    is_v_j = jnp.any(problem.pairs.j[:, None] == vlist[None, :], axis=1)
    sel = problem.pairs.valid & (is_v_i | is_v_j)
    fold_H, fold_b = fold_pairs_into_prior(
        base.frames, problem.states, problem.pairs, problem.R_cb,
        problem.t_cb, base.calib, base.calib0, F, sel)
    n_pre = jnp.sum(base.points.mask.astype(jnp.float32))
    points_new, pm_new = window_ops.drop_points_mask(
        base.points, pm_cleared, hosted)
    n_post = jnp.sum(points_new.mask.astype(jnp.float32))
    return (vlist, HM_add, bM_add, fold_H, fold_b, points_new, pm_new,
            n_pre, n_post)


vio_marg_fused_jit = jax.jit(vio_marg_fused)


def fold_pairs_into_prior(frames: BAFrames, states: VIOStates,
                          pairs: IMUPairs, R_cb, t_cb,
                          calib: Calib, calib0, F: int,
                          pair_sel: jnp.ndarray):
    """Fold selected IMU pair factors into (HM, bM0) before their frames
    are marginalized (the graph-side of marginalizeBAFrame,
    BAGTSAMIntegration.cpp:370-396): FEJ Jacobians, residual transported to
    the linearization point (r0 = r - J delta)."""
    C = cdim_ext(F)
    rows, r, _ = imu_factor_system(frames, states, pairs, R_cb, t_cb, F)
    sel = pair_sel.astype(rows.dtype)
    rows = rows * sel[:, None, None]
    r = r * sel[:, None]
    delta = vio_delta(frames, calib, calib0, states, F)
    Jf = rows.reshape(-1, C)
    r0 = r.reshape(-1) - Jf @ delta
    return Jf.T @ Jf, Jf.T @ r0


fold_pairs_into_prior_jit = jax.jit(fold_pairs_into_prior,
                                    static_argnames="F")


def schur_out_np(HM: "np.ndarray", bM: "np.ndarray", marg: "np.ndarray"):
    """Host float64 Schur-out with PSD projection.

    The prior matrix carries pair-factor information of magnitude ~1e8
    (sqrt-info ~1e4 squared); float32 Schur complements of such terms leave
    indefinite garbage that ACCUMULATES across keyframes (observed: the
    scale/gravity diagonal drifting to -1e5, repelling the state). The
    prior is tiny (C_ext <= ~150) and touched once per keyframe — exact
    float64 on host costs microseconds."""
    import numpy as np

    m = np.asarray(marg, bool)
    k = ~m
    HM = np.asarray(HM, np.float64)
    bM = np.asarray(bM, np.float64)
    if not (np.all(np.isfinite(HM)) and np.all(np.isfinite(bM))):
        # A poisoned prior must not crash the eigensolver. Dropping the
        # non-finite information (zeroing the marginalized coords) keeps
        # the run alive; the map-dead/full-reset machinery recovers the
        # rest (the reference aborts outright on NaN, CoarseIMULogic.cpp:
        # 134-138 — we degrade instead).
        HM = np.nan_to_num(HM, nan=0.0, posinf=0.0, neginf=0.0)
        bM = np.nan_to_num(bM, nan=0.0, posinf=0.0, neginf=0.0)
    Hbb = HM[np.ix_(m, m)]
    Hbb = 0.5 * (Hbb + Hbb.T)
    evals, evecs = np.linalg.eigh(Hbb)
    inv = np.where(evals > 1e-10 * max(evals.max(initial=0.0), 1e-12),
                   1.0 / np.maximum(evals, 1e-300), 0.0)
    Hbb_inv = (evecs * inv) @ evecs.T
    Hkb = HM[np.ix_(k, m)]
    out_H = HM.copy()
    out_b = bM.copy()
    out_H[np.ix_(k, k)] = HM[np.ix_(k, k)] - Hkb @ Hbb_inv @ Hkb.T
    out_b[k] = bM[k] - Hkb @ (Hbb_inv @ bM[m])
    out_H[m, :] = 0.0
    out_H[:, m] = 0.0
    out_b[m] = 0.0
    out_H = 0.5 * (out_H + out_H.T)
    # PSD projection: clip small negative eigenvalues (roundoff defense).
    ev, U = np.linalg.eigh(out_H)
    if ev.min() < 0:
        out_H = (U * np.maximum(ev, 0.0)) @ U.T
    return out_H, out_b


def frame_marg_mask(slot: int, F: int) -> jnp.ndarray:
    """Extended-coordinate mask of one frame (8 visual + 9 IMU coords)."""
    C = cdim_ext(F)
    idx = jnp.arange(C)
    i0 = CPART + 8 * slot
    j0 = imu_offset(F, slot)
    return ((idx >= i0) & (idx < i0 + 8)) | ((idx >= j0) & (idx < j0 + 9))
