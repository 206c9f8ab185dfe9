"""IMU initialization: gravity bootstrap + coarse IMU init optimizer.

TPU-native re-design of the reference's initialization stack
(src/IMUInitialization/): GravityInitializer (GravityInitializer.cpp:29-85)
averages accelerometer directions for a first gravity guess;
CoarseIMUInitOptimizer (CoarseIMUInitOptimizer.{h,cpp}) optimizes ONLY the
IMU variables — per-pose velocities, one shared bias, scale, gravity — with
camera poses FIXED from visual tracking, over a window of up to
`maxNumPoses=100` poses (IMUInitSettings.h:38).

Design: the whole optimizer is one jitted LM over a dense state
  x = [s_log, g2(2), bias(6), v_0..v_{N-1} (3N)]
with per-pair 9-dim preintegration residuals (ops/preint.imu_residual)
evaluated through the fixed DSO poses (vio_ba.dso_to_body) and Jacobians by
jacfwd. Fixed capacity N_MAX poses, masked.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.models.vio_ba import dso_to_body
from dmvio_tpu.ops import preint
from dmvio_tpu.utils import lie

N_MAX = 100   # reference init_coarseInitSettings maxNumPoses


def gravity_from_accel(acc_mean: jnp.ndarray) -> jnp.ndarray:
    """First gravity-direction guess from the mean accelerometer vector in
    the (approximately stationary or slowly moving) DSO camera frame.

    Returns the g2 tangent [gx, gy] such that R_g = exp([g2, 0]) maps the
    metric world (-z gravity) to the DSO world: solves for the rotation
    taking -z to the measured "up" direction (GravityInitializer.cpp:29-85
    does the same via sophus averaging).
    """
    up = acc_mean / jnp.maximum(jnp.linalg.norm(acc_mean), 1e-9)
    mz = jnp.array([0.0, 0.0, 1.0])
    # Rotation about the axis perpendicular to both, by the angle between.
    axis = jnp.cross(mz, up)
    s = jnp.linalg.norm(axis)
    c = up @ mz
    ang = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-9)
    w = axis * ang
    return w[:2]


class CoarseInitState(NamedTuple):
    """Fixed-capacity pose buffer for the coarse IMU initializer."""

    R_cw: jnp.ndarray    # [N, 3, 3] DSO worldToCam poses (fixed)
    t_cw: jnp.ndarray    # [N, 3]
    pre: preint.PreintState   # batched [N-1] chunks pose k -> k+1
    valid: jnp.ndarray   # [N] pose slots in use (contiguous prefix)
    # Per-pose tracked-pose uncertainty from the coarse tracker's own
    # photometric Hessian (round-5 accuracy lever #1, docs/ACCURACY.md:
    # the init fits the tracked poses perfectly, so per-frame tracking
    # noise in the high-frequency band biases its scale; weighting each
    # pose observation by the tracker's marginal sigma down-weights
    # exactly the frames whose displacement is least trustworthy).
    sig_rot: jnp.ndarray  # [N] rad
    sig_pos: jnp.ndarray  # [N] DSO units


class CoarseInitResult(NamedTuple):
    s_log: jnp.ndarray
    g2: jnp.ndarray
    bias: jnp.ndarray     # [6] shared
    v: jnp.ndarray        # [N, 3]
    energy: jnp.ndarray
    s_var: jnp.ndarray    # marginal variance of s_log (init-quality gate,
                          # reference threshold 1.0/0.5, IMUInitSettings.h:64)
    ok: jnp.ndarray


# Visual pose-noise floor folded into the measurement covariance: the
# tracked camera poses the init treats as fixed truth carry mm/mrad noise
# that is many sigma under the raw IMU noise model. Without this the MAP
# answer is to SHRINK the world (s -> large) so the noisy positions stop
# mattering — with it, the true scale minimizes the energy (the reference
# sidesteps the same issue by following its coarse init with PGBA, where
# poses are free variables).
SIG_VIS_ROT = 2e-3    # rad
SIG_VIS_VEL = 0.02    # m/s
SIG_VIS_POS = 0.005   # m


def _residual_all(x, st: CoarseInitState, R_cb, t_cb, N: int,
                  use_sig: bool = False):
    """All pair residuals stacked: x = [s_log, g2, bias, v...].

    use_sig=False (the measured default) keeps the ORIGINAL constant
    floor inflation bit-for-bit — the chaotic accuracy basins are
    sensitive to 1e-8-level reformulations (CLAUDE.md), so the per-pair
    tracker-sigma path must not perturb the default numerics."""
    s_log = x[0]
    g2 = x[1:3]
    bias = x[3:9]
    v = x[9:].reshape(N, 3)
    infl_const = jnp.diag(jnp.concatenate([
        jnp.full(3, SIG_VIS_ROT ** 2), jnp.full(3, SIG_VIS_VEL ** 2),
        jnp.full(3, SIG_VIS_POS ** 2)]))

    def one(q):
        pre_q = jax.tree_util.tree_map(lambda a: a[q], st.pre)
        Rb_i, pb_i = dso_to_body(st.R_cw[q], st.t_cw[q], s_log, g2,
                                 R_cb, t_cb)
        Rb_j, pb_j = dso_to_body(st.R_cw[q + 1], st.t_cw[q + 1], s_log, g2,
                                 R_cb, t_cb)
        r9 = preint.imu_residual(pre_q, Rb_i, pb_i, v[q], Rb_j, pb_j,
                                 v[q + 1], bias)
        if use_sig:
            # Pair inflation: the global floor PLUS both endpoint poses'
            # tracker-measured sigmas; the velocity block additionally
            # sees the positional noise differentiated over the dt.
            v_rot = (SIG_VIS_ROT ** 2 + st.sig_rot[q] ** 2
                     + st.sig_rot[q + 1] ** 2)
            v_pos = (SIG_VIS_POS ** 2 + st.sig_pos[q] ** 2
                     + st.sig_pos[q + 1] ** 2)
            dt_q = jnp.maximum(pre_q.dt, 1e-2)
            v_vel = SIG_VIS_VEL ** 2 + (st.sig_pos[q] ** 2
                                        + st.sig_pos[q + 1] ** 2) / dt_q ** 2
            infl = jnp.diag(jnp.concatenate([
                jnp.full(3, v_rot), jnp.full(3, v_vel),
                jnp.full(3, v_pos)]))
        else:
            infl = infl_const
        cov = pre_q.cov + infl
        L = jnp.linalg.cholesky(0.5 * (cov + cov.T)
                                + 1e-12 * jnp.eye(9))
        W = jnp.linalg.inv(L)
        ok = (st.valid[q] & st.valid[q + 1]).astype(r9.dtype)
        return (W @ r9) * ok

    return jax.vmap(one)(jnp.arange(N - 1)).reshape(-1)


def optimize(st: CoarseInitState, R_cb, t_cb,
             s_log0, g20, bias0, v0,
             iters: int = 12,
             bias_prior: float = 1.0 / (0.1 ** 2),
             use_sig: bool = False) -> CoarseInitResult:
    """LM over [s, g2, bias, velocities] with poses fixed.

    The reference runs GTSAM LM with Ceres-default params
    (CoarseIMUInitOptimizer.cpp); thresholds on the scale marginal variance
    gate the handoff (IMUInitializerTransitions.h:62-163).
    """
    N = st.R_cw.shape[0]
    dim = 9 + 3 * N

    x0 = jnp.concatenate([s_log0[None], g20, bias0, v0.reshape(-1)])
    prior_diag = jnp.zeros(dim).at[3:9].set(bias_prior)

    def energy(x):
        r = _residual_all(x, st, R_cb, t_cb, N, use_sig)
        return jnp.sum(r * r) + jnp.sum(prior_diag * (x - x0) ** 2)

    class _S(NamedTuple):
        x: jnp.ndarray
        e: jnp.ndarray
        lam: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    # Mask velocity coords of unused slots.
    vmask = jnp.concatenate([
        jnp.ones(9, bool), jnp.repeat(st.valid, 3)]).astype(jnp.float32)

    def body(s: _S):
        J = jax.jacfwd(lambda x: _residual_all(
            x, st, R_cb, t_cb, N, use_sig))(s.x)
        r = _residual_all(s.x, st, R_cb, t_cb, N, use_sig)
        H = J.T @ J + jnp.diag(prior_diag)
        b = J.T @ r + prior_diag * (s.x - x0)
        H = H * vmask[:, None] * vmask[None, :] + jnp.diag(1.0 - vmask)
        b = b * vmask
        Hl = H + s.lam * jnp.diag(jnp.diag(H))
        # Jacobi equilibration: sqrt-info weights reach ~1e5, so H spans
        # ~1e10 — raw f32 solves collapse (same medicine as ba_solve).
        d = jnp.sqrt(jnp.maximum(jnp.diag(Hl), 1e-12))
        Hp = Hl / (d[:, None] * d[None, :]) + 1e-7 * jnp.eye(dim)
        dx = jnp.linalg.solve(Hp, -(b / d)) / d
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * vmask
        xn = s.x + dx
        # Keep scale/gravity in a sane region (divergence guard).
        xn = xn.at[0].set(jnp.clip(xn[0], -6.0, 6.0))
        xn = xn.at[1:3].set(jnp.clip(xn[1:3], -1.5, 1.5))
        en = energy(xn)
        acc = (en < s.e) & jnp.isfinite(en)
        return _S(
            x=jnp.where(acc, xn, s.x), e=jnp.where(acc, en, s.e),
            lam=jnp.where(acc, jnp.maximum(s.lam * 0.25, 1e-8), s.lam * 4.0),
            it=s.it + 1,
            done=(jnp.sum(dx * dx) < 1e-14) | (s.lam > 1e6),
        )

    init = _S(x=x0, e=energy(x0), lam=jnp.asarray(1e-3, jnp.float32),
              it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False))
    out = jax.lax.while_loop(lambda s: (s.it < iters) & ~s.done, body, init)

    # Scale marginal variance from the final (equilibrated) Hessian.
    J = jax.jacfwd(lambda x: _residual_all(
        x, st, R_cb, t_cb, N, use_sig))(out.x)
    H = J.T @ J + jnp.diag(prior_diag)
    H = H * vmask[:, None] * vmask[None, :] + jnp.diag(1.0 - vmask)
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
    Hp = H / (d[:, None] * d[None, :]) + 1e-7 * jnp.eye(dim)
    e0 = jnp.zeros(dim).at[0].set(1.0)
    s_var = (jnp.linalg.solve(Hp, e0 / d) / d)[0]

    n_valid = jnp.sum(st.valid.astype(jnp.float32))
    ok = jnp.isfinite(out.e) & (n_valid >= 3)
    return CoarseInitResult(
        s_log=out.x[0], g2=out.x[1:3], bias=out.x[3:9],
        v=out.x[9:].reshape(N, 3), energy=out.e, s_var=s_var, ok=ok,
    )


optimize_jit = jax.jit(optimize, static_argnames=("iters", "use_sig"))
