"""On-manifold IMU preintegration as a lax.scan.

TPU-native replacement for the used subset of GTSAM's
PreintegratedImuMeasurements (reference integrateIMUData,
src/IMU/IMUUtils.h:37 / IMUIntegration.cpp:46-85): Forster-style
preintegrated ΔR/Δv/Δp with first-order bias Jacobians and 9x9 covariance
propagation. Measurement sequences are fixed-capacity padded arrays (dt = 0
rows are exact no-ops), so one compiled scan serves every frame interval.

Conventions:
  * body frame = IMU frame; R = R_wb (body-to-world), p/v in metric world.
  * gravity is -z in the metric world: g = (0, 0, -G).
  * bias = [bg (3), ba (3)] (gyro first, like the state layout in
    models/vio_ba.py).
  * residual/state tangent ordering: [r_R(3), r_v(3), r_p(3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.utils import lie

GRAVITY = 9.8082  # reference IMUCalibration default (IMUSettings.h:126-135)


class NoiseModel:
    """Process-wide IMU noise model (the reference's IMUCalibration noise
    block, IMUSettings.h:126-135, loaded from per-dataset YAMLs like
    configs/tumvi.yaml). Continuous-time densities; covariance propagation
    divides by dt per Forster-style discretization.

    Values are read at TRACE time by the jitted paths, so `set_noise` must
    run before the pipeline's first compute (it clears the preintegration
    jit cache, but downstream jits that baked in bias-walk weights are only
    rebuilt on process restart — set the noise model at startup)."""

    sigma_gyro: float = 1.6968e-4
    sigma_acc: float = 2.0e-3
    sigma_gyro_walk: float = 8.0e-5
    sigma_acc_walk: float = 3.0e-3
    sigma_integration: float = 1e-8


NOISE = NoiseModel()


def set_noise(sigma_gyro=None, sigma_acc=None, sigma_gyro_walk=None,
              sigma_acc_walk=None, sigma_integration=None) -> None:
    """Install dataset noise densities (call before the first frame)."""
    for k, v in [("sigma_gyro", sigma_gyro), ("sigma_acc", sigma_acc),
                 ("sigma_gyro_walk", sigma_gyro_walk),
                 ("sigma_acc_walk", sigma_acc_walk),
                 ("sigma_integration", sigma_integration)]:
        if v is not None:
            setattr(NOISE, k, float(v))
    try:
        preintegrate_jit.clear_cache()
    except Exception:
        pass


class PreintState(NamedTuple):
    """Preintegrated measurement between two stamps (at a bias lin point)."""

    dR: jnp.ndarray       # [3, 3]
    dv: jnp.ndarray       # [3]
    dp: jnp.ndarray       # [3]
    dt: jnp.ndarray       # scalar total time
    # First-order bias Jacobians.
    dR_dbg: jnp.ndarray   # [3, 3]
    dv_dbg: jnp.ndarray   # [3, 3]
    dv_dba: jnp.ndarray   # [3, 3]
    dp_dbg: jnp.ndarray   # [3, 3]
    dp_dba: jnp.ndarray   # [3, 3]
    cov: jnp.ndarray      # [9, 9] on [r_R, r_v, r_p]
    bias_lin: jnp.ndarray  # [6] bias linearization point [bg, ba]


def state_from_np(pre_np: dict) -> PreintState:
    """Device PreintState from a host preintegration dict (ONE device_put
    of the whole pytree; the f64 host result cast to f32 — at least as
    accurate as the padded on-device f32 scan it replaces, and ~10x
    cheaper to produce on the keyframe path)."""
    import jax
    import numpy as np

    return jax.device_put(PreintState(
        dR=np.asarray(pre_np["dR"], np.float32),
        dv=np.asarray(pre_np["dv"], np.float32),
        dp=np.asarray(pre_np["dp"], np.float32),
        dt=np.float32(pre_np["dt"]),
        dR_dbg=np.asarray(pre_np["dR_dbg"], np.float32),
        dv_dbg=np.asarray(pre_np["dv_dbg"], np.float32),
        dv_dba=np.asarray(pre_np["dv_dba"], np.float32),
        dp_dbg=np.asarray(pre_np["dp_dbg"], np.float32),
        dp_dba=np.asarray(pre_np["dp_dba"], np.float32),
        cov=np.asarray(pre_np["cov"], np.float32),
        bias_lin=np.asarray(pre_np["bias_lin"], np.float32),
    ))


def identity_preint(bias: jnp.ndarray) -> PreintState:
    I = jnp.eye(3, dtype=jnp.float32)
    Z = jnp.zeros((3, 3), jnp.float32)
    return PreintState(
        dR=I, dv=jnp.zeros(3), dp=jnp.zeros(3), dt=jnp.asarray(0.0),
        dR_dbg=Z, dv_dbg=Z, dv_dba=Z, dp_dbg=Z, dp_dba=Z,
        cov=jnp.zeros((9, 9), jnp.float32),
        bias_lin=jnp.asarray(bias, jnp.float32),
    )


def _right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO3 right Jacobian Jr(w) (Jr = Jl(-w))."""
    t2 = jnp.sum(w * w)
    t = jnp.sqrt(jnp.maximum(t2, 0.0))
    small = t2 < 1e-8
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (t - jnp.sin(t)) / jnp.where(small, 1.0, t2 * t))
    W = lie.hat(w)
    return jnp.eye(3, dtype=w.dtype) - b * W + c * (W @ W)


def preintegrate(
    acc: jnp.ndarray,       # [N, 3] accelerometer (body), padded
    gyr: jnp.ndarray,       # [N, 3] gyroscope (body), padded
    dts: jnp.ndarray,       # [N] integration intervals; 0 = padding
    bias: jnp.ndarray,      # [6] = [bg, ba] linearization point
    sigma_gyro: float = None,
    sigma_acc: float = None,
    sigma_integration: float = None,
) -> PreintState:
    """Scan all measurements into one PreintState."""
    sigma_gyro = NOISE.sigma_gyro if sigma_gyro is None else sigma_gyro
    sigma_acc = NOISE.sigma_acc if sigma_acc is None else sigma_acc
    sigma_integration = (NOISE.sigma_integration
                         if sigma_integration is None else sigma_integration)
    bg = bias[:3]
    ba = bias[3:6]
    cov_w = (sigma_gyro ** 2) * jnp.eye(3)
    cov_a = (sigma_acc ** 2) * jnp.eye(3)
    cov_i = (sigma_integration ** 2) * jnp.eye(3)

    def step(st: PreintState, inp):
        a, w, dt = inp
        valid = dt > 0
        dts_ = jnp.where(valid, dt, 0.0)
        a_c = a - ba
        w_c = (w - bg) * dts_
        dRk = lie.so3_exp(w_c)
        Jr = _right_jacobian(w_c)
        aH = lie.hat(a_c)

        dR_new = st.dR @ dRk
        dv_new = st.dv + st.dR @ a_c * dts_
        dp_new = st.dp + st.dv * dts_ + 0.5 * st.dR @ a_c * dts_ ** 2

        # Bias Jacobians (Forster et al. eq. 44-46 recursions, rederived).
        dR_dbg_new = dRk.T @ st.dR_dbg - Jr * dts_
        dv_dbg_new = st.dv_dbg - st.dR @ aH @ st.dR_dbg * dts_
        dv_dba_new = st.dv_dba - st.dR * dts_
        dp_dbg_new = st.dp_dbg + st.dv_dbg * dts_ \
            - 0.5 * st.dR @ aH @ st.dR_dbg * dts_ ** 2
        dp_dba_new = st.dp_dba + st.dv_dba * dts_ - 0.5 * st.dR * dts_ ** 2

        # Covariance propagation: x = [dθ, dv, dp].
        Z = jnp.zeros((3, 3))
        I = jnp.eye(3)
        A = jnp.block([
            [dRk.T, Z, Z],
            [-st.dR @ aH * dts_, I, Z],
            [-0.5 * st.dR @ aH * dts_ ** 2, I * dts_, I],
        ])
        B = jnp.block([
            [Jr * dts_, Z, Z],
            [Z, st.dR * dts_, Z],
            [Z, 0.5 * st.dR * dts_ ** 2, st.dR * dts_],
        ])
        dt_safe = jnp.where(valid, dts_, 1.0)
        Q = jnp.block([
            [cov_w / dt_safe, Z, Z],
            [Z, cov_a / dt_safe, Z],
            [Z, Z, cov_i * dt_safe],
        ])
        cov_new = A @ st.cov @ A.T + B @ Q @ B.T

        sel = lambda n, o: jnp.where(valid, n, o)
        new = PreintState(
            dR=sel(dR_new, st.dR), dv=sel(dv_new, st.dv),
            dp=sel(dp_new, st.dp), dt=st.dt + dts_,
            dR_dbg=sel(dR_dbg_new, st.dR_dbg),
            dv_dbg=sel(dv_dbg_new, st.dv_dbg),
            dv_dba=sel(dv_dba_new, st.dv_dba),
            dp_dbg=sel(dp_dbg_new, st.dp_dbg),
            dp_dba=sel(dp_dba_new, st.dp_dba),
            cov=sel(cov_new, st.cov),
            bias_lin=st.bias_lin,
        )
        return new, None

    init = identity_preint(bias)
    out, _ = jax.lax.scan(step, init, (acc, gyr, dts))
    return out


preintegrate_jit = jax.jit(preintegrate)


def imu_residual(
    pre: PreintState,
    R_i: jnp.ndarray, p_i: jnp.ndarray, v_i: jnp.ndarray,
    R_j: jnp.ndarray, p_j: jnp.ndarray, v_j: jnp.ndarray,
    bias_i: jnp.ndarray,      # [6] current bias estimate at frame i
    gravity_mag: float = GRAVITY,
) -> jnp.ndarray:
    """9-dim preintegration residual [r_R, r_v, r_p] (unweighted).

    States are metric-world body poses (R = R_wb). Bias deviations from the
    preintegration linearization point are corrected to first order
    (gtsam::ImuFactor semantics used by BAIMULogic.cpp:235-324).
    """
    dbg = bias_i[:3] - pre.bias_lin[:3]
    dba = bias_i[3:6] - pre.bias_lin[3:6]
    g = jnp.array([0.0, 0.0, -gravity_mag])
    dt = pre.dt

    dR_corr = pre.dR @ lie.so3_exp(pre.dR_dbg @ dbg)
    dv_corr = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dp_corr = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba

    r_R = lie.so3_log(dR_corr.T @ R_i.T @ R_j)
    r_v = R_i.T @ (v_j - v_i - g * dt) - dv_corr
    r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * g * dt ** 2) - dp_corr
    return jnp.concatenate([r_R, r_v, r_p])


def sqrt_information(pre: PreintState, jitter: float = 1e-10) -> jnp.ndarray:
    """Sqrt information W with W^T W = cov^{-1}.

    cov = L L^T  =>  cov^{-1} = L^{-T} L^{-1} = (L^{-1})^T (L^{-1}), so
    W = L^{-1}; weighting r' = W r makes ||r'||^2 the Mahalanobis energy.
    """
    cov = pre.cov + jitter * jnp.eye(9, dtype=pre.cov.dtype)
    cov = 0.5 * (cov + cov.T)
    L = jnp.linalg.cholesky(cov)
    return jnp.linalg.inv(L)


def _hat_np_b(w):
    """[N,3] -> [N,3,3] (host float64)."""
    import numpy as np

    N = w.shape[0]
    W = np.zeros((N, 3, 3), np.float64)
    W[:, 0, 1] = -w[:, 2]
    W[:, 0, 2] = w[:, 1]
    W[:, 1, 0] = w[:, 2]
    W[:, 1, 2] = -w[:, 0]
    W[:, 2, 0] = -w[:, 1]
    W[:, 2, 1] = w[:, 0]
    return W


def _exp_so3_np_b(w):
    """Batched exp map matching the scalar branch structure of
    preintegrate_np_ref (small-angle: I + W + 0.5 W^2)."""
    import numpy as np

    t = np.linalg.norm(w, axis=-1)
    W = _hat_np_b(w)
    W2 = W @ W
    small = t < 1e-8
    ts = np.where(small, 1.0, t)
    c1 = np.where(small, 1.0, np.sin(ts) / ts)
    c2 = np.where(small, 0.5, (1 - np.cos(ts)) / (ts * ts))
    return np.eye(3) + c1[:, None, None] * W + c2[:, None, None] * W2


def _right_jac_np_b(w):
    import numpy as np

    t = np.linalg.norm(w, axis=-1)
    W = _hat_np_b(w)
    W2 = W @ W
    small = t < 1e-6
    ts = np.where(small, 1.0, t)
    c1 = np.where(small, 0.5, (1 - np.cos(ts)) / (ts * ts))
    c2 = np.where(small, 1.0 / 6.0, (ts - np.sin(ts)) / (ts ** 3))
    return np.eye(3) - c1[:, None, None] * W + c2[:, None, None] * W2


def preintegrate_np(acc, gyr, dts, bias):
    """Host-side float64 preintegration (NumPy) for the coarse filter.

    The per-frame chunks are ~10 samples; their covariance is tiny, so the
    downstream information-propagation Schur cancels large terms — float32
    on device turns that into indefinite garbage, float64 on host is exact
    to working precision. Mirrors preintegrate(). Returns a dict with the
    same fields as PreintState (numpy float64).

    VECTORIZED: the per-step loop of preintegrate_np_ref costs ~0.25 ms of
    Python per sample (~18 ms per 70-sample keyframe chunk, measured on the
    realtime keyframe path). Here every per-sample SO(3) term is batched,
    the bias Jacobians use the closed forms

        dR_dbg_N = -dR_N^T . sum_k dR_{1..k} Jr_k dt_k
        dR_dbg_k = -dR_{1..k}^T S_k,   S_k = cumsum(dR_{1..m} Jr_m dt_m)

    (exact rearrangements of the ref recursion), states/dv_dba/dp_dba are
    cumulative sums, and only the dR prefix chain and the 9x9 covariance
    recursion stay sequential (N tiny matmuls). Agrees with
    preintegrate_np_ref to float64 roundoff (tests/test_preint.py)."""
    import numpy as np

    bg = np.asarray(bias[:3], np.float64)
    ba = np.asarray(bias[3:6], np.float64)
    sg, sa, si = NOISE.sigma_gyro, NOISE.sigma_acc, NOISE.sigma_integration

    dts_all = np.asarray(dts, np.float64)
    keep = dts_all > 0
    dt = dts_all[keep]
    N = int(dt.shape[0])
    out_zero = {
        "dR": np.eye(3), "dv": np.zeros(3), "dp": np.zeros(3), "dt": 0.0,
        "cov": np.zeros((9, 9)),
        "dR_dbg": np.zeros((3, 3)), "dv_dbg": np.zeros((3, 3)),
        "dv_dba": np.zeros((3, 3)), "dp_dbg": np.zeros((3, 3)),
        "dp_dba": np.zeros((3, 3)),
        "bias_lin": np.concatenate([bg, ba]),
    }
    if N == 0:
        return out_zero
    a_c = np.asarray(acc, np.float64)[keep] - ba              # [N,3]
    w_c = (np.asarray(gyr, np.float64)[keep] - bg) * dt[:, None]

    dRk = _exp_so3_np_b(w_c)          # [N,3,3]
    Jr = _right_jac_np_b(w_c)
    aH = _hat_np_b(a_c)

    # dR prefix chain: P[k] = product of the first k sample rotations.
    P = np.empty((N + 1, 3, 3))
    P[0] = np.eye(3)
    for k in range(N):
        np.matmul(P[k], dRk[k], out=P[k + 1])
    dR_prev = P[:N]                   # rotation BEFORE step k
    dR_incl = P[1:]                   # rotation INCLUDING step k
    dR = P[N]

    dtc = dt[:, None]
    dRa = (dR_prev @ a_c[..., None])[..., 0] * dtc            # [N,3]
    M = dR_prev @ aH * dt[:, None, None]                      # dR aH dt

    # States (cumulative sums in loop order).
    dv_pfx = np.cumsum(dRa, axis=0)
    dv_prev = np.vstack([np.zeros(3), dv_pfx[:-1]])
    dv = dv_pfx[-1]
    dp = (dv_prev * dtc + 0.5 * dtc * dRa).sum(axis=0)

    # Gyro-bias Jacobians via the prefix identities above.
    T_terms = dR_incl @ Jr * dt[:, None, None]                # [N,3,3]
    S = np.cumsum(T_terms, axis=0)                            # S_k
    dR_dbg = -dR.T @ S[-1]
    # dR_dbg_{k-1} = -dR_incl[k-1]^T S[k-1]; step term of dv_dbg is
    # -M_k dR_dbg_{k-1} = +M_k dR_incl[k-1]^T S[k-1] = +U_k.
    U = np.zeros((N, 3, 3))
    if N > 1:
        U[1:] = M[1:] @ np.swapaxes(dR_incl[:-1], -1, -2) @ S[:-1]
    dv_dbg_pfx = np.cumsum(U, axis=0)
    dv_dbg_prev = np.concatenate([np.zeros((1, 3, 3)), dv_dbg_pfx[:-1]])
    dv_dbg = dv_dbg_pfx[-1]
    dp_dbg = (dv_dbg_prev * dt[:, None, None]
              + 0.5 * dt[:, None, None] * U).sum(axis=0)

    # Accel-bias Jacobians (pure cumulative sums).
    dv_dba_steps = -dR_prev * dtc[..., None]
    dv_dba_pfx = np.cumsum(dv_dba_steps, axis=0)
    dv_dba_prev = np.concatenate([np.zeros((1, 3, 3)), dv_dba_pfx[:-1]])
    dv_dba = dv_dba_pfx[-1]
    dp_dba = (dv_dba_prev * dt[:, None, None]
              - 0.5 * dR_prev * (dt * dt)[:, None, None]).sum(axis=0)

    # Covariance: batch-assemble A_k and B_k Q_k B_k^T, then the (small)
    # sequential 9x9 recursion.
    A = np.zeros((N, 9, 9))
    A[:, 0:3, 0:3] = np.swapaxes(dRk, -1, -2)
    A[:, 3:6, 0:3] = -M
    A[:, 3:6, 3:6] = np.eye(3)
    A[:, 6:9, 0:3] = -0.5 * M * dt[:, None, None]
    A[:, 6:9, 3:6] = np.eye(3) * dtc[..., None]
    A[:, 6:9, 6:9] = np.eye(3)
    B = np.zeros((N, 9, 9))
    B[:, 0:3, 0:3] = Jr * dt[:, None, None]
    B[:, 3:6, 3:6] = dR_prev * dt[:, None, None]
    B[:, 6:9, 3:6] = 0.5 * dR_prev * (dt * dt)[:, None, None]
    B[:, 6:9, 6:9] = dR_prev * dt[:, None, None]
    q = np.zeros((N, 9))
    q[:, 0:3] = (sg ** 2 / dt)[:, None]
    q[:, 3:6] = (sa ** 2 / dt)[:, None]
    q[:, 6:9] = (si ** 2 * dt)[:, None]
    C = (B * q[:, None, :]) @ np.swapaxes(B, -1, -2)
    cov = np.zeros((9, 9))
    for k in range(N):
        cov = A[k] @ cov @ A[k].T + C[k]

    return {
        "dR": dR, "dv": dv, "dp": dp, "dt": float(dt.sum()), "cov": cov,
        "dR_dbg": dR_dbg, "dv_dbg": dv_dbg, "dv_dba": dv_dba,
        "dp_dbg": dp_dbg, "dp_dba": dp_dba,
        "bias_lin": np.concatenate([bg, ba]),
    }


def preintegrate_np_ref(acc, gyr, dts, bias):
    """Reference per-step loop form of preintegrate_np (kept as the
    ground truth for the vectorized path's agreement test)."""
    import numpy as np

    bg = np.asarray(bias[:3], np.float64)
    ba = np.asarray(bias[3:6], np.float64)
    sg, sa, si = NOISE.sigma_gyro, NOISE.sigma_acc, NOISE.sigma_integration
    dR = np.eye(3)
    dv = np.zeros(3)
    dp = np.zeros(3)
    T = 0.0
    dR_dbg = np.zeros((3, 3))
    dv_dbg = np.zeros((3, 3))
    dv_dba = np.zeros((3, 3))
    dp_dbg = np.zeros((3, 3))
    dp_dba = np.zeros((3, 3))
    cov = np.zeros((9, 9))

    def hat(w):
        return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                         [-w[1], w[0], 0]])

    def exp_so3(w):
        t = np.linalg.norm(w)
        W = hat(w)
        if t < 1e-8:
            return np.eye(3) + W + 0.5 * W @ W
        return (np.eye(3) + np.sin(t) / t * W
                + (1 - np.cos(t)) / (t * t) * W @ W)

    def right_jac(w):
        t = np.linalg.norm(w)
        W = hat(w)
        if t < 1e-6:
            return np.eye(3) - 0.5 * W + W @ W / 6.0
        return (np.eye(3) - (1 - np.cos(t)) / (t * t) * W
                + (t - np.sin(t)) / (t ** 3) * W @ W)

    I3 = np.eye(3)
    Z3 = np.zeros((3, 3))
    for k in range(len(dts)):
        dt = float(dts[k])
        if dt <= 0:
            continue
        a_c = np.asarray(acc[k], np.float64) - ba
        w_c = (np.asarray(gyr[k], np.float64) - bg) * dt
        dRk = exp_so3(w_c)
        Jr = right_jac(w_c)
        aH = hat(a_c)

        A = np.block([
            [dRk.T, Z3, Z3],
            [-dR @ aH * dt, I3, Z3],
            [-0.5 * dR @ aH * dt * dt, I3 * dt, I3],
        ])
        B = np.block([
            [Jr * dt, Z3, Z3],
            [Z3, dR * dt, Z3],
            [Z3, 0.5 * dR * dt * dt, dR * dt],
        ])
        Q = np.block([
            [sg ** 2 / dt * I3, Z3, Z3],
            [Z3, sa ** 2 / dt * I3, Z3],
            [Z3, Z3, si ** 2 * dt * I3],
        ])
        cov = A @ cov @ A.T + B @ Q @ B.T

        dR_dbg_n = dRk.T @ dR_dbg - Jr * dt
        dv_dbg_n = dv_dbg - dR @ aH @ dR_dbg * dt
        dv_dba_n = dv_dba - dR * dt
        dp_dbg_n = dp_dbg + dv_dbg * dt - 0.5 * dR @ aH @ dR_dbg * dt * dt
        dp_dba_n = dp_dba + dv_dba * dt - 0.5 * dR * dt * dt
        dp = dp + dv * dt + 0.5 * dR @ a_c * dt * dt
        dv = dv + dR @ a_c * dt
        dR = dR @ dRk
        dR_dbg, dv_dbg, dv_dba = dR_dbg_n, dv_dbg_n, dv_dba_n
        dp_dbg, dp_dba = dp_dbg_n, dp_dba_n
        T += dt
    return {
        "dR": dR, "dv": dv, "dp": dp, "dt": T, "cov": cov,
        "dR_dbg": dR_dbg, "dv_dbg": dv_dbg, "dv_dba": dv_dba,
        "dp_dbg": dp_dbg, "dp_dba": dp_dba,
        "bias_lin": np.concatenate([bg, ba]),
    }


def bias_walk_sqrt_info(
    dt: jnp.ndarray,
    sigma_gyro_walk: float = None,
    sigma_acc_walk: float = None,
) -> jnp.ndarray:
    """Sqrt information of the bias random-walk between-factor
    (computeBiasNoiseModel, IMUUtils.h:40)."""
    sigma_gyro_walk = (NOISE.sigma_gyro_walk
                       if sigma_gyro_walk is None else sigma_gyro_walk)
    sigma_acc_walk = (NOISE.sigma_acc_walk
                      if sigma_acc_walk is None else sigma_acc_walk)
    dt_safe = jnp.maximum(dt, 1e-6)
    sg = 1.0 / (sigma_gyro_walk * jnp.sqrt(dt_safe))
    sa = 1.0 / (sigma_acc_walk * jnp.sqrt(dt_safe))
    return jnp.diag(jnp.concatenate([jnp.full(3, sg), jnp.full(3, sa)]))
