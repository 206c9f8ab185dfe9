"""Coarse IMU initializer: scale/gravity/velocity recovery from fixed poses."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import imu_init
from dmvio_tpu.ops import preint
from dmvio_tpu.utils import lie
from tests.test_vio_ba import G2_GT, S_GT, metric_to_dso, simulate_metric

IMU_HZ = 200.0
POSE_DT = 0.1
N_POSES = 30


def build_case(bias_gt=np.zeros(6), seed=2):
    dt = 1.0 / IMU_HZ
    spp = int(POSE_DT * IMU_HZ)
    accs, gyrs, states = simulate_metric(spp * (N_POSES - 1), dt,
                                         noise=True, seed=seed)
    accs = accs + bias_gt[3:6]
    gyrs = gyrs + bias_gt[:3]

    N = imu_init.N_MAX
    Rs = np.zeros((N, 3, 3), np.float32)
    ts = np.zeros((N, 3), np.float32)
    v_gt = np.zeros((N, 3), np.float32)
    for k in range(N_POSES):
        Rb, pb, vb = states[k * spp]
        Rc, tc = metric_to_dso(Rb, pb, S_GT, G2_GT)
        Rs[k] = np.asarray(Rc)
        ts[k] = np.asarray(tc)
        v_gt[k] = vb
    Rs[N_POSES:] = np.eye(3)

    pres = []
    for q in range(N - 1):
        if q < N_POSES - 1:
            s0, s1 = q * spp, (q + 1) * spp
            pres.append(preint.preintegrate_jit(
                jnp.asarray(accs[s0:s1]), jnp.asarray(gyrs[s0:s1]),
                jnp.full(s1 - s0, dt, jnp.float32), jnp.zeros(6)))
        else:
            pres.append(preint.identity_preint(jnp.zeros(6)))
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)

    st = imu_init.CoarseInitState(
        R_cw=jnp.asarray(Rs), t_cw=jnp.asarray(ts), pre=pre_b,
        valid=jnp.arange(N) < N_POSES,
        sig_rot=jnp.zeros(N), sig_pos=jnp.zeros(N))
    return st, v_gt


def test_gravity_from_accel():
    # A stationary IMU in a frame rotated by (g2, 0) measures specific
    # force R_wb^T * (+G z_metric); feed the mean through the bootstrap.
    R_g = lie.so3_exp(jnp.asarray([G2_GT[0], G2_GT[1], 0.0]))
    up_dso = R_g @ jnp.array([0.0, 0.0, 1.0])
    g2 = imu_init.gravity_from_accel(up_dso * preint.GRAVITY)
    R_est = lie.so3_exp(jnp.concatenate([g2, jnp.zeros(1)]))
    err = float(jnp.linalg.norm(
        lie.so3_log(R_est.T @ R_g)))
    assert err < 0.02, err


def test_coarse_init_recovers_scale_gravity_velocities():
    st, v_gt = build_case()
    res = imu_init.optimize_jit(
        st, jnp.eye(3), jnp.zeros(3),
        s_log0=jnp.asarray(0.0),                 # bad scale guess (1.0 vs 1.7)
        g20=jnp.zeros(2),                        # no gravity knowledge
        bias0=jnp.zeros(6),
        v0=jnp.zeros((imu_init.N_MAX, 3)))
    assert bool(res.ok)
    s_est = float(jnp.exp(res.s_log))
    assert abs(s_est - S_GT) / S_GT < 0.02, s_est
    assert np.linalg.norm(np.asarray(res.g2) - G2_GT) < 0.01, res.g2
    v_err = np.linalg.norm(np.asarray(res.v)[:N_POSES] - v_gt[:N_POSES],
                           axis=1)
    assert np.median(v_err) < 0.03, np.median(v_err)
    # Scale variance is small once observable (init-quality gate).
    assert float(res.s_var) < 1.0


def test_coarse_init_estimates_bias():
    bias_gt = np.array([0.004, -0.006, 0.003, 0.05, -0.08, 0.06], np.float32)
    st, v_gt = build_case(bias_gt=bias_gt)
    res = imu_init.optimize_jit(
        st, jnp.eye(3), jnp.zeros(3),
        s_log0=jnp.asarray(np.log(S_GT)), g20=jnp.asarray(G2_GT),
        bias0=jnp.zeros(6), v0=jnp.zeros((imu_init.N_MAX, 3)))
    b = np.asarray(res.bias)
    assert np.abs(b[:3] - bias_gt[:3]).max() < 2e-3, b
    assert np.abs(b[3:] - bias_gt[3:]).max() < 0.03, b
