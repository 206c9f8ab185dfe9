"""Preintegration correctness against a simulated analytic trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import preint
from dmvio_tpu.utils import lie


def simulate(n=200, dt=0.005, bias=np.zeros(6), seed=0):
    """Analytic trajectory: sinusoidal acceleration + rotation; returns
    exact states and the ideal body-frame IMU samples (with bias added)."""
    g = np.array([0.0, 0.0, -preint.GRAVITY])

    def a_world(t):
        return np.array([0.8 * np.sin(2.1 * t), 0.5 * np.cos(1.7 * t),
                         0.3 * np.sin(1.1 * t)])

    def w_body(t):
        return np.array([0.4 * np.sin(1.3 * t), 0.3 * np.cos(0.9 * t),
                         0.2 * np.sin(0.7 * t)])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    accs, gyrs, dts = [], [], []
    states = [(R.copy(), p.copy(), v.copy())]
    for k in range(n):
        t = k * dt
        aw = a_world(t)
        wb = w_body(t)
        # ideal measurements (midpoint-ish: use start-of-interval)
        acc_body = R.T @ (aw - g)
        accs.append(acc_body + bias[3:6])
        gyrs.append(wb + bias[:3])
        dts.append(dt)
        # integrate exactly like the preintegration model does
        p = p + v * dt + 0.5 * (R @ acc_body) * dt ** 2 + 0.5 * g * dt ** 2
        v = v + (R @ acc_body) * dt + g * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(wb * dt)))
        states.append((R.copy(), p.copy(), v.copy()))
    return (np.array(accs, np.float32), np.array(gyrs, np.float32),
            np.array(dts, np.float32), states)


def test_residual_zero_for_true_states():
    accs, gyrs, dts, states = simulate(bias=np.zeros(6))
    pre = preint.preintegrate_jit(jnp.asarray(accs), jnp.asarray(gyrs),
                                  jnp.asarray(dts), jnp.zeros(6))
    R0, p0, v0 = states[0]
    R1, p1, v1 = states[-1]
    r = preint.imu_residual(pre, jnp.asarray(R0), jnp.asarray(p0),
                            jnp.asarray(v0), jnp.asarray(R1),
                            jnp.asarray(p1), jnp.asarray(v1), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-4)


def test_padding_is_noop():
    accs, gyrs, dts, states = simulate(n=100)
    pad = 60
    accs_p = np.concatenate([accs, np.random.randn(pad, 3).astype(np.float32)])
    gyrs_p = np.concatenate([gyrs, np.random.randn(pad, 3).astype(np.float32)])
    dts_p = np.concatenate([dts, np.zeros(pad, np.float32)])
    a = preint.preintegrate_jit(jnp.asarray(accs), jnp.asarray(gyrs),
                                jnp.asarray(dts), jnp.zeros(6))
    b = preint.preintegrate_jit(jnp.asarray(accs_p), jnp.asarray(gyrs_p),
                                jnp.asarray(dts_p), jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(a.dR), np.asarray(b.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), atol=1e-9)


def test_bias_jacobian_first_order():
    """Residual with bias correction ~ residual of re-integration at the
    perturbed bias (first-order equivalence, the ImuFactor mechanism)."""
    true_bias = np.array([0.004, -0.003, 0.002, 0.03, -0.02, 0.04], np.float32)
    accs, gyrs, dts, states = simulate(bias=true_bias)
    # Preintegrate at WRONG (zero) bias linearization.
    pre0 = preint.preintegrate_jit(jnp.asarray(accs), jnp.asarray(gyrs),
                                   jnp.asarray(dts), jnp.zeros(6))
    R0, p0, v0 = states[0]
    R1, p1, v1 = states[-1]
    args = (jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1))
    # Without correction the residual is large...
    r_raw = preint.imu_residual(pre0, *args, jnp.zeros(6))
    # ...with the first-order correction at the true bias it nearly vanishes.
    r_corr = preint.imu_residual(pre0, *args, jnp.asarray(true_bias))
    assert np.linalg.norm(np.asarray(r_corr)) < 0.05 * np.linalg.norm(np.asarray(r_raw))
    np.testing.assert_allclose(np.asarray(r_corr), 0.0, atol=5e-3)


def test_covariance_scales_with_noise_and_time():
    accs, gyrs, dts, _ = simulate(n=100)
    p1 = preint.preintegrate_jit(jnp.asarray(accs), jnp.asarray(gyrs),
                                 jnp.asarray(dts), jnp.zeros(6))
    p2 = preint.preintegrate(jnp.asarray(accs), jnp.asarray(gyrs),
                             jnp.asarray(dts), jnp.zeros(6),
                             sigma_gyro=2 * 1.6968e-4, sigma_acc=2 * 2.0e-3)
    c1 = np.asarray(p1.cov)
    c2 = np.asarray(p2.cov)
    # 2x sigmas -> 4x covariance.
    np.testing.assert_allclose(c2, 4.0 * c1, rtol=1e-3, atol=1e-14)
    # Sqrt information is consistent: W^T W ~ cov^{-1}.
    W = np.asarray(preint.sqrt_information(p1))
    err = W.T @ W @ c1 - np.eye(9)
    assert np.abs(err).max() < 1e-2


def test_vectorized_host_preint_matches_reference_loop():
    """preintegrate_np (vectorized: batched SO(3) terms + closed-form bias
    Jacobians) must agree with the per-step reference loop to float64
    roundoff — the coarse filter, delayed log and PGBA all consume it."""
    rng = np.random.default_rng(7)
    for n in (1, 2, 9, 64, 131):
        acc = rng.normal(0, 2.0, (n, 3)) + np.array([0, 0, 9.8])
        gyr = rng.normal(0, 0.8, (n, 3))
        dts = rng.uniform(0.003, 0.008, n)
        if n > 5:
            dts[3] = 0.0          # zero-dt samples are skipped
        bias = rng.normal(0, 0.05, 6)
        fast = preint.preintegrate_np(acc, gyr, dts, bias)
        ref = preint.preintegrate_np_ref(acc, gyr, dts, bias)
        for k in ref:
            va, vb = np.asarray(fast[k]), np.asarray(ref[k])
            scale = max(np.abs(vb).max(), 1.0)
            assert np.abs(va - vb).max() < 1e-11 * scale, (n, k)
    # Degenerate inputs: empty chunk and all-zero dts hit the identity path.
    z = preint.preintegrate_np(np.zeros((0, 3)), np.zeros((0, 3)),
                               np.zeros(0), np.zeros(6))
    np.testing.assert_allclose(z["dR"], np.eye(3))
    assert z["dt"] == 0.0
