"""Analytic IMU pair Jacobians vs numeric differentiation (host float64).

models/imu_factors.py replaces round 1's finite-difference linearization of
the preintegration residual; these tests pin the analytic J to an FD
reference on random states, with NON-trivial camera-IMU extrinsics, biases
off the preintegration linearization point, and scale/gravity offsets."""

import numpy as np
import pytest

from dmvio_tpu.models import imu_factors as F


def _rand_state(rng, vel_scale=0.5):
    w = rng.normal(0, 0.8, 3)
    return F.FrameState(
        R_cw=F._exp_so3(w),
        t_cw=rng.normal(0, 1.0, 3),
        v=rng.normal(0, vel_scale, 3),
        bg=rng.normal(0, 0.01, 3),
        ba=rng.normal(0, 0.05, 3))


def _rand_pre(rng, dt=0.15):
    """A synthetic (not physically integrated) preintegration dict: the
    Jacobian identities hold for ANY field values."""
    return {
        "dR": F._exp_so3(rng.normal(0, 0.2, 3)),
        "dv": rng.normal(0, 0.3, 3),
        "dp": rng.normal(0, 0.1, 3),
        "dR_dbg": rng.normal(0, 0.5, (3, 3)),
        "dv_dbg": rng.normal(0, 0.5, (3, 3)),
        "dv_dba": rng.normal(0, 0.5, (3, 3)),
        "dp_dbg": rng.normal(0, 0.3, (3, 3)),
        "dp_dba": rng.normal(0, 0.3, (3, 3)),
        "bias_lin": rng.normal(0, 0.02, 6),
        "cov": np.eye(9),
        "dt": dt,
    }


def _apply_z(sti, stj, s_log, g2, z):
    """Retract the 33-dim perturbation exactly as the linearization's
    chart defines it (left-increment se3 on the DSO pose)."""
    def retract(st, o):
        xi = z[o:o + 6]
        dR = F._exp_so3(xi[3:6])
        V = F._jl_so3(xi[3:6])
        return F.FrameState(
            R_cw=dR @ st.R_cw, t_cw=dR @ st.t_cw + V @ xi[0:3],
            v=st.v + z[o + 6:o + 9], bg=st.bg + z[o + 9:o + 12],
            ba=st.ba + z[o + 12:o + 15])

    return (retract(sti, 3), retract(stj, 18),
            s_log + z[0], np.asarray(g2) + z[1:3])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_analytic_jacobian_matches_fd(seed):
    rng = np.random.default_rng(seed)
    sti = _rand_state(rng)
    stj = _rand_state(rng)
    pre = _rand_pre(rng)
    s_log = rng.normal(0.2, 0.3)
    g2 = rng.normal(0, 0.1, 2)
    R_cb = F._exp_so3(rng.normal(0, 1.0, 3))
    t_cb = rng.normal(0, 0.1, 3)

    r0, J = F.linearize_pair(sti, stj, pre, s_log, g2, R_cb, t_cb)
    assert r0.shape == (15,) and J.shape == (15, 33)

    eps = 1e-7
    J_fd = np.zeros((15, 33))
    for k in range(33):
        zp = np.zeros(33)
        zp[k] = eps
        zm = np.zeros(33)
        zm[k] = -eps
        ai, aj, asl, ag = _apply_z(sti, stj, s_log, g2, zp)
        rp, _ = F.linearize_pair(ai, aj, pre, asl, ag, R_cb, t_cb)
        ai, aj, asl, ag = _apply_z(sti, stj, s_log, g2, zm)
        rm, _ = F.linearize_pair(ai, aj, pre, asl, ag, R_cb, t_cb)
        J_fd[:, k] = (rp - rm) / (2 * eps)

    scale = max(np.abs(J_fd).max(), 1.0)
    err = np.abs(J - J_fd).max() / scale
    assert err < 5e-6, (err, np.unravel_index(
        np.abs(J - J_fd).argmax(), J.shape))


def test_identity_extrinsics_matches_plain_chain():
    """With R_cb=I, t_cb=0 the residual reduces to the plain DSO->metric
    transform chain used everywhere in round 1."""
    rng = np.random.default_rng(7)
    sti = _rand_state(rng)
    stj = _rand_state(rng)
    pre = _rand_pre(rng)
    from dmvio_tpu.models import vio_coarse as vc

    s_log, g2 = 0.3, np.array([0.05, -0.02])
    r, _ = F.linearize_pair(sti, stj, pre, s_log, g2,
                            np.eye(3), np.zeros(3))
    # Independent recomputation.
    s = np.exp(s_log)
    R_g = vc._exp_so3(np.array([g2[0], g2[1], 0.0]))
    Rb_i, pb_i = vc.dso_to_body_np(sti.R_cw, sti.t_cw, s, R_g,
                                   np.eye(3), np.zeros(3))
    Rb_j, pb_j = vc.dso_to_body_np(stj.R_cw, stj.t_cw, s, R_g,
                                   np.eye(3), np.zeros(3))
    dbg = sti.bg - pre["bias_lin"][:3]
    dba = sti.ba - pre["bias_lin"][3:6]
    dR = pre["dR"] @ vc._exp_so3(pre["dR_dbg"] @ dbg)
    dt = pre["dt"]
    g_vec = np.array([0, 0, -F.GRAVITY])
    r_R = vc._log_so3(dR.T @ Rb_i.T @ Rb_j)
    dv = pre["dv"] + pre["dv_dbg"] @ dbg + pre["dv_dba"] @ dba
    dp = pre["dp"] + pre["dp_dbg"] @ dbg + pre["dp_dba"] @ dba
    r_v = Rb_i.T @ (stj.v - sti.v - g_vec * dt) - dv
    r_p = Rb_i.T @ (pb_j - pb_i - sti.v * dt - 0.5 * g_vec * dt ** 2) - dp
    np.testing.assert_allclose(r[:3], r_R, atol=1e-12)
    np.testing.assert_allclose(r[3:6], r_v, atol=1e-12)
    np.testing.assert_allclose(r[6:9], r_p, atol=1e-12)


def test_residual_zero_at_consistent_states():
    """A pair whose j-state is exactly the preintegration-propagated
    i-state yields a ~zero residual (through a rotated rig)."""
    rng = np.random.default_rng(3)
    from dmvio_tpu.models import vio_coarse as vc

    R_cb = F._exp_so3(np.array([0.0, 0.0, np.pi / 2]))
    t_cb = np.array([0.1, -0.05, 0.02])
    s_log, g2 = 0.25, np.array([0.04, -0.06])
    s = np.exp(s_log)
    R_g = F._exp_so3(np.array([g2[0], g2[1], 0.0]))
    g_vec = np.array([0, 0, -F.GRAVITY])

    sti = _rand_state(rng)
    pre = _rand_pre(rng)
    pre["bias_lin"] = np.concatenate([sti.bg, sti.ba])  # dbg = dba = 0
    dt = pre["dt"]
    Rb_i, pb_i = vc.dso_to_body_np(sti.R_cw, sti.t_cw, s, R_g, R_cb, t_cb)
    Rb_j = Rb_i @ pre["dR"]
    v_j = sti.v + g_vec * dt + Rb_i @ pre["dv"]
    pb_j = pb_i + sti.v * dt + 0.5 * g_vec * dt ** 2 + Rb_i @ pre["dp"]
    R_cw_j, t_cw_j = vc.body_to_dso_np(Rb_j, pb_j, s, R_g, R_cb, t_cb)
    stj = F.FrameState(R_cw_j, t_cw_j, v_j, sti.bg.copy(), sti.ba.copy())
    r, _ = F.linearize_pair(sti, stj, pre, s_log, g2, R_cb, t_cb)
    assert np.abs(r).max() < 1e-10, np.abs(r).max()


def test_batched_linearization_matches_scalar():
    """linearize_pairs_batch must agree with the scalar linearize_pair to
    float64 roundoff on random pairs (the PGBA LM loop depends on it)."""
    rng = np.random.default_rng(11)
    K, N = 9, 24
    states = [_rand_state(rng) for _ in range(K)]
    pres = [_rand_pre(rng, dt=float(rng.uniform(0.05, 0.4)))
            for _ in range(N)]
    ii = rng.integers(0, K, N)
    jj = (ii + 1 + rng.integers(0, K - 1, N)) % K
    s_log = 0.17
    g2 = np.array([0.03, -0.08])
    R_cb = F._exp_so3(np.array([0.2, -0.4, 1.1]))
    t_cb = np.array([0.05, 0.02, -0.08])

    from dmvio_tpu.models.delayed import pair_weights_batch

    W9, Wb = pair_weights_batch(pres)
    batch = F.PairBatch(pres, ii, jj, W9, Wb)
    R = np.stack([s.R_cw for s in states])
    t = np.stack([s.t_cw for s in states])
    v = np.stack([s.v for s in states])
    bg = np.stack([s.bg for s in states])
    ba = np.stack([s.ba for s in states])
    r_b, J_b = F.linearize_pairs_batch(batch, R, t, v, bg, ba,
                                       s_log, g2, R_cb, t_cb)
    assert r_b.shape == (N, 15) and J_b.shape == (N, 15, 33)
    for k in range(N):
        r_s, J_s = F.linearize_pair(states[ii[k]], states[jj[k]], pres[k],
                                    s_log, g2, R_cb, t_cb)
        np.testing.assert_allclose(r_b[k], r_s, rtol=1e-13, atol=1e-13)
        np.testing.assert_allclose(J_b[k], J_s, rtol=1e-12, atol=1e-12)


def test_batched_weights_match_scalar():
    rng = np.random.default_rng(5)
    pres = []
    for _ in range(6):
        A = rng.normal(0, 0.01, (9, 9))
        pres.append({"cov": A @ A.T, "dt": float(rng.uniform(0.05, 0.5))})
    from dmvio_tpu.models.delayed import pair_weights, pair_weights_batch

    W9b, Wbb = pair_weights_batch(pres)
    for k, p in enumerate(pres):
        W9, Wb = pair_weights(p)
        np.testing.assert_allclose(W9b[k], W9, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(Wbb[k], Wb, rtol=1e-12, atol=1e-12)
