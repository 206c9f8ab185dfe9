"""Unit tests of the delayed-marginalization log and PGBA on exact inputs."""

import dataclasses

import numpy as np
import pytest

from dmvio_tpu.models import delayed, pgba
from dmvio_tpu.models import vio_coarse as vc
from dmvio_tpu.ops import preint
from tests.test_vio_ba import metric_to_dso, simulate_metric

S_GT = 1.3
G2_GT = np.array([0.05, -0.03])
IMU_HZ = 200.0
KF_DT = 0.15
N_KF = 24


def build_world(seed=1, pose_noise=0.0, R_cb=None, t_cb=None):
    dt = 1.0 / IMU_HZ
    spk = int(KF_DT * IMU_HZ)
    accs, gyrs, states = simulate_metric(spk * (N_KF - 1), dt, noise=True,
                                         seed=seed)
    rng = np.random.default_rng(seed + 5)
    kfs = {}
    pres = []
    R_g = vc._exp_so3(np.array([G2_GT[0], G2_GT[1], 0.0]))
    for k in range(N_KF):
        Rb, pb, vb = states[k * spk]
        if R_cb is not None:
            # Camera != body: derive the DSO camera pose through the full
            # extrinsic chain (body_to_dso_np is the exact inverse of the
            # dso_to_body chain the factors use).
            Rc, tc = vc.body_to_dso_np(np.asarray(Rb), np.asarray(pb),
                                       S_GT, R_g, R_cb, t_cb)
        else:
            Rc, tc = metric_to_dso(Rb, pb, S_GT, G2_GT)
        Rc = np.asarray(Rc, np.float64)
        tc = np.asarray(tc, np.float64)
        if pose_noise > 0:
            w = rng.normal(0, pose_noise, 3)
            Rc = vc._exp_so3(w) @ Rc
            tc = tc + rng.normal(0, pose_noise, 3)
        kfs[k] = delayed.KFState(
            R_cw=Rc, t_cw=tc, aff=np.zeros(2),
            v=np.asarray(vb, np.float64), bg=np.zeros(3), ba=np.zeros(3))
    for k in range(N_KF - 1):
        s0, s1 = k * spk, (k + 1) * spk
        pres.append(preint.preintegrate_np(
            accs[s0:s1], gyrs[s0:s1], np.full(s1 - s0, dt), np.zeros(6)))
    return kfs, pres


def make_log(kfs, pres, pose_stiff=1e4, R_cb=None, t_cb=None):
    """Delayed log whose events carry simple pose-anchoring quadratics (the
    role the visual system plays) and whose pairs are the symbolic IMU
    factors."""
    log = delayed.DelayedLog(delay=64, R_cb=R_cb, t_cb=t_cb)
    for k in range(N_KF - 1):
        C = delayed.GDIM + 2 * delayed.KDIM
        H = np.zeros((C, C))
        # Anchor the RELATIVE pose between consecutive keyframes (what the
        # photometric system provides), not absolute poses.
        o_i = delayed.GDIM
        o_j = delayed.GDIM + delayed.KDIM
        for d in range(6):
            H[o_i + d, o_i + d] += pose_stiff
            H[o_j + d, o_j + d] += pose_stiff
            H[o_i + d, o_j + d] -= pose_stiff
            H[o_j + d, o_i + d] -= pose_stiff
        ev = delayed.MargEvent(
            victim=k,
            fids=[k, k + 1], H=H, b0=np.zeros(C),
            fej={k: kfs[k], k + 1: kfs[k + 1]},
            s_log0=np.log(S_GT), g20=G2_GT.copy())
        pair = delayed.SymbolicPair(fid_i=k, fid_j=k + 1, pre=pres[k])
        log.events.append(ev)
        log.pairs.append(pair)
    return log


def test_pair_linearization_consistent():
    """_linearize_pair's numeric J reproduces the residual to first order,
    and the residual vanishes at ground truth."""
    kfs, pres = build_world()
    p = delayed.SymbolicPair(fid_i=3, fid_j=4, pre=pres[3])
    eye, zero = np.eye(3), np.zeros(3)
    r = pgba._pair_residual_np(p, kfs, np.log(S_GT), G2_GT, eye, zero)
    assert np.abs(r).max() < 5.0, np.abs(r).max()   # noise-level residual

    off = {3: delayed.GDIM, 4: delayed.GDIM + delayed.KDIM}
    H, b, idx = delayed._linearize_pair(p, kfs, off, np.log(S_GT), G2_GT,
                                        eye, zero)
    assert np.isfinite(H).all() and np.isfinite(b).all()
    evals = np.linalg.eigvalsh(H)
    assert evals.min() > -1e-3 * max(abs(evals).max(), 1.0)


def test_pgba_recovers_scale_from_wrong_init():
    kfs, pres = build_world()
    log = make_log(kfs, pres)
    # Window = last few keyframes, current states = truth.
    window = {k: kfs[k] for k in range(N_KF - 4, N_KF)}
    wrong_s = np.log(S_GT) + 0.4      # 50% scale error
    wrong_g = G2_GT + np.array([-0.05, 0.04])
    res = pgba.run(log, window, None, wrong_s, wrong_g, iters=15)
    assert res is not None and res.ok
    assert abs(np.exp(res.s_log) - S_GT) / S_GT < 0.05, np.exp(res.s_log)
    assert np.linalg.norm(res.g2 - G2_GT) < 0.03, res.g2
    assert res.s_var < 0.05, res.s_var


def test_pgba_rotated_rig_recovers_scale():
    """A 90-degree-rotated camera-IMU rig (large T_cam_imu, the TUM-VI
    regime) must recover scale/gravity exactly as the identity rig does —
    the extrinsics flow through every pair (re)linearization
    (TransformDSOToIMU parity, PoseTransformationIMU.h:45-133). Round 1
    hard-coded identity here and would mis-frame gravity on such a rig."""
    R_cb = vc._exp_so3(np.array([np.pi / 2, 0.0, 0.0]))
    t_cb = np.array([0.08, -0.04, 0.05])
    kfs, pres = build_world(R_cb=R_cb, t_cb=t_cb)
    log = make_log(kfs, pres, R_cb=R_cb, t_cb=t_cb)
    window = {k: kfs[k] for k in range(N_KF - 4, N_KF)}
    wrong_s = np.log(S_GT) + 0.4
    wrong_g = G2_GT + np.array([-0.05, 0.04])
    res = pgba.run(log, window, None, wrong_s, wrong_g, iters=15)
    assert res is not None and res.ok
    assert abs(np.exp(res.s_log) - S_GT) / S_GT < 0.05, np.exp(res.s_log)
    assert np.linalg.norm(res.g2 - G2_GT) < 0.03, res.g2
    assert res.s_var < 0.05, res.s_var


def test_pgba_with_noisy_poses():
    kfs, pres = build_world(pose_noise=2e-3)
    log = make_log(kfs, pres)
    window = {k: kfs[k] for k in range(N_KF - 4, N_KF)}
    res = pgba.run(log, window, None, np.log(S_GT) + 0.3, G2_GT, iters=15)
    assert res is not None and res.ok
    assert abs(np.exp(res.s_log) - S_GT) / S_GT < 0.1, np.exp(res.s_log)


def test_delayed_advance_preserves_scale_info():
    """Events pushed past the delay are folded into the tail; the tail must
    retain (not destroy) information."""
    kfs, pres = build_world()
    log = delayed.DelayedLog(delay=6)
    full = make_log(kfs, pres)
    for ev, pair in zip(list(full.events), full.pairs):
        log.record_event(ev, [pair])
    assert len(log.events) <= 6
    assert log.tail_H is not None
    evals = np.linalg.eigvalsh(log.tail_H)
    assert evals.min() > -1e-6 * max(abs(evals).max(), 1.0)
    # PGBA over the reduced log still works.
    window = {k: kfs[k] for k in range(N_KF - 4, N_KF)}
    res = pgba.run(log, window, None, np.log(S_GT) + 0.3, G2_GT, iters=15)
    assert res is not None


def test_rebuild_prior_replacement():
    """Marginalization replacement: the prior rebuilt from the log at the
    refined linearization point must (a) be PSD, (b) center its scale
    estimate at the refined value — its gradient w.r.t. the scale coord
    vanishes at the adopted state and pulls back when scale is perturbed."""
    kfs, pres = build_world()
    log = make_log(kfs, pres)
    window_fids = list(range(N_KF - 4, N_KF))
    target = {k: kfs[k] for k in window_fids}
    res = pgba.run(log, {k: kfs[k] for k in window_fids}, None,
                   np.log(S_GT) + 0.4, G2_GT, iters=15)
    assert res is not None and res.ok
    out = log.rebuild_prior(window_fids, target, res.states,
                            res.s_log, res.g2)
    assert out is not None
    H, b = out
    C = delayed.GDIM + len(window_fids) * delayed.KDIM
    assert H.shape == (C, C) and b.shape == (C,)
    evals = np.linalg.eigvalsh(H)
    assert evals.min() > -1e-5 * max(abs(evals).max(), 1.0)
    # Scale information survived elimination: the rebuilt prior must carry
    # substantial curvature on the global scale coordinate.
    assert H[0, 0] > 1e2, H[0, 0]
    # The prior is centered near the adopted scale: the quadratic's
    # minimum along the scale coordinate is close to zero offset.
    s_off = -b[0] / H[0, 0]
    assert abs(s_off) < 0.05, s_off


def test_background_pgba_thread(monkeypatch):
    """Realtime mode runs PGBA off-thread on a log snapshot and adopts the
    result at a later keyframe (RealtimePGBAState parity,
    IMUInitializerStates.h:137-210)."""
    import jax.numpy as jnp

    from dmvio_tpu.models.imu_system import ACTIVE, IMUCalib, IMUSystem

    kfs, pres = build_world()
    log = make_log(kfs, pres)
    sysb = IMUSystem(IMUCalib(), f_max=8)
    sysb.pgba_background = True
    sysb.phase = ACTIVE

    class FakeStates:       # only s_log/g2 are read by the snapshot block
        s_log = jnp.asarray(np.log(S_GT) + 0.4, jnp.float32)
        g2 = jnp.asarray(G2_GT + np.array([-0.05, 0.04]), jnp.float32)

    sysb.states = FakeStates()
    sysb.delayed_log = log
    window = {k: kfs[k] for k in range(N_KF - 4, N_KF)}
    monkeypatch.setattr(sysb, "snapshot_kf_states",
                        lambda *a, **k: dict(window))
    adopted = []
    monkeypatch.setattr(
        sysb, "_adopt_pgba",
        lambda res, f, s: (adopted.append(res), True)[1])

    sysb.kf_since_pgba = 10
    assert sysb.maybe_run_pgba(None, [], every=6) is False   # thread started
    assert sysb._pgba_bg is not None
    n_events_before = len(log.events)
    log.pairs.append(delayed.SymbolicPair(          # log keeps growing
        fid_i=N_KF - 2, fid_j=N_KF - 1, pre=pres[-1]))
    sysb._pgba_bg["thread"].join(timeout=180)
    assert sysb.maybe_run_pgba(None, [], every=6) is True    # harvested
    res = adopted[0]
    assert res is not None and res.ok
    assert abs(np.exp(res.s_log) - S_GT) / S_GT < 0.05
    assert len(log.events) == n_events_before                # live log intact
