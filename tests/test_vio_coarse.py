"""IMU-aided coarse tracking: prediction accuracy and joint-solve fusion.

The coarse filter is HOST-side float64 (see models/vio_coarse.py docstring)
— these tests also guard the numerical health of the information
propagation (PSD, bounded)."""

import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import coarse_tracker, vio_coarse
from dmvio_tpu.ops import preint, pyramid
from dmvio_tpu.utils import lie, synthetic
from dmvio_tpu.utils.camera import Calib
from tests.test_vio_ba import G2_GT, S_GT, metric_to_dso, simulate_metric

H, W = 96, 128
IMU_HZ = 200.0
FRAME_DT = 0.1


def setup(n_frames=6):
    dt = 1.0 / IMU_HZ
    spf = int(FRAME_DT * IMU_HZ)
    accs, gyrs, states = simulate_metric(spf * (n_frames - 1), dt, noise=True)
    calib = Calib.create(100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)
    poses_dso = []
    for k in range(n_frames):
        Rb, pb, vb = states[k * spf]
        poses_dso.append(metric_to_dso(Rb, pb, S_GT, G2_GT))
    images = [synthetic.render(scene, R, t, calib, H, W)
              for (R, t) in poses_dso]
    return calib, scene, accs, gyrs, states, poses_dso, images, spf, dt


def test_predict_tracks_ground_truth():
    calib, scene, accs, gyrs, states, poses_dso, images, spf, dt = setup()
    R0, t0 = poses_dso[0]
    _, _, v0 = states[0]
    st = vio_coarse.init_from_ba(np.asarray(R0), np.asarray(t0), v0,
                                 np.zeros(6), np.log(S_GT), G2_GT)
    eye = np.eye(3)
    z = np.zeros(3)
    for k in range(1, 5):
        s0, s1 = (k - 1) * spf, k * spf
        pre = preint.preintegrate_np(accs[s0:s1], gyrs[s0:s1],
                                     np.full(s1 - s0, dt), np.zeros(6))
        st = vio_coarse.predict(st, pre, eye, z)
        R_gt, t_gt = poses_dso[k]
        terr = np.linalg.norm(st.t_cw - np.asarray(t_gt))
        rerr = np.linalg.norm(np.asarray(
            lie.so3_log(jnp.asarray(st.R_cw @ np.asarray(R_gt).T))))
        # Pure-IMU dead reckoning from a good start: mm/mrad per 0.1 s.
        assert terr < 0.01 * k, (k, terr)
        assert rerr < 0.005 * k, (k, rerr)
        # Information must stay finite and PSD (float64 filter guarantee).
        evals = np.linalg.eigvalsh(st.H)
        assert np.isfinite(evals).all()
        assert evals.min() > -1e-3 * abs(evals.max()), evals.min()
        _, _, v_gt = states[k * spf]
        assert np.linalg.norm(st.v - v_gt) < 0.05 * k


def test_information_bounded_under_fuse_predict_cycles():
    """The fuse(visual)+predict cycle must not blow the information up
    (overconfidence) nor make it indefinite."""
    calib, scene, accs, gyrs, states, poses_dso, images, spf, dt = setup()
    R0, t0 = poses_dso[0]
    _, _, v0 = states[0]
    st = vio_coarse.init_from_ba(np.asarray(R0), np.asarray(t0), v0,
                                 np.zeros(6), np.log(S_GT), G2_GT)
    H_vis = np.eye(8) * 5e3   # typical finest-level photometric information
    eye = np.eye(3)
    z = np.zeros(3)
    for k in range(1, 5):
        s0, s1 = (k - 1) * spf, k * spf
        pre = preint.preintegrate_np(accs[s0:s1], gyrs[s0:s1],
                                     np.full(s1 - s0, dt), np.zeros(6))
        st = vio_coarse.predict(st, pre, eye, z)
        R_gt, t_gt = poses_dso[k]
        _, _, v_gt = states[k * spf]
        st = vio_coarse.fuse_visual(st, H_vis, np.asarray(R_gt),
                                    np.asarray(t_gt), v_gt, np.zeros(6))
        evals = np.linalg.eigvalsh(st.H)
        assert evals.max() < 1e9, evals.max()
        assert evals.min() > -1e-3 * abs(evals.max())


def test_imu_prior_rescues_bad_init():
    """With a poor initialization the joint solve must land at GT thanks to
    the IMU prior."""
    calib, scene, accs, gyrs, states, poses_dso, images, spf, dt = setup()
    pyr0 = tuple(pyramid.build_pyramid(images[0], levels=4))
    pyr1 = tuple(pyramid.build_pyramid(images[1], levels=4))

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(8, W - 8, 256), jnp.float32)
    v = jnp.asarray(rng.uniform(8, H - 8, 256), jnp.float32)
    R0, t0 = poses_dso[0]
    idep = synthetic.gt_idepth(scene, R0, t0, calib, u, v)
    ref = coarse_tracker.make_tracker_ref(pyr0, calib, u, v, idep,
                                          jnp.ones(256, bool))

    _, _, v0 = states[0]
    st = vio_coarse.init_from_ba(np.asarray(R0), np.asarray(t0), v0,
                                 np.zeros(6), np.log(S_GT), G2_GT)
    pre = preint.preintegrate_np(accs[:spf], gyrs[:spf],
                                 np.full(spf, dt), np.zeros(6))
    st = vio_coarse.predict(st, pre, np.eye(3), np.zeros(3))

    R0n = np.asarray(R0)
    t0n = np.asarray(t0)
    prior = vio_coarse.make_tracker_prior(st, R0n, t0n, 0.0, 0.0)
    R_pred = st.R_cw @ R0n.T
    t_pred = st.t_cw - R_pred @ t0n

    res, _ = coarse_tracker.track_jit(
        ref, pyr1, calib, jnp.asarray(R_pred, jnp.float32),
        jnp.asarray(t_pred, jnp.float32),
        jnp.asarray(0.0), jnp.asarray(0.0), levels=4,
        prior=prior, v_init=jnp.asarray(st.v, jnp.float32),
        bias_init=jnp.asarray(st.bias, jnp.float32))
    assert bool(res.valid)

    R1, t1 = poses_dso[1]
    R_rel_gt, t_rel_gt = lie.se3_mul(R1, t1, *lie.se3_inv(R0, t0))
    terr = float(jnp.linalg.norm(res.t - t_rel_gt))
    rerr = float(jnp.linalg.norm(lie.so3_log(res.R @ R_rel_gt.T)))
    assert terr < 2e-3, terr
    assert rerr < 2e-3, rerr
    _, _, v1 = states[spf]
    assert float(jnp.linalg.norm(res.v - v1)) < 0.1
