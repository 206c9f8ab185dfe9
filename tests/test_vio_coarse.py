"""IMU-aided coarse tracking: prediction accuracy and joint-solve fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import coarse_tracker, vio_coarse
from dmvio_tpu.ops import preint, pyramid
from dmvio_tpu.utils import lie, synthetic
from dmvio_tpu.utils.camera import Calib
from tests.test_vio_ba import (G2_GT, S_GT, metric_to_dso, simulate_metric)

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
    st = vio_coarse.init_from_ba(R0, t0, jnp.asarray(v0), jnp.zeros(6),
                                 jnp.asarray(np.log(S_GT)), jnp.asarray(G2_GT))
    for k in range(1, 5):
        s0, s1 = (k - 1) * spf, k * spf
        pre = preint.preintegrate_jit(
            jnp.asarray(accs[s0:s1]), jnp.asarray(gyrs[s0:s1]),
            jnp.full(s1 - s0, dt, jnp.float32), jnp.zeros(6))
        st = vio_coarse.predict(st, pre, jnp.eye(3), jnp.zeros(3))
        R_gt, t_gt = poses_dso[k]
        terr = float(jnp.linalg.norm(st.t_cw - t_gt))
        rerr = float(jnp.linalg.norm(lie.so3_log(st.R_cw @ R_gt.T)))
        # Pure-IMU dead reckoning from a good start: mm/mrad-level per 0.1 s.
        assert terr < 0.01 * k, (k, terr)
        assert rerr < 0.005 * k, (k, rerr)
        # Information must remain finite and PSD-ish.
        evals = np.linalg.eigvalsh(np.asarray(st.H))
        assert np.isfinite(evals).all() and evals.max() < 1e12
        _, _, v_gt = states[k * spf]
        assert float(jnp.linalg.norm(st.v - v_gt)) < 0.05 * k


def test_imu_prior_rescues_bad_init():
    """With a poor initialization the joint solve must land at GT thanks to
    the IMU prior, where the visual-only tracker may wander."""
    calib, scene, accs, gyrs, states, poses_dso, images, spf, dt = setup()
    pyr0 = tuple(pyramid.build_pyramid(images[0], levels=4))
    pyr1 = tuple(pyramid.build_pyramid(images[1], levels=4))

    # Reference cloud from frame 0 (GT depths).
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(8, W - 8, 256), jnp.float32)
    v = jnp.asarray(rng.uniform(8, H - 8, 256), jnp.float32)
    R0, t0 = poses_dso[0]
    idep = synthetic.gt_idepth(scene, R0, t0, calib, u, v)
    ref = coarse_tracker.make_tracker_ref(pyr0, calib, u, v, idep,
                                          jnp.ones(256, bool))

    _, _, v0 = states[0]
    st = vio_coarse.init_from_ba(R0, t0, jnp.asarray(v0), jnp.zeros(6),
                                 jnp.asarray(np.log(S_GT)), jnp.asarray(G2_GT))
    pre = preint.preintegrate_jit(
        jnp.asarray(accs[:spf]), jnp.asarray(gyrs[:spf]),
        jnp.full(spf, dt, jnp.float32), jnp.zeros(6))
    st = vio_coarse.predict(st, pre, jnp.eye(3), jnp.zeros(3))

    prior = vio_coarse.make_tracker_prior(st, R0, t0, jnp.asarray(0.0),
                                          jnp.asarray(0.0))
    # Initialize the tracker AT the IMU prediction (the reference's
    # IMU-predicted pose ladder), expressed relative to frame 0.
    Ri, ti = lie.se3_inv(R0, t0)
    R_pred, t_pred = lie.se3_mul(st.R_cw, st.t_cw, Ri, ti)

    res = coarse_tracker.track_jit(
        ref, pyr1, calib, R_pred, t_pred,
        jnp.asarray(0.0), jnp.asarray(0.0), levels=4,
        prior=prior, v_init=st.v, bias_init=st.bias)
    assert bool(res.valid)

    R1, t1 = poses_dso[1]
    R_rel_gt, t_rel_gt = lie.se3_mul(R1, t1, Ri, ti)
    terr = float(jnp.linalg.norm(res.t - t_rel_gt))
    rerr = float(jnp.linalg.norm(lie.so3_log(res.R @ R_rel_gt.T)))
    assert terr < 2e-3, terr
    assert rerr < 2e-3, rerr
    # Velocity stays near the prediction (prior holds it).
    _, _, v1 = states[spf]
    assert float(jnp.linalg.norm(res.v - v1)) < 0.1
