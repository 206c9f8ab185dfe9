"""Visual-inertial BA: scale + gravity recovery on a simulated trajectory.

The defining DM-VIO capability (reference BAIMULogic + TransformDSOToIMU):
the visual window lives in an arbitrary-scale, gravity-rotated "DSO" world;
IMU preintegration factors must pull the scale s and gravity direction g2
to their true values while refining poses/velocities/biases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvio_tpu.models import ba as ba_mod
from dmvio_tpu.models import vio_ba
from dmvio_tpu.ops import ba_solve, interp, preint, pyramid
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import lie, synthetic
from dmvio_tpu.utils.camera import Calib, PATTERN

H, W = 96, 128
F = 4
IMU_HZ = 200.0
KF_DT = 0.3          # seconds between keyframes
S_GT = 1.7           # true metric->dso scale
G2_GT = np.array([0.06, -0.04], np.float32)   # true gravity tangent


def simulate_metric(n_steps, dt, noise=True, seed=1):
    """Body trajectory with rich acceleration (for observability).

    Measurement noise matches the preintegration sigmas — with noise-free
    measurements the sqrt-information becomes enormous relative to the
    photometric system and the joint problem turns needlessly stiff (real
    sensors are what the noise model describes)."""
    g = np.array([0.0, 0.0, -preint.GRAVITY])
    nrng = np.random.default_rng(seed)

    def a_world(t):
        return np.array([0.9 * np.sin(2.3 * t), 0.7 * np.cos(1.9 * t) + 0.1,
                         0.4 * np.sin(1.3 * t + 0.5)])

    def w_body(t):
        # Substantial attitude change: with near-constant attitude a
        # gravity-direction tilt cancels a scale error through the g*dt
        # velocity terms (the classic weak-observability mode of VI init);
        # rotation breaks the degeneracy.
        return np.array([1.1 * np.sin(1.6 * t) + 0.3,
                         0.9 * np.cos(1.2 * t),
                         0.7 * np.sin(0.9 * t) - 0.2])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.15, -0.1, 0.05])
    out_states = [(R.copy(), p.copy(), v.copy())]
    accs, gyrs = [], []
    for k in range(n_steps):
        t = k * dt
        aw = a_world(t)
        wb = w_body(t)
        # White noise scaled by 1/sqrt(dt) (continuous-time density).
        na = nrng.normal(0, 2.0e-3 / np.sqrt(dt), 3) if noise else 0.0
        nw = nrng.normal(0, 1.6968e-4 / np.sqrt(dt), 3) if noise else 0.0
        accs.append(R.T @ (aw - g) + na)
        gyrs.append(wb + nw)
        p = p + v * dt + 0.5 * aw * dt ** 2
        v = v + aw * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(wb * dt)))
        out_states.append((R.copy(), p.copy(), v.copy()))
    return np.array(accs, np.float32), np.array(gyrs, np.float32), out_states


def metric_to_dso(R_wb, p_wb, s, g2):
    """Invert dso_to_body for cam==body (R_cb = I, t_cb = 0)."""
    R_g = np.asarray(lie.so3_exp(jnp.asarray([g2[0], g2[1], 0.0])))
    R_wc_m, t_wc_m = R_wb, p_wb
    R_wc_d = R_g @ R_wc_m
    t_wc_d = s * (R_g @ t_wc_m)
    R_cw_d, t_cw_d = lie.se3_inv(jnp.asarray(R_wc_d, jnp.float32),
                                 jnp.asarray(t_wc_d, jnp.float32))
    return R_cw_d, t_cw_d


@pytest.fixture(scope="module")
def vio_problem():
    rng = np.random.default_rng(0)
    dt = 1.0 / IMU_HZ
    steps_per_kf = int(KF_DT * IMU_HZ)
    n_steps = steps_per_kf * (F - 1)
    accs, gyrs, states = simulate_metric(n_steps, dt)

    calib = Calib.create(100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)

    # Keyframe states (metric) and DSO-world camera poses.
    kf_idx = [k * steps_per_kf for k in range(F)]
    R_dso, t_dso, v_gt, p_gt, R_gt_body = [], [], [], [], []
    for k in kf_idx:
        Rb, pb, vb = states[k]
        Rc, tc = metric_to_dso(Rb, pb, S_GT, G2_GT)
        R_dso.append(Rc)
        t_dso.append(tc)
        v_gt.append(vb)
        p_gt.append(pb)
        R_gt_body.append(Rb)
    R_dso = jnp.stack(R_dso)
    t_dso = jnp.stack(t_dso)

    images = jnp.stack([
        pyramid.build_pyramid(
            synthetic.render(scene, R_dso[f], t_dso[f], calib, H, W),
            levels=1)[0]
        for f in range(F)
    ])

    # Points hosted in frames 0/1 with exact DSO-world idepths.
    P = 192
    hosts = jnp.asarray(np.tile([0, 1], P // 2), jnp.int32)
    u = jnp.asarray(rng.uniform(8, W - 8, P), jnp.float32)
    v = jnp.asarray(rng.uniform(8, H - 8, P), jnp.float32)
    id_gt = jax.vmap(lambda f, uu, vv: synthetic.gt_idepth(
        scene, R_dso[f], t_dso[f], calib, uu, vv))(hosts, u, v)
    pat = jnp.asarray(PATTERN)
    color = jax.vmap(lambda f, uu, vv: interp.bilinear(
        images[f][0], uu + pat[:, 0], vv + pat[:, 1]))(hosts, u, v)

    # Perturb poses (not frame 0), idepths, velocities; offset scale+gravity.
    Rs, ts = [R_dso[0]], [t_dso[0]]
    for f in range(1, F):
        xi = jnp.asarray(np.concatenate([
            rng.normal(0, 0.01, 3), rng.normal(0, 0.005, 3)]), jnp.float32)
        R2, t2 = lie.se3_retract(R_dso[f], t_dso[f], xi)
        Rs.append(R2)
        ts.append(t2)
    idep = id_gt * jnp.asarray(1.0 + rng.normal(0, 0.03, P), jnp.float32)

    frames = BAFrames(
        R_cw=jnp.stack(Rs), t_cw=jnp.stack(ts), aff=jnp.zeros((F, 2)),
        R0_cw=jnp.stack(Rs), t0_cw=jnp.stack(ts), aff0=jnp.zeros((F, 2)),
        mask=jnp.ones(F, bool))
    points = BAPoints(
        host=hosts, u=u, v=v, idepth=idep, idepth_zero=idep,
        color=color, weight=jnp.ones((P, 8), jnp.float32),
        mask=jnp.ones(P, bool))

    Cv = ba_solve.cdim(F)
    C = vio_ba.cdim_ext(F)
    prior = np.zeros(C, np.float32)
    prior[:4] = 1e8 * vio_ba.W_DSO
    prior[4:12] = 1e8 * vio_ba.W_DSO          # frame-0 gauge
    for f in range(1, F):
        prior[4 + 8 * f + 6] = 1e6 * vio_ba.W_DSO
        prior[4 + 8 * f + 7] = 1e4 * vio_ba.W_DSO
    for f in range(F):
        # Tight bias priors: the simulated IMU is bias-free, and over a
        # 0.9 s window accel bias and scale are barely separable (that
        # separation is the IMU initializer's long-window job). This test
        # isolates scale/gravity observability.
        off = vio_ba.imu_offset(F, f)
        prior[off + 3:off + 9] = 1e6
    # NO scale prior; weak gravity prior.
    prior[Cv + 9 * F + 1:] = 1.0

    base = ba_mod.BAProblem(
        frames=frames, points=points, calib=calib, calib0=calib.as_vec(),
        HM=jnp.zeros((Cv, Cv)), bM0=jnp.zeros(Cv),
        prior_diag=jnp.zeros(Cv),
        pair_mask=hosts[None, :] != jnp.arange(F)[:, None])

    # Preintegrate each inter-KF chunk (zero bias, exact measurements).
    pres, iis, jjs = [], [], []
    for q in range(F - 1):
        s0, s1 = kf_idx[q], kf_idx[q + 1]
        pres.append(preint.preintegrate_jit(
            jnp.asarray(accs[s0:s1]), jnp.asarray(gyrs[s0:s1]),
            jnp.full(s1 - s0, dt, jnp.float32), jnp.zeros(6)))
        iis.append(q)
        jjs.append(q + 1)
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    pairs = vio_ba.IMUPairs(
        pre=pre_b, i=jnp.asarray(iis, jnp.int32), j=jnp.asarray(jjs, jnp.int32),
        valid=jnp.ones(F - 1, bool))

    v_init = jnp.asarray(np.stack(v_gt) + rng.normal(0, 0.05, (F, 3)),
                         jnp.float32)
    states0 = vio_ba.empty_vio_states(F)._replace(
        v=v_init, v0=v_init,
        s_log=jnp.asarray(np.log(S_GT) + 0.15, jnp.float32),
        s_log0=jnp.asarray(np.log(S_GT) + 0.15, jnp.float32),
        g2=jnp.asarray(G2_GT + np.array([-0.03, 0.02]), jnp.float32),
        g20=jnp.asarray(G2_GT + np.array([-0.03, 0.02]), jnp.float32))

    problem = vio_ba.VIOProblem(
        base=base, states=states0, pairs=pairs,
        HM=jnp.zeros((C, C)), bM0=jnp.zeros(C),
        prior_diag=jnp.asarray(prior),
        R_cb=jnp.eye(3), t_cb=jnp.zeros(3),
        imu_on=jnp.asarray(True))
    return problem, images, np.stack(v_gt), np.stack(p_gt), R_gt_body


def test_vio_recovers_metric_scale_and_gravity(vio_problem):
    """Gauge-invariant metric recovery.

    The DSO window scale is itself a gauge (frame 0 sits at t = 0, so its
    prior pins no scale); the optimizer may co-scale (window, s) freely —
    exactly as in the reference, where only the METRIC quantities matter.
    So check metric observables: inter-keyframe distances in meters,
    velocity magnitudes, and gravity direction expressed in the body frame.
    """
    problem, images, v_gt, p_gt, R_gt_body = vio_problem
    res = vio_ba.optimize_jit(problem, images, max_iters=20)

    # Metric body positions from the estimated window + scale + gravity.
    p_est = []
    R_est = []
    for f in range(F):
        Rb, pb = vio_ba.dso_to_body(
            res.frames.R_cw[f], res.frames.t_cw[f],
            res.states.s_log, res.states.g2, jnp.eye(3), jnp.zeros(3))
        p_est.append(np.asarray(pb))
        R_est.append(np.asarray(Rb))
    p_est = np.stack(p_est)

    # 1) Inter-KF metric distances (fully gauge-invariant). ~3% on the
    # shortest (6 cm) pair is photometric-noise-limited for a 4-KF/0.9 s
    # window; the full-length initializer (PGBA over ~100 poses) is what
    # tightens this in the complete system.
    for a in range(F):
        for b in range(a + 1, F):
            d_est = np.linalg.norm(p_est[a] - p_est[b])
            d_gt = np.linalg.norm(p_gt[a] - p_gt[b])
            assert abs(d_est - d_gt) / d_gt < 0.04, (a, b, d_est, d_gt)

    # 2) Velocity magnitudes (rotation-gauge invariant).
    v_mag_err = np.abs(np.linalg.norm(np.asarray(res.states.v), axis=1)
                       - np.linalg.norm(v_gt, axis=1))
    assert v_mag_err.max() < 0.03, v_mag_err

    # 3) Gravity direction in the BODY frame (gauge-invariant): the body
    # attitude must make R_wb^T * (-z) match ground truth.
    for f in range(F):
        g_body_est = R_est[f].T @ np.array([0.0, 0.0, -1.0])
        g_body_gt = R_gt_body[f].T @ np.array([0.0, 0.0, -1.0])
        ang = np.degrees(np.arccos(np.clip(g_body_est @ g_body_gt, -1, 1)))
        assert ang < 1.0, (f, ang)

    # 4) IMU residual energy ~ chi^2 at convergence (45 weighted dims).
    assert float(res.imu_energy) < 200.0, float(res.imu_energy)


def test_vio_off_behaves_like_visual(vio_problem):
    problem, images, v_gt, p_gt, R_gt_body = vio_problem
    problem_off = problem._replace(imu_on=jnp.asarray(False))
    res = vio_ba.optimize_jit(problem_off, images, max_iters=8)
    # Scale/gravity/velocity untouched when IMU is off.
    np.testing.assert_allclose(float(res.states.s_log),
                               float(problem.states.s_log), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.states.v),
                               np.asarray(problem.states.v), atol=1e-6)
    assert float(res.energy) < 2000.0


def test_dynamic_dso_weight(vio_problem):
    """Threshold robust weighting of the whole photometric factor
    (computeDynamicDSOWeight, BAIMULogic.cpp:801-808): clean images sit
    below the 8-intensity RMSE threshold (weight 1); corrupted images
    must be down-weighted by (8/rmse)^2."""
    problem, images, v_gt, p_gt, R_gt_body = vio_problem
    res = vio_ba.optimize_jit(problem, images, max_iters=2)
    assert float(res.dyn_weight) == 1.0, float(res.vis_rmse)

    rng = np.random.default_rng(0)
    bad = images + jnp.asarray(
        rng.normal(0, 40.0, np.shape(images)), jnp.float32)
    res_bad = vio_ba.optimize_jit(problem, bad, max_iters=2)
    rmse = float(res_bad.vis_rmse)
    assert rmse > vio_ba.DYN_RMSE_TH, rmse
    np.testing.assert_allclose(float(res_bad.dyn_weight),
                               (vio_ba.DYN_RMSE_TH / rmse) ** 2, rtol=1e-5)
