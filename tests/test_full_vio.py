"""End-to-end visual-INERTIAL odometry on the synthetic VIO sequence.

The full stack in play: visual init -> coarse IMU init (scale/gravity from
the 100-pose window) -> ACTIVE VIO (joint BA + IMU-aided tracking +
extended marginalization). Scored METRICALLY: with the IMU the absolute
scale is observable, so the trajectory must match ground truth under
SE(3)-only alignment (no scale correction) — the capability that defines
DM-VIO vs DSO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvio_tpu.models import full_system, imu_system, window
from dmvio_tpu.utils import lie, synthetic, trajectory

H, W = 192, 256
N_FRAMES = 48


@pytest.fixture(scope="module")
def vio_run():
    seq = synthetic.generate_vio_sequence(
        n_frames=N_FRAMES, frame_dt=0.05, h=H, w=W,
        s_dso=1.4, g2=(0.06, -0.04), accel_scale=0.8, rot_scale=0.45,
        seed=3,
        # This fixture's aggressive motion (speeds to ~1.5 m/s) is tuned
        # for the far plane scene; the room scene's near floor makes the
        # optical flow exceed what the tracker survives at 192x256.
        scene=synthetic.default_scene(depth=2.0))
    cfg = window.Config(f_max=6, p_max=512, i_max=512, max_frames=4,
                        levels=4, ba_iters=6)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())

    # Subscribe the inertial estimate streams (scalesdso.txt etc.).
    import tempfile
    from dmvio_tpu.io.output_wrapper import StateStreamWriter
    stream_dir = tempfile.mkdtemp(prefix="vio_streams_")
    fs.output_wrappers.append(StateStreamWriter(stream_dir + "/"))
    fs._stream_dir = stream_dir
    spf = seq["steps_per_frame"]
    for i in range(N_FRAMES):
        if i == 0:
            chunk = None
        else:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
    return fs, seq


def test_vio_activates(vio_run):
    fs, seq = vio_run
    assert fs.initialized
    assert fs.imu.phase == imu_system.ACTIVE, fs.imu.phase
    # At the reference's operating point lost frames are an abort
    # condition (FullSystem.cpp:1032-1035); this run tracks every frame
    # (measured 0 lost) — allow at most a couple of transient losses.
    assert fs.stats_lost_frames <= 2, fs.stats_lost_frames


def test_vio_metric_scale(vio_run):
    """The estimated metric scale factor matches the generator's s_dso
    (up to the visual window's internal scale drift)."""
    fs, seq = vio_run
    st = jax.device_get(fs.imu.states)
    s_est = float(np.exp(st.s_log))
    # The window is normalized to median idepth 1 at depth ~2m while the
    # generator's dso world uses s_dso directly; compare metrically below
    # instead — here just require a sane, converged scale.
    assert np.isfinite(s_est) and 0.05 < s_est < 20.0


def test_vio_metric_trajectory(vio_run):
    fs, seq = vio_run
    est = fs.metric_trajectory()
    assert est is not None
    gt = []
    for i in range(N_FRAMES):
        Rb = seq["R_body"][i]
        gt.append((float(seq["timestamps"][i]), np.asarray(Rb),
                   seq["p_gt"][i]))
    # Drop the pre-initialization prefix (poses there come from the
    # visual initializer's rough tracking).
    first_kf = min(fs.kf_poses.keys())
    est_tail = [e for e, sh in zip(est, fs.shells)
                if sh.frame_id >= first_kf + 5]
    gt_tail = [g for g, sh in zip(gt, fs.shells)
               if sh.frame_id >= first_kf + 5]
    ate_se3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=False)
    ate_sim3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=True)
    dist = np.sum(np.linalg.norm(np.diff(
        np.stack([g[2] for g in gt_tail]), axis=0), axis=1))
    # Measured accuracy on this aggressive synthetic (fast rotation,
    # speeds to ~1.5 m/s, 192x256) after the round-3 scale work
    # (init-marginal-seeded adoption ratchet + the activation prior in the
    # delayed log's base event): sim3 0.83%, se3 3.29% of path. Gates at
    # ~2x those margins so regressions of the scale chain fail loudly.
    assert ate_sim3 < 0.04 * dist + 0.01, (ate_sim3, dist)
    assert ate_se3 < 0.08 * dist + 0.01, (ate_se3, dist)


def test_vio_state_streams(vio_run):
    """The per-keyframe inertial streams exist under the reference's file
    names, cover the VIO keyframes, and carry a sane metric scale
    (BAIMULogic.cpp:88-91 parity)."""
    import os

    fs, seq = vio_run
    d = fs._stream_dir
    scales = np.loadtxt(os.path.join(d, "scalesdso.txt"), ndmin=2)
    biases = np.loadtxt(os.path.join(d, "babiasdso.txt"), ndmin=2)
    vels = np.loadtxt(os.path.join(d, "bavel.txt"), ndmin=2)
    grav = np.loadtxt(os.path.join(d, "bagravdir.txt"), ndmin=2)
    assert len(scales) >= 3 and len(scales) == len(biases) == len(vels)
    assert biases.shape[1] == 7 and vels.shape[1] == 4
    # Gravity directions are unit vectors.
    assert np.allclose(np.linalg.norm(grav[:, 1:], axis=1), 1.0, atol=1e-5)
    # The stream's final scale is the live estimate (the DSO world is
    # median-idepth normalized, so it is NOT directly s_dso — the metric
    # trajectory test scores absolute accuracy; here check consistency).
    s_final = float(np.exp(jax.device_get(fs.imu.states.s_log)))
    assert np.all(scales[:, 1] > 0) and np.all(np.isfinite(scales[:, 1]))
    # Published scales live in the same regime as the final estimate (the
    # scale keeps refining after the last keyframe publish).
    assert 0.2 < scales[-1, 1] / s_final < 5.0


def test_vio_realtime_pipeline(vio_run):
    """Realtime (pipelined) VIO: the same sequence through the software
    pipeline — dispatch-time IMU preview prior through the in-flight
    chunks, DISPATCH-TIME keyframe decisions (round 5: the keyframe's
    device half runs in the dispatch stream from the deciding frame's own
    device arrays), consume-time filter advance + fusion (the reference
    runs the full inertial stack through its two-thread pipeline,
    FullSystem.cpp:1124-1320 + IMUIntegration.cpp:228-330). async_fetch
    is disabled so the run is bit-deterministic: with the thread pool the
    dispatch-decision anchor depends on when copies land, which moves the
    chaotic ATE between basins run to run (the TPU-side stretch behavior
    has its own dedicated stall-injection test)."""
    _, seq = vio_run
    cfg = window.Config(f_max=6, p_max=512, i_max=512, max_frames=4,
                        levels=4, ba_iters=6, realtime=True,
                        async_fetch=False,
                        # Dense cadence for the 48-frame window: at the
                        # RMS-flow dispatch score the default density's
                        # crossing leaves too few keyframes for the IMU
                        # init to gate within this short fixture.
                        rt_kf_density=3.0)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
    spf = seq["steps_per_frame"]
    for i in range(N_FRAMES):
        chunk = None
        if i > 0:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
    fs.finish()
    assert fs.initialized
    assert fs.imu.phase == imu_system.ACTIVE, fs.imu.phase
    # Measured 0 lost frames (round 3); at the reference's operating point
    # lost frames are an abort condition (FullSystem.cpp:1032-1035).
    assert fs.stats_lost_frames <= 2, fs.stats_lost_frames
    est = fs.metric_trajectory()
    assert est is not None
    gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
           seq["p_gt"][i]) for i in range(N_FRAMES)]
    first_kf = min(fs.kf_poses.keys())
    est_tail = [e for e, sh in zip(est, fs.shells)
                if sh.frame_id >= first_kf + 5]
    gt_tail = [g for g, sh in zip(gt, fs.shells)
               if sh.frame_id >= first_kf + 5]
    ate_sim3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=True)
    ate_se3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=False)
    dist = np.sum(np.linalg.norm(np.diff(
        np.stack([g[2] for g in gt_tail]), axis=0), axis=1))
    # Measured (round 5, dispatch-time KF decisions + RMS-flow score,
    # deterministic fetch): sim3 1.8-2.3% / se3 9.0-9.2% of path on
    # seeds 3/5/7 — a different chaotic basin than round 3's
    # consume-time pipeline (0.62%/1.49%); the same fixture measures
    # se3 12.5% in batch mode (docs/ACCURACY.md: the 48-frame metric
    # basins are init-moment chaos — the residual scale bias is the
    # fixture's observability limit, not a pipeline regression). Gated
    # ~1.3-1.5x over measured.
    assert ate_sim3 < 0.035 * dist + 0.01, (ate_sim3, dist)
    assert ate_se3 < 0.12 * dist + 0.01, (ate_se3, dist)


def test_vio_rotated_rig_metric():
    """Full-system VIO on a 90-degree-rotated camera-IMU rig: the whole
    inertial stack (coarse filter, init window, window BA, delayed log,
    PGBA) must run through the real T_cam_imu and still deliver a metric
    trajectory (TransformDSOToIMU parity, PoseTransformationIMU.h:45-133).
    Round 1's delayed log / PGBA hard-coded identity extrinsics and would
    corrupt the prior on such a rig."""
    from dmvio_tpu.models.vio_coarse import _exp_so3

    R_cb = _exp_so3(np.array([np.pi / 2, 0.0, 0.0])).astype(np.float32)
    t_cb = np.array([0.06, -0.03, 0.04], np.float32)
    n = 48
    seq = synthetic.generate_vio_sequence(
        n_frames=n, frame_dt=0.05, h=H, w=W,
        s_dso=1.4, g2=(0.06, -0.04), accel_scale=0.8, rot_scale=0.45,
        seed=3, scene=synthetic.default_scene(depth=2.0),
        R_cb=R_cb, t_cb=t_cb)
    cfg = window.Config(f_max=6, p_max=512, i_max=512, max_frames=4,
                        levels=4, ba_iters=6)
    fs = full_system.FullSystem(
        seq["calib"], H, W, cfg,
        imu_calib=imu_system.IMUCalib(R_cb=R_cb, t_cb=t_cb))
    spf = seq["steps_per_frame"]
    for i in range(n):
        chunk = None
        if i > 0:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
    assert fs.initialized
    assert fs.imu.phase == imu_system.ACTIVE, fs.imu.phase
    est = fs.metric_trajectory()
    assert est is not None
    gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
           seq["p_gt"][i]) for i in range(n)]
    first_kf = min(fs.kf_poses.keys())
    est_tail = [e for e, sh in zip(est, fs.shells)
                if sh.frame_id >= first_kf + 5]
    gt_tail = [g for g, sh in zip(gt, fs.shells)
               if sh.frame_id >= first_kf + 5]
    ate_sim3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=True)
    ate_se3 = trajectory.ate_rmse(est_tail, gt_tail, with_scale=False)
    dist = np.sum(np.linalg.norm(np.diff(
        np.stack([g[2] for g in gt_tail]), axis=0), axis=1))
    # Measured 1.12% of path sim3 / 8.55% se3 (round 3); sim3 gated ~4x
    # over, se3 ~1.7x (the rotated rig's lever arm amplifies scale error).
    assert ate_sim3 < 0.04 * dist + 0.01, (ate_sim3, dist)
    assert ate_se3 < 0.15 * dist + 0.01, (ate_se3, dist)
