"""Distributed BA inside the REAL pipeline (Config.mesh_devices).

A full synthetic VIO sequence runs through FullSystem twice — single
device and with the point-axis programs (extended visual-inertial BA,
fused marginalization tail, extended point marginalization) sharded over
the 8 virtual CPU devices (conftest.py) — and the results must agree.
This is the production path the driver's dryrun exercises (SURVEY §7 S6:
the sharded BA inside the pipeline, not a standalone demo).
"""

import numpy as np
import pytest

from dmvio_tpu.models import full_system, imu_system, window
from dmvio_tpu.utils import synthetic, trajectory

H, W = 128, 160
N_FRAMES = 48


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate_vio_sequence(
        n_frames=N_FRAMES, frame_dt=0.05, h=H, w=W,
        s_dso=1.4, g2=(0.06, -0.04), accel_scale=0.8, rot_scale=0.45,
        seed=3, scene=synthetic.default_scene(depth=2.0))


def _run(seq, mesh_devices):
    cfg = window.Config(f_max=6, p_max=256, i_max=256, max_frames=4,
                        levels=4, ba_iters=4, mesh_devices=mesh_devices)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
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
    fs.finish()
    return fs


@pytest.fixture(scope="module")
def runs(seq):
    return _run(seq, 0), _run(seq, 8)


def test_mesh_pipeline_activates(runs):
    _, fs_mesh = runs
    assert fs_mesh.initialized
    assert fs_mesh.imu.phase == imu_system.ACTIVE, fs_mesh.imu.phase
    assert fs_mesh.stats_lost_frames == 0


def test_sharded_programs_match_on_real_state(runs):
    """The production programs — the EXTENDED visual-inertial BA and the
    fused marginalization tail — run sharded on the final window state of
    a real pipeline run and must numerically match the single-device
    dispatch of the same program on the same state.

    (Full-trajectory bitwise equality is NOT a meaningful target: the
    per-device partial Hessians meet in a psum whose reduction order
    differs from the single-device contraction, and the pipeline's init
    accept-gates are documented-chaotic under 1e-6-level perturbations —
    see test_mesh_accuracy_vs_gt for the sequence-level gate.)"""
    import jax.numpy as jnp

    from dmvio_tpu.models import ba, vio_ba
    from dmvio_tpu.ops import ba_solve
    from dmvio_tpu.parallel import dist_ba

    fs, _ = runs
    w, imu = fs.win, fs.imu
    assert imu.phase == imu_system.ACTIVE
    base = ba.BAProblem(
        frames=w.frames, points=w.points, calib=w.calib,
        calib0=w.calib0, HM=jnp.asarray(w.HM, jnp.float32),
        bM0=jnp.asarray(w.bM0, jnp.float32),
        prior_diag=jnp.asarray(w.prior_diag), pair_mask=w.pair_mask)
    Cv = ba_solve.cdim(fs.cfg.f_max)
    ext_prior = jnp.asarray(np.concatenate([
        np.asarray(w.prior_diag) * vio_ba.W_DSO,
        np.asarray(imu.prior_diag)[Cv:]]))
    problem = vio_ba.VIOProblem(
        base=base, states=imu.states, pairs=imu.device_pairs(),
        HM=jnp.asarray(imu.HM, jnp.float32),
        bM0=jnp.asarray(imu.bM0, jnp.float32), prior_diag=ext_prior,
        R_cb=imu.R_cb, t_cb=imu.t_cb, imu_on=jnp.asarray(True))

    res_1 = vio_ba.optimize_jit(problem, w.images, max_iters=4)
    placer = dist_ba.Placer(dist_ba.make_mesh(8))
    res_m = placer.gather(vio_ba.optimize_jit(
        placer.place_vio(problem), placer.place_images(w.images),
        max_iters=4))
    np.testing.assert_allclose(float(res_m.energy), float(res_1.energy),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(res_m.frames.t_cw),
                               np.asarray(res_1.frames.t_cw), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_m.states.s_log),
                               np.asarray(res_1.states.s_log), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_m.points.idepth),
                               np.asarray(res_1.points.idepth),
                               rtol=5e-3, atol=1e-4)

    # Fused marginalization tail on the same state.
    F = fs.cfg.f_max
    age = np.full(F, -1, np.int32)
    for r_, s_ in enumerate(w.slots_by_age()):
        age[s_] = r_
    args_1 = (problem.base, w.images, jnp.asarray(age),
              jnp.asarray(1, jnp.int32), w.newest_slot())
    m_1 = ba.marg_fused_jit(*args_1)
    m_m = placer.gather(ba.marg_fused_jit(
        placer.place_ba(problem.base), placer.place_images(w.images),
        jnp.asarray(age), jnp.asarray(1, jnp.int32), w.newest_slot()))
    np.testing.assert_array_equal(np.asarray(m_m[0]), np.asarray(m_1[0]))
    np.testing.assert_allclose(np.asarray(m_m[1]), np.asarray(m_1[1]),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(m_m[3].mask),
                                  np.asarray(m_1[3].mask))


def test_mesh_accuracy_vs_gt(runs, seq):
    """The mesh run on its own merits: metric trajectory against GT."""
    _, fs_m = runs
    est = fs_m.metric_trajectory()
    gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
           seq["p_gt"][i]) for i in range(N_FRAMES)]
    first_kf = min(fs_m.kf_poses.keys())
    est_t = [e for e, sh in zip(est, fs_m.shells)
             if sh.frame_id >= first_kf + 5]
    gt_t = [g for g, sh in zip(gt, fs_m.shells)
            if sh.frame_id >= first_kf + 5]
    ate = trajectory.ate_rmse(est_t, gt_t, with_scale=True)
    dist = np.sum(np.linalg.norm(np.diff(
        np.stack([g[2] for g in gt_t]), axis=0), axis=1))
    assert ate < 0.06 * dist + 0.01, (ate, dist)
