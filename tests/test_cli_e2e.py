"""Golden end-to-end test through the dataset CLI.

Exercises the full user-facing path the reference's dmvio_dataset main
provides (main_dmvio_dataset.cpp): folder dataset -> undistortion ->
odometry -> result.txt/resultKFs.txt/timings.txt/usedSettings.txt, and
scores the trajectory against the generator's ground truth. Everything
in-process on CPU (tests/conftest.py forces the backend)."""

import os
import tempfile

import numpy as np
import pytest

from dmvio_tpu import run_dataset
from dmvio_tpu.tools import make_synthetic
from dmvio_tpu.utils import trajectory

N_FRAMES = 36


@pytest.fixture(scope="module")
def cli_run():
    data = tempfile.mkdtemp(prefix="cli_e2e_data_")
    out = tempfile.mkdtemp(prefix="cli_e2e_out_") + "/"
    make_synthetic.main([f"out={data}", f"n={N_FRAMES}", "w=256", "h=192",
                         "accel=0.4", "rot=0.2"])
    run_dataset.run([
        f"files={data}/images", f"calib={data}/camera.txt",
        f"tsFile={data}/times.txt", f"resultsPrefix={out}",
        "quiet=1", "nativeLoader=0", "p_max=1024", "i_max=1024",
    ])
    return data, out


def test_cli_outputs_exist(cli_run):
    _, out = cli_run
    for f in ("result.txt", "resultKFs.txt", "timings.txt",
              "usedSettings.txt"):
        assert os.path.getsize(out + f) > 0, f


def test_cli_trajectory_accuracy(cli_run):
    data, out = cli_run
    est = trajectory.read_tum(out + "result.txt")
    gt = trajectory.read_tum(os.path.join(data, "gt.csv"))
    assert len(est) == N_FRAMES
    n = min(len(est), len(gt))
    ate = trajectory.ate_rmse(est[:n], gt[:n])
    # Path length for a relative bound.
    Q = np.stack([g[2] for g in gt[:n]])
    dist = float(np.sum(np.linalg.norm(np.diff(Q, axis=0), axis=1)))
    # Measured ~2% of path on the default synthetic (round 3); gate at 2x.
    assert ate < 0.04 * dist + 0.01, (ate, dist)


def test_cli_kf_trajectory_subset(cli_run):
    _, out = cli_run
    est = trajectory.read_tum(out + "result.txt")
    kfs = trajectory.read_tum(out + "resultKFs.txt")
    ts_all = {round(e[0], 6) for e in est}
    assert 3 <= len(kfs) < len(est)
    assert all(round(k[0], 6) in ts_all for k in kfs)


def _ate_of_run(data, out):
    est = trajectory.read_tum(out + "result.txt")
    gt = trajectory.read_tum(os.path.join(data, "gt.csv"))
    n = min(len(est), len(gt))
    ate = trajectory.ate_rmse(est[:n], gt[:n])
    Q = np.stack([g[2] for g in gt[:n]])
    dist = float(np.sum(np.linalg.norm(np.diff(Q, axis=0), axis=1)))
    return ate, dist


def test_cli_exposure_invariance(cli_run):
    """Auto-exposure robustness: the same sequence with a +-30% shutter
    sweep (values in times.txt, images scaled accordingly) must track as
    well as the constant-exposure run — the exposure-relative brightness
    model (AffLight::fromToVecExposure, NumType.h:174; exposure seeds the
    log-gain, the estimator absorbs only the residual)."""
    data_c, out_c = cli_run
    data = tempfile.mkdtemp(prefix="cli_e2e_exp_data_")
    out = tempfile.mkdtemp(prefix="cli_e2e_exp_out_") + "/"
    make_synthetic.main([f"out={data}", f"n={N_FRAMES}", "w=256", "h=192",
                         "accel=0.4", "rot=0.2", "exposure_var=0.3"])
    run_dataset.run([
        f"files={data}/images", f"calib={data}/camera.txt",
        f"tsFile={data}/times.txt", f"resultsPrefix={out}",
        "quiet=1", "nativeLoader=0", "p_max=1024", "i_max=1024",
    ])
    ate_e, dist_e = _ate_of_run(data, out)
    ate_c, dist_c = _ate_of_run(data_c, out_c)
    # Same accuracy gate as the constant-exposure test, plus a relative
    # bound against the constant-exposure run itself.
    assert ate_e < 0.08 * dist_e + 0.02, (ate_e, dist_e)
    assert ate_e < 2.5 * ate_c + 0.01, (ate_e, ate_c)


@pytest.mark.parametrize("native", [0, 1])
def test_cli_photometric_calibration(cli_run, native):
    """Photometric-calibration end-to-end: a sequence with a baked gamma
    response + lens vignette (reference raw model I = G(t*V*B),
    src/dso/util/Undistort.h:51 PhotometricUndistorter) runs through
    gammaCalib=/vignette= and must match the clean run's accuracy — on
    BOTH loader paths (host io/dataset.py and native/dataloader.cpp,
    which applies the same LUT + vignette division)."""
    data_c, out_c = cli_run
    data = tempfile.mkdtemp(prefix=f"cli_e2e_pc{native}_data_")
    out = tempfile.mkdtemp(prefix=f"cli_e2e_pc{native}_out_") + "/"
    make_synthetic.main([f"out={data}", f"n={N_FRAMES}", "w=256", "h=192",
                         "accel=0.4", "rot=0.2", "photometric=1"])
    run_dataset.run([
        f"files={data}/images", f"calib={data}/camera.txt",
        f"tsFile={data}/times.txt", f"resultsPrefix={out}",
        f"gammaCalib={data}/pcalib.txt", f"vignette={data}/vignette.png",
        "quiet=1", f"nativeLoader={native}", "p_max=1024", "i_max=1024",
    ])
    ate_p, dist_p = _ate_of_run(data, out)
    ate_c, dist_c = _ate_of_run(data_c, out_c)
    assert ate_p < 0.08 * dist_p + 0.02, (ate_p, dist_p)
    assert ate_p < 2.5 * ate_c + 0.01, (ate_p, ate_c)


def test_cli_vio_realtime_second_seed():
    """Second-seed VIO discipline (CLAUDE.md: gate accuracy-relevant
    behavior on >=2 seeds): the full inertial system through the CLI in
    REALTIME pipelined mode (preset=1) on a seed none of the fixtures use,
    at the generator's default shape. Covers the async PGBA snapshot path
    (imu_system.maybe_run_pgba submit_fn=) end to end. Measured 1.7% of
    path sim3 / 5.7% se3-metric on this seed (round 3); gated at ~2x."""
    data = tempfile.mkdtemp(prefix="cli_e2e_s7_data_")
    out = tempfile.mkdtemp(prefix="cli_e2e_s7_out_") + "/"
    make_synthetic.main([f"out={data}", "seed=7"])
    run_dataset.run([
        f"files={data}/images", f"calib={data}/camera.txt",
        f"tsFile={data}/times.txt", f"imuFile={data}/imu.txt",
        "useimu=1", "preset=1", f"resultsPrefix={out}", "quiet=1",
        # Deterministic fetch: with the thread pool, the dispatch-time KF
        # decision anchor depends on copy-landing times and the chaotic
        # ATE moves between basins run to run (see
        # test_vio_realtime_pipeline).
        "async_fetch=0",
    ])
    gt = trajectory.read_tum(os.path.join(data, "gt.csv"))
    Q = np.stack([g[2] for g in gt])
    dist = float(np.sum(np.linalg.norm(np.diff(Q, axis=0), axis=1)))
    est = trajectory.read_tum(out + "result.txt")
    n = min(len(est), len(gt))
    ate_sim3 = trajectory.ate_rmse(est[:n], gt[:n])
    est_s = trajectory.read_tum(out + "resultScaled.txt")
    ns = min(len(est_s), len(gt))
    ate_se3 = trajectory.ate_rmse(est_s[:ns], gt[:ns], with_scale=False)
    assert ate_sim3 < 0.04 * dist + 0.01, (ate_sim3, dist)
    assert ate_se3 < 0.10 * dist + 0.01, (ate_se3, dist)
