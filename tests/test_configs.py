"""Config-layer parity: dataset YAMLs, noise-model plumbing, transition
models (reference configs/*.yaml + IMUSettings/IMUInitSettings knobs)."""

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reference_named_settings_apply(tmp_path):
    from dmvio_tpu.utils.settings import SettingsUtil

    su = SettingsUtil()
    su.register("accelerometer_noise_density", 2.0e-3)
    su.register("init_transitionModel", 2)
    yaml_path = tmp_path / "s.yaml"
    yaml_path.write_text(
        "accelerometer_noise_density: 0.1\n"
        "init_transitionModel: 5\n"
        "unknown_key_is_ignored: 1\n")
    su.try_read_yaml(str(yaml_path))
    assert su["accelerometer_noise_density"] == 0.1
    assert su["init_transitionModel"] == 5
    # Command line wins over yaml.
    su.parse_arg("init_transitionModel=4")
    su.try_read_yaml(str(yaml_path))
    assert su["init_transitionModel"] == 4


def test_shipped_configs_parse():
    import yaml

    cfg_dir = os.path.join(REPO, "configs")
    names = ["tumvi.yaml", "euroc.yaml", "4seasons.yaml",
             "t265_noise_tumvi.yaml", "ablations/noPGBA.yaml",
             "ablations/noMargReplacement.yaml",
             "ablations/noInitialReplacement.yaml"]
    for n in names:
        with open(os.path.join(cfg_dir, n)) as f:
            data = yaml.safe_load(f)
        assert data["accelerometer_noise_density"] > 0
    with open(os.path.join(cfg_dir, "ablations/noPGBA.yaml")) as f:
        assert yaml.safe_load(f)["init_transitionModel"] == 5


def test_noise_model_flows_from_calib():
    from dmvio_tpu.models.imu_system import IMUCalib, IMUSystem
    from dmvio_tpu.ops import preint

    old = (preint.NOISE.sigma_gyro, preint.NOISE.sigma_acc,
           preint.NOISE.sigma_gyro_walk, preint.NOISE.sigma_acc_walk,
           preint.NOISE.sigma_integration)
    try:
        IMUSystem(IMUCalib(sigma_gyro=1e-3, sigma_acc=5e-3), f_max=4)
        assert preint.NOISE.sigma_gyro == 1e-3
        assert preint.NOISE.sigma_acc == 5e-3
        # Covariance scales with the density (continuous-time model).
        acc = np.tile(np.array([0.0, 0.0, 9.8082]), (5, 1))
        gyr = np.zeros((5, 3))
        dts = np.full(5, 0.005)
        pre_a = preint.preintegrate_np(acc, gyr, dts, np.zeros(6))
        preint.set_noise(sigma_acc=10e-3)
        pre_b = preint.preintegrate_np(acc, gyr, dts, np.zeros(6))
        ratio = pre_b["cov"][3, 3] / max(pre_a["cov"][3, 3], 1e-30)
        assert abs(ratio - 4.0) < 0.1   # (10/5)^2
    finally:
        preint.set_noise(*old)


def test_transition_model_5_disables_pgba():
    from dmvio_tpu.models.imu_system import ACTIVE, IMUCalib, IMUSystem

    sys5 = IMUSystem(IMUCalib(transition_model=5), f_max=4)
    sys5.phase = ACTIVE
    sys5.states = object()   # sentinel; must not be touched
    assert sys5.maybe_run_pgba(None, [None] * 4) is False
    assert sys5.kf_since_pgba == 0   # not even counted
