"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed runtime (CPU backend, 2 virtual devices
per process -> 4 global devices), runs the REAL FullSystem pipeline with
the point-axis programs sharded over the (dp=processes, mp=local) global
mesh — the dp collectives crossing process boundaries over Gloo, exactly
as they would cross DCN between TPU hosts — and prints a result line the
parent asserts on.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import os
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["DMVIO_XLA_CACHE"] = "off"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    os.environ["DMVIO_COORDINATOR"] = f"localhost:{port}"
    os.environ["DMVIO_NUM_PROCESSES"] = "2"
    os.environ["DMVIO_PROCESS_ID"] = str(pid)

    from dmvio_tpu.parallel import dist_init

    assert dist_init.maybe_initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    import numpy as np

    from dmvio_tpu.models import full_system, imu_system, window
    from dmvio_tpu.utils import synthetic

    H, W = 128, 160
    n_frames = 36
    seq = synthetic.generate_vio_sequence(
        n_frames=n_frames, frame_dt=0.05, h=H, w=W,
        s_dso=1.4, g2=(0.06, -0.04), accel_scale=0.8, rot_scale=0.45,
        seed=3, scene=synthetic.default_scene(depth=2.0))
    cfg = window.Config(f_max=6, p_max=256, i_max=256, max_frames=4,
                        levels=4, ba_iters=4, mesh_devices=0)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
    assert fs.placer is not None and fs.placer._multiproc, \
        "multi-process run must shard over the global mesh"
    assert fs.placer.mesh.devices.shape == (2, 2), fs.placer.mesh.devices
    spf = seq["steps_per_frame"]
    for i in range(n_frames):
        if i == 0:
            chunk = None
        else:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
    fs.finish()

    traj = fs.trajectory()
    pos = np.stack([t for (_ts, _R, t) in traj])
    digest = float(np.abs(pos).sum())
    # Accuracy gate, not just lockstep: a deterministic-but-wrong SPMD
    # trajectory agrees across ranks; it must also match ground truth
    # (sim3: the visual trajectory's gauge is scale-free).
    from dmvio_tpu.utils import trajectory as tj
    gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
           seq["p_gt"][i]) for i in range(n_frames)]
    first_kf = min(fs.kf_poses.keys())
    est_t = [e for e, sh in zip(traj, fs.shells)
             if sh.frame_id >= first_kf + 5]
    gt_t = [g for g, sh in zip(gt, fs.shells)
            if sh.frame_id >= first_kf + 5]
    dist = float(np.sum(np.linalg.norm(
        np.diff(np.stack([g[2] for g in gt_t]), axis=0), axis=1)))
    ate_pct = 100 * tj.ate_rmse(est_t, gt_t, with_scale=True) / dist
    print(f"MHRESULT pid={pid} init={int(fs.initialized)} "
          f"kf={fs.stats_kf} lost={fs.stats_lost_frames} "
          f"phase={fs.imu.phase} n={len(traj)} ate_pct={ate_pct:.4f} "
          f"digest={digest:.9e}",
          flush=True)


if __name__ == "__main__":
    main()
