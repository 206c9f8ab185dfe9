"""Accuracy probe: the measurement harness behind docs/ACCURACY.md.

Runs the full VIO pipeline on the synthetic fixtures across a grid of
(seed, excitation, XLA device count) and reports sim3/se3 ATE per run plus
the estimator internals that separate the chaotic basins (activation
frame, PGBA cycle count, final scale). The XLA:CPU device count changes
codegen and thereby the chaotic gate bifurcations (CLAUDE.md), so every
configuration runs in a SUBPROCESS with its own
--xla_force_host_platform_device_count — the only way to measure both
basins from one command.

Usage:
    python -m dmvio_tpu.tools.accuracy_probe seeds=3,5,7 excite=0,2.0 \
        devcount=1,8 [frames=48] [realtime=0] [json=out.jsonl]

Worker mode (internal): worker=1 + one configuration; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _parse_args(argv):
    kv = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            kv[k] = v
    return kv


def run_worker(kv) -> None:
    import numpy as np

    from dmvio_tpu.models import full_system, imu_system, window
    from dmvio_tpu.utils import synthetic, trajectory

    seed = int(kv.get("seed", 3))
    excite = float(kv.get("excite", 0.0))
    n = int(kv.get("frames", 48))
    rt = bool(int(kv.get("realtime", 0)))
    h, w = int(kv.get("h", 192)), int(kv.get("w", 256))
    # The hard batch fixture of tests/test_full_vio.py (aggressive motion).
    seq = synthetic.generate_vio_sequence(
        n_frames=n, frame_dt=0.05, h=h, w=w,
        s_dso=1.4, g2=(0.06, -0.04), accel_scale=0.8, rot_scale=0.45,
        seed=seed, excite=excite,
        scene=synthetic.default_scene(depth=2.0))
    cfg = window.Config(f_max=6, p_max=512, i_max=512, max_frames=4,
                        levels=4, ba_iters=6, realtime=rt)
    calib = imu_system.IMUCalib(
        pgba_scale_th=float(kv.get("pgba_th", 1.0)))
    fs = full_system.FullSystem(seq["calib"], h, w, cfg,
                                imu_calib=calib)
    spf = seq["steps_per_frame"]
    act_fid = None
    for i in range(n):
        chunk = None
        if i > 0:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
        if act_fid is None and fs.imu.phase == imu_system.ACTIVE:
            act_fid = i
    fs.finish()
    rec = dict(seed=seed, excite=excite, frames=n, realtime=int(rt),
               devcount=int(kv.get("devcount", 0)),
               phase=int(fs.imu.phase), act_fid=act_fid,
               pgba=int(getattr(fs.imu, "pgba_count", 0)),
               adopt=int(getattr(fs.imu, "pgba_adopt_count", 0)),
               svar=round(float(getattr(fs.imu, "last_pgba_svar",
                                        float("nan"))), 6),
               init_svar=round(float(getattr(fs.imu, "init_s_var",
                                             float("nan"))), 6),
               kf=fs.stats_kf, lost=fs.stats_lost_frames)
    est = fs.metric_trajectory()
    if est is None:
        rec["error"] = "imu never activated"
        print(json.dumps(rec))
        return
    import jax
    st = jax.device_get(fs.imu.states)
    rec["s_est"] = round(float(np.exp(st.s_log)), 4)
    gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
           seq["p_gt"][i]) for i in range(n)]
    dist = float(np.sum(np.linalg.norm(
        np.diff(np.stack([g[2] for g in gt]), axis=0), axis=1)))
    first_kf = min(fs.kf_poses.keys())

    def score(lo):
        e = [x for x, sh in zip(est, fs.shells) if sh.frame_id >= lo]
        g = [x for x, sh in zip(gt, fs.shells) if sh.frame_id >= lo]
        return (100 * trajectory.ate_rmse(e, g, with_scale=True) / dist,
                100 * trajectory.ate_rmse(e, g, with_scale=False) / dist)

    rec["sim3_full"], rec["se3_full"] = [round(x, 3) for x in score(0)]
    rec["sim3_tail"], rec["se3_tail"] = [
        round(x, 3) for x in score(first_kf + 5)]
    print(json.dumps(rec))


def main(argv=None) -> None:
    kv = _parse_args(argv if argv is not None else sys.argv[1:])
    if int(kv.get("worker", 0)):
        run_worker(kv)
        return
    seeds = [int(s) for s in str(kv.get("seeds", "3,5,7")).split(",")]
    excites = [float(x) for x in str(kv.get("excite", "0,2.0")).split(",")]
    devcounts = [int(d) for d in str(kv.get("devcount", "1,8")).split(",")]
    out_path = kv.get("json", "")
    rows = []
    for dev in devcounts:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["DMVIO_XLA_CACHE"] = "off"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + [f"--xla_force_host_platform_device_count={dev}"])
        for ex in excites:
            for seed in seeds:
                args = [sys.executable, "-m",
                        "dmvio_tpu.tools.accuracy_probe", "worker=1",
                        f"seed={seed}", f"excite={ex}", f"devcount={dev}"]
                for k in ("frames", "realtime", "h", "w", "pgba_th"):
                    if k in kv:
                        args.append(f"{k}={kv[k]}")
                r = subprocess.run(args, capture_output=True, text=True,
                                   env=env, timeout=3600)
                line = (r.stdout.strip().splitlines() or ["{}"])[-1]
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    rec = {"seed": seed, "excite": ex, "devcount": dev,
                           "error": (r.stderr.strip().splitlines()
                                     or ["no output"])[-1][:200]}
                rows.append(rec)
                print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            for rec in rows:
                f.write(json.dumps(rec) + "\n")
    # Compact summary table.
    print(f"{'dev':>3} {'ex':>4} {'seed':>4} {'act':>4} {'pgba':>4} "
          f"{'adpt':>4} {'svar':>9} "
          f"{'s_est':>7} {'sim3%':>7} {'se3%':>7} {'se3_tail%':>9}",
          file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"{r.get('devcount', '?'):>3} {r.get('excite', '?'):>4} "
                  f"{r.get('seed', '?'):>4} ERROR {r['error']}",
                  file=sys.stderr)
            continue
        print(f"{r['devcount']:>3} {r['excite']:>4} {r['seed']:>4} "
              f"{str(r['act_fid']):>4} {r['pgba']:>4} "
              f"{r.get('adopt', 0):>4} {r.get('svar', float('nan')):>9} "
              f"{r.get('s_est', float('nan')):>7} {r['sim3_full']:>7} "
              f"{r['se3_full']:>7} {r['se3_tail']:>9}", file=sys.stderr)


if __name__ == "__main__":
    main()
