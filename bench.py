"""End-to-end benchmark at the reference operating point.

Runs the full pipeline on synthetic 512x512 sequences — the reference's
default TUM-VI operating point (512x512, 6 pyramid levels, 7-KF window,
2048 active points, <=6 LM iterations; settings.cpp:93-103) — and reports
frames/s, the reference's own primary speed metric
(main_dmvio_dataset.cpp:305-321). The HEADLINE metric is full
visual-inertial odometry (VIO) — the system the reference actually is;
visual-only (VO) fps, time-to-IMU-active and init-phase fps are reported
in `extra`.

vs_baseline compares against 20 frames/s: TUM-VI camera rate, i.e. the
throughput the reference's realtime preset must sustain (>1 = faster than
realtime on one chip).

Prints ONE JSON line — ALWAYS, even on failure. The TPU link is known to
stall for minutes or drop entirely (CLAUDE.md), so the script:
  * probes the backend in a KILLABLE subprocess first (a hung in-process
    first-contact cannot be interrupted), with bounded retries;
  * runs the measurement under a watchdog that emits a structured-error
    JSON instead of hanging past the driver's patience;
  * catches everything and reports {"error": ...} with value 0.
"""

import json
import os
import subprocess
import sys
import threading
import time

METRIC = "vio_frames_per_second_512x512"
BASELINE_FPS = 20.0   # TUM-VI camera rate = realtime requirement


def emit(value, vs_baseline, error=None, extra=None):
    rec = {"metric": METRIC, "value": round(float(value), 3),
           "unit": "frames/s", "vs_baseline": round(float(vs_baseline), 3)}
    if error:
        rec["error"] = error
    if extra:
        rec["extra"] = extra
    print(json.dumps(rec))
    sys.stdout.flush()


def probe_backend(timeout_s: float = None, attempts: int = 3) -> str:
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", "75"))
    """Touch the backend from a subprocess (killable). Returns "" when the
    device answers, else a short error string."""
    code = ("import jax, jax.numpy as jnp;"
            "x=jnp.ones((128,128));"
            "print((x@x).block_until_ready().dtype)")
    last = "unknown"
    for k in range(attempts):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout_s)
            if r.returncode == 0:
                return ""
            last = (r.stderr.decode(errors="replace").strip()
                    .splitlines() or ["rc=%d" % r.returncode])[-1][:200]
        except subprocess.TimeoutExpired:
            last = f"probe timeout after {timeout_s:.0f}s"
        # Bounded backoff between attempts (5-20s of actual sleep; link
        # stalls are often transient). Computed so a fast failure waits
        # out most of a 30s window but a slow timeout still backs off.
        if k + 1 < attempts:
            time.sleep(min(20.0, max(5.0, 30.0 - (time.time() - t0))))
    return f"tpu backend unavailable ({last})"


class Watchdog:
    """Emit a structured-error line and hard-exit if the run wedges."""

    def __init__(self, budget_s: float):
        self.deadline = time.time() + budget_s
        self.partial = None   # (value, vs_baseline, extra) once VIO finished
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def _run(self):
        while True:
            dt = self.deadline - time.time()
            if dt <= 0:
                if self.partial is not None:
                    v, vs, ex = self.partial
                    ex = dict(ex or {})
                    ex.setdefault("note", "vo stage timed out")
                    emit(v, vs, extra=ex)
                else:
                    emit(0.0, 0.0, error="benchmark watchdog timeout "
                         "(link stall mid-run)")
                os._exit(0)
            time.sleep(min(dt, 5.0))


def _dump_frametimes(tag, fts, total):
    """BENCH_FRAMETIMES=1: per-frame wall times of the measured region on
    stderr — localizes recompiles/link stalls that medians hide."""
    if not os.environ.get("BENCH_FRAMETIMES"):
        return
    line = " ".join(f"{t*1e3:.0f}" for t in fts)
    tail = total - sum(fts)
    print(f"# {tag} frametimes(ms): {line} finish={tail*1e3:.0f}",
          file=sys.stderr)


def _warm_pose_fn(lie, np, jnp):
    def pose(i):
        center = np.array([0.035 * i, 0.015 * np.sin(i * 0.4), 0.004 * i])
        w_vec = np.array([0.002 * i, -0.004 * i, 0.001 * i])
        R_wc = np.asarray(lie.so3_exp(jnp.asarray(w_vec)))
        R_cw = R_wc.T
        return (jnp.asarray(R_cw, jnp.float32),
                jnp.asarray(-R_cw @ center, jnp.float32))
    return pose


def bench_vo():
    """Visual-only realtime pipeline fps (the VO control alongside the
    VIO headline). Returns (fps, diag) where diag carries the same
    diagnostics as the VIO bench — median-frame fps and per-stage medians
    — so link weather and host/device regressions are attributable from
    the artifact alone (round-4 verdict: the VO number collapsed and the
    control was too under-instrumented to exonerate itself)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmvio_tpu.models import full_system, window
    from dmvio_tpu.utils import lie, synthetic
    from dmvio_tpu.utils import timing as _timing
    from dmvio_tpu.utils.camera import Calib

    H = W = 512
    N_WARM = 12     # minimum warmup; extended until the first KFs exist so
                    # every program (init, track, trace, BA, marg) is
                    # compiled before the timed region
    N_WARM_MAX = 64
    N_MEAS = 72     # long window: the device link's latency jitter (rare
                    # multi-second stalls) must average out

    calib = Calib.create(380.0, 380.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)
    pose = _warm_pose_fn(lie, np, jnp)

    # Realtime (pipelined) mode — the operating point the reference's
    # 20 fps requirement refers to (linearizeOperation=false).
    cfg = window.Config(f_max=8, p_max=2048, i_max=2048, max_frames=7,
                        levels=6, ba_iters=6, realtime=True)
    if os.environ.get("BENCH_RT_DEPTH"):
        cfg.rt_stall_depth = int(os.environ["BENCH_RT_DEPTH"])
    fs = full_system.FullSystem(calib, H, W, cfg)

    frames = []
    for i in range(N_WARM_MAX + N_MEAS):
        R, t = pose(i)
        frames.append(synthetic.render(scene, R, t, calib, H, W))
    jax.block_until_ready(frames[-1])

    # Warm until the window holds several keyframes: only then have all
    # steady-state programs (track, trace, activate, BA, marginalize,
    # tracker-ref) been compiled. Keyframe cadence is data-dependent, so
    # the warmup length is too (bounded by N_WARM_MAX).
    n_warm = 0
    for i in range(N_WARM_MAX):
        fs.add_frame(frames[i], timestamp=i * 0.05)
        n_warm += 1
        if n_warm >= N_WARM and fs.initialized \
                and fs.stats_kf >= cfg.max_frames + 2:
            break
    if not fs.initialized:
        raise RuntimeError("benchmark pipeline failed to initialize")

    # Warm the data-dependently-triggered programs too (32-candidate rescue
    # tracking): whether they fire during the measured region depends on
    # pipeline timing, and a first-use compile/cache-load there costs
    # seconds.
    from dmvio_tpu.ops import pyramid as _pyr
    _warm_pyr = tuple(_pyr.build_pyramid_jit(frames[n_warm],
                                             levels=cfg.levels))
    fs._rescue_track(_warm_pyr)   # fetches internally; result discarded

    _timing.reset()   # stage stats cover the measured region only
    t0 = time.perf_counter()
    fts = []
    for i in range(n_warm, n_warm + N_MEAS):
        ft = time.perf_counter()
        fs.add_frame(frames[i], timestamp=i * 0.05)
        fts.append(time.perf_counter() - ft)
    fs.finish()   # flush the realtime pipeline inside the timed region
    dt = time.perf_counter() - t0
    _dump_frametimes("vo", fts, dt)
    diag = {}
    med = sorted(fts)[len(fts) // 2]
    if med > 0:
        diag["vo_median_frame_fps"] = round(1.0 / med, 3)
    diag["vo_lost_frames"] = fs.stats_lost_frames
    diag["vo_resets"] = fs.stats_resets
    stats = _timing.get_stats()
    by_total = sorted(stats.items(),
                      key=lambda kv: -kv[1]["n"] * kv[1]["mean"])
    diag["vo_stage_ms"] = {
        k: [v["n"], round(v["median"] * 1e3, 2), round(v["mean"] * 1e3, 2),
            round(v["max"] * 1e3, 2)]
        for k, v in by_total[:8]}
    return N_MEAS / dt, diag


def bench_vio(progress=None):
    """Full visual-inertial fps at the 512x512 operating point — the
    HEADLINE metric (the reference is a visual-inertial system; its
    realtime bar applies to VIO, MainSettings.cpp:205-236). Also returns
    cold-start stats: wall time and fps from frame 0 to the IMU-ACTIVE
    phase flip (the reference is realtime from frame 0).

    Methodology: a PREWARM pass on a throwaway synthetic sequence (a
    DIFFERENT seed, same shapes/config) compiles or cache-loads every
    steady-state program first — the shipped behavior (`run_dataset
    prewarm=1`), matching the reference whose C++ ships precompiled. The
    cold-start stat below is therefore the pipeline's own init time on a
    fresh sequence, not XLA compile time; the prewarm pass's duration is
    reported separately as `prewarm_s` (first-contact cost, ~5 s from a
    populated persistent cache, tens of seconds on a cold cache)."""
    import jax
    import numpy as np

    from dmvio_tpu.models import full_system, imu_system, window
    from dmvio_tpu.run_dataset import _prewarm
    from dmvio_tpu.utils import synthetic

    H = W = 512
    N_WARM_MAX = 100
    # Long measured region: with the steady-state round trip off the
    # critical path (track_fetch median 0.01 ms), the residual exposure
    # is rare multi-hundred-ms link stall events — on a 60-frame region
    # one 1.2 s stall (measured) halves the headline; on 240 frames it
    # is a ~15% dent. The region must dwarf the stall tail, not avoid it.
    N_MEAS = int(os.environ.get("BENCH_N_MEAS", "240"))
    seq = synthetic.generate_vio_sequence(
        n_frames=N_WARM_MAX + N_MEAS, frame_dt=0.05, h=H, w=W,
        s_dso=1.3, g2=(0.05, -0.03), accel_scale=0.5, rot_scale=0.3,
        seed=2, scene=synthetic.default_scene(depth=2.0))
    jax.block_until_ready(seq["images"][-1])
    cfg = window.Config(f_max=8, p_max=2048, i_max=2048, max_frames=7,
                        levels=6, ba_iters=6,
                        realtime=bool(int(os.environ.get(
                            "BENCH_VIO_RT", "1"))))
    if os.environ.get("BENCH_RT_DEPTH"):
        cfg.rt_stall_depth = int(os.environ["BENCH_RT_DEPTH"])
    cold = {}
    if os.environ.get("BENCH_PREWARM", "1") != "0":
        t_pw = time.perf_counter()
        _prewarm(cfg, H, W, imu_system.IMUCalib(), quiet=True,
                 n=100, seed=11)
        cold["prewarm_s"] = round(time.perf_counter() - t_pw, 3)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
    spf = seq["steps_per_frame"]

    def chunk(i):
        if i == 0:
            return None
        s0, s1 = (i - 1) * spf, i * spf
        return (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                np.full(s1 - s0, seq["imu_dt"], np.float32))

    # Warm until EVERY steady-state program has compiled: activation is
    # not enough — the first PGBA cycle (snapshot + active-event programs)
    # and ~2 post-activation keyframe tails all first-compile AFTER the
    # phase flips, and a first-use compile inside the timed region costs
    # seconds (measured: the same region is 10.8 fps fully-warm vs 4.9
    # with activation-only warmup).
    n_warm = 0
    t_start = time.perf_counter()
    t_active = None
    n_active = None
    for i in range(N_WARM_MAX):
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk(i))
        n_warm += 1
        if t_active is None and fs.imu.phase == imu_system.ACTIVE:
            t_active = time.perf_counter() - t_start
            n_active = n_warm
        if fs.initialized and fs.imu.phase == imu_system.ACTIVE \
                and getattr(fs.imu, "pgba_count", 0) >= 2 \
                and getattr(fs.imu, "_pgba_bg", None) is None \
                and fs._kf_finalize is None \
                and fs.stats_kf >= cfg.max_frames + 4 and n_warm >= 48:
            # Steady state: >=2 PGBA cycles done (the FIRST adoption's
            # prior replacement is a ~300ms one-off), none in flight, no
            # deferred keyframe pending — one-offs stay out of the timed
            # region.
            break
    if t_active is not None:
        cold["time_to_imu_active_s"] = round(t_active, 3)
        cold["init_phase_fps"] = round(n_active / t_active, 3)
    from dmvio_tpu.utils import timing as _timing
    _timing.reset()   # stage stats then cover the measured region only
    trace_dir = os.environ.get("BENCH_TRACE")
    t0 = time.perf_counter()
    fts = []
    for i in range(n_warm, n_warm + N_MEAS):
        if trace_dir and i == n_warm + 10:
            jax.profiler.start_trace(trace_dir)
        if trace_dir and i == n_warm + 30:
            jax.profiler.stop_trace()
        ft = time.perf_counter()
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk(i))
        fts.append(time.perf_counter() - ft)
        if progress is not None and len(fts) % 20 == 0 and len(fts) >= 40:
            # Keep the watchdog able to emit an HONEST partial headline
            # if a multi-minute link outage lands mid-region (observed:
            # a stall ate the whole 1700 s budget and the artifact read
            # 0.0): frames-so-far / elapsed-so-far, stall included.
            part = dict(cold)
            part["partial_frames"] = len(fts)
            med_p = sorted(fts)[len(fts) // 2]
            if med_p > 0:
                part["vio_median_frame_fps"] = round(1.0 / med_p, 3)
            fps_p = len(fts) / (time.perf_counter() - t0)
            progress(fps_p, int(fs.imu.phase), part)
    fs.finish()
    dt = time.perf_counter() - t0
    _dump_frametimes("vio", fts, dt)
    # Steady-state diagnostic alongside the honest wall-clock headline:
    # the link's random 100-500 ms stalls (docs/PERF.md) tank the mean but
    # not the median, so the pair separates "system got slower" from
    # "link had a bad day".
    med = sorted(fts)[len(fts) // 2]
    if med > 0:
        cold["vio_median_frame_fps"] = round(1.0 / med, 3)
    # Per-stage medians of the measured region, embedded in the artifact
    # (not stderr prose): the stall-diagnosis data the round-3 verdict
    # asked for. [count, median_ms, mean_ms, max_ms] per stage, largest
    # total time first, capped to keep the JSON line readable.
    stats = _timing.get_stats()
    by_total = sorted(stats.items(), key=lambda kv: -kv[1]["n"] * kv[1]["mean"])
    cold["stage_ms"] = {
        k: [v["n"], round(v["median"] * 1e3, 2), round(v["mean"] * 1e3, 2),
            round(v["max"] * 1e3, 2)]
        for k, v in by_total[:10]}
    # Estimator-health context for the perf artifact (round-4 verdict: a
    # divergent-but-fast run must not look identical to a healthy one).
    # Metric ATE against the generator's ground truth over the whole run,
    # as % of path, plus reset/lost counters.
    cold["vio_resets"] = fs.stats_resets
    cold["vio_lost_frames"] = fs.stats_lost_frames
    try:
        from dmvio_tpu.utils import trajectory as _traj
        est = fs.metric_trajectory()
        if est is not None:
            n_tr = min(len(est), len(seq["p_gt"]))
            gt = [(float(seq["timestamps"][i]), np.asarray(seq["R_body"][i]),
                   np.asarray(seq["p_gt"][i])) for i in range(n_tr)]
            first_kf = min(fs.kf_poses.keys())
            # Drop non-finite estimates (a weather-lost frame can leave a
            # diverged shell; the alignment SVD must not see it).
            pairs = [(e, g) for e, g, sh in
                     zip(est[:n_tr], gt, fs.shells[:n_tr])
                     if sh.frame_id >= first_kf + 5
                     and np.all(np.isfinite(e[2]))
                     and np.all(np.isfinite(e[1]))]
            est_t = [p[0] for p in pairs]
            gt_t = [p[1] for p in pairs]
            dist = float(np.sum(np.linalg.norm(
                np.diff(np.stack([g[2] for g in gt_t]), axis=0), axis=1)))
            if dist > 0 and len(pairs) >= 20:
                cold["vio_ate_n"] = len(pairs)
                cold["vio_ate_se3_pct"] = round(100.0 * _traj.ate_rmse(
                    est_t, gt_t, with_scale=False) / dist, 2)
                cold["vio_ate_sim3_pct"] = round(100.0 * _traj.ate_rmse(
                    est_t, gt_t, with_scale=True) / dist, 2)
    except Exception as e:  # noqa: BLE001 — health context must not kill perf
        cold["vio_ate_error"] = f"{type(e).__name__}: {str(e)[:120]}"
    return N_MEAS / dt, int(fs.imu.phase), cold


def main():
    budget = float(os.environ.get("BENCH_TIMEOUT", "1700"))
    wd = Watchdog(budget)

    err = probe_backend()
    if err:
        emit(0.0, 0.0, error=err)
        return

    from dmvio_tpu.utils import jax_cache
    jax_cache.enable()   # compiles persist across runs (like shipped C++)

    # VIO is the headline (the gating metric): the reference's realtime
    # bar applies to the full inertial system, not visual-only odometry.
    def progress(fps_p, phase_p, part):
        part = dict(part)
        part["vio_imu_phase"] = phase_p
        part["note"] = "partial: link stall cut the measured region"
        wd.partial = (fps_p, fps_p / BASELINE_FPS, part)

    try:
        fps, phase, cold = bench_vio(progress=progress)
    except Exception as e:  # noqa: BLE001 — must still print the line
        emit(0.0, 0.0, error=f"vio bench failed: {type(e).__name__}: "
             f"{str(e)[:200]}")
        return

    extra = {"vio_imu_phase": phase}
    extra.update(cold)
    wd.partial = (fps, fps / BASELINE_FPS, extra)

    if os.environ.get("BENCH_VERBOSE"):
        from dmvio_tpu.utils.timing import get_stats
        for k, v in sorted(get_stats().items()):
            top = ",".join(f"{s*1e3:.0f}" for s in
                           sorted(v["samples"], reverse=True)[:4])
            print(f"#   {k}: n={v['n']} med={v['median']*1e3:.1f}ms "
                  f"mean={v['mean']*1e3:.1f}ms top=[{top}]ms",
                  file=sys.stderr)
    if os.environ.get("BENCH_VO", "1") != "0":
        try:
            vo_fps, vo_diag = bench_vo()
            extra["vo_frames_per_second_512x512"] = round(vo_fps, 3)
            extra.update(vo_diag)
        except Exception as e:  # noqa: BLE001
            extra["vo_error"] = (f"{type(e).__name__}: {str(e)[:200]}")
    emit(fps, fps / BASELINE_FPS, extra=extra or None)


if __name__ == "__main__":
    main()
