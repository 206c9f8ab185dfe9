"""End-to-end benchmark at the reference operating point.

Runs the full visual-odometry pipeline (tracking + immature tracing + KF
bundle adjustment + marginalization) on a synthetic 512x512 sequence — the
reference's default TUM-VI operating point (512x512, 6 pyramid levels, 7-KF
window, 2048 active points, <=6 LM iterations; settings.cpp:93-103) — and
reports frames/s, the reference's own primary speed metric
(main_dmvio_dataset.cpp:305-321).

vs_baseline compares against 20 frames/s: TUM-VI camera rate, i.e. the
throughput the reference's realtime preset must sustain (>1 = faster than
realtime on one chip).

Prints ONE JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dmvio_tpu.models import full_system, window
    from dmvio_tpu.utils import jax_cache, lie, synthetic
    from dmvio_tpu.utils.camera import Calib

    jax_cache.enable()   # compiles persist across runs (like shipped C++)

    H = W = 512
    N_WARM = 12     # minimum warmup; extended until the first KFs exist so
                    # every program (init, track, trace, BA, marg) is
                    # compiled before the timed region
    N_WARM_MAX = 64
    N_MEAS = 72     # long window: the device link's latency jitter (rare
                    # multi-second stalls) must average out

    calib = Calib.create(380.0, 380.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)

    def pose(i):
        center = np.array([0.035 * i, 0.015 * np.sin(i * 0.4), 0.004 * i])
        w_vec = np.array([0.002 * i, -0.004 * i, 0.001 * i])
        R_wc = np.asarray(lie.so3_exp(jnp.asarray(w_vec)))
        R_cw = R_wc.T
        return (jnp.asarray(R_cw, jnp.float32),
                jnp.asarray(-R_cw @ center, jnp.float32))

    # Realtime (pipelined) mode — the operating point the reference's
    # 20 fps requirement refers to (linearizeOperation=false).
    cfg = window.Config(f_max=8, p_max=2048, i_max=2048, max_frames=7,
                        levels=6, ba_iters=6, realtime=True)
    if os.environ.get("BENCH_RT_DEPTH"):
        cfg.rt_depth_max = int(os.environ["BENCH_RT_DEPTH"])
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
        # Steady state starts once the window has FILLED (max_frames
        # keyframes) and marginalization has run a couple of times: the
        # marg-path programs compile / load from the persistent cache on
        # first use, a one-time 2-3s hit that must not land in the timed
        # region.
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

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + N_MEAS):
        fs.add_frame(frames[i], timestamp=i * 0.05)
    fs.finish()   # flush the realtime pipeline inside the timed region
    dt = time.perf_counter() - t0

    fps = N_MEAS / dt
    baseline_fps = 20.0  # TUM-VI camera rate = realtime requirement
    import sys
    if os.environ.get("BENCH_VERBOSE"):
        from dmvio_tpu.utils.timing import get_stats
        for k, v in sorted(get_stats().items()):
            top = ",".join(f"{s*1e3:.0f}" for s in
                           sorted(v["samples"], reverse=True)[:4])
            print(f"#   {k}: n={v['n']} med={v['median']*1e3:.1f}ms "
                  f"mean={v['mean']*1e3:.1f}ms top=[{top}]ms",
                  file=sys.stderr)
    print(json.dumps({
        "metric": "vo_frames_per_second_512x512",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
