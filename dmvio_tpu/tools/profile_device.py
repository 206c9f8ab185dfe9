"""Per-kernel device-time profile of every pipeline program.

Runs the synthetic benchmark scene to a steady state, then traces each
stage (pyramid, coarse track, epipolar trace, point activation, windowed
BA, fused marginalization, tracker-ref build) with jax.profiler and prints
the top device kernels per stage. This is how the per-op costs quoted in
kernel docstrings were measured; wall-clock timing alone is useless here —
the host<->device link adds a fixed ~25-55 ms round trip per sync with
multi-hundred-ms jitter, so only device-side trace events are trustworthy.

Usage:
    python -m dmvio_tpu.tools.profile_device [stage ...]
    stages: pyramid track trace activate ba marg tref (default: all)
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import tempfile


def _top_kernels(trace_dir: str, k: int = 10):
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return []
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    names = {}
    for e in tr.get("traceEvents", []):
        nm = e.get("name", "")
        if e.get("ph") != "X" or nm.startswith("$") \
                or "PjitFunction" in nm or "Parse" in nm:
            continue
        rec = names.setdefault(nm, [0, 0.0])
        rec[0] += 1
        rec[1] += e.get("dur", 0)
    return sorted(names.items(), key=lambda kv: -kv[1][1])[:k]


def _run_traced(name, fn):
    import jax
    fn()   # warm / compile outside the trace
    d = tempfile.mkdtemp(prefix=f"dmvio_prof_{name}_")
    with jax.profiler.trace(d):
        fn()
    all_kernels = _top_kernels(d, k=10 ** 6)   # parse the trace once
    tops = all_kernels[:10]
    total = sum(dur for _, (_, dur) in all_kernels)
    print(f"== {name}  (device total {total / 1e3:.2f} ms)")
    for kk, (n, dur) in tops:
        print(f"  {dur / 1e3:9.3f} ms x{n:5d}  {kk[:78]}", flush=True)


def _profile_vio(want, cfg, H, W):
    """Device profile of the VISUAL-INERTIAL keyframe-tail programs at
    the benchmark operating point: steady-state ACTIVE-phase system, then
    trace the extended BA and the fused VIO marg tail."""
    import jax
    import numpy as np

    from dmvio_tpu.models import full_system, imu_system
    from dmvio_tpu.utils import synthetic

    seq = synthetic.generate_vio_sequence(
        n_frames=60, frame_dt=0.05, h=H, w=W, s_dso=1.3, g2=(0.05, -0.03),
        accel_scale=0.5, rot_scale=0.3, seed=2,
        scene=synthetic.default_scene(depth=2.0))
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
    spf = seq["steps_per_frame"]

    def chunk(i):
        if i == 0:
            return None
        s0, s1 = (i - 1) * spf, i * spf
        return (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                np.full(s1 - s0, seq["imu_dt"], np.float32))

    for i in range(60):
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk(i))
    print(f"steady state: {fs.stats_kf} keyframes, "
          f"{fs._n_active:.0f} active pts, imu phase {fs.imu.phase}",
          flush=True)
    assert fs.imu.phase == imu_system.ACTIVE, "IMU never activated"

    w = fs.win
    slot = fs.ref_kf_slot
    stages = {
        "vio_ba": lambda: (fs._run_ba(max_iters=cfg.ba_iters),
                           jax.block_until_ready(w.points.idepth)),
        # Block on the FULL refs tuple (all leaves are device arrays) so
        # every tail kernel lands inside the trace window.
        "vio_tail": lambda: jax.block_until_ready(
            fs._dispatch_vio_tail(slot)[0]),
    }
    for name in sorted(want):
        if name in stages:
            _run_traced(name, stages[name])
        else:
            print(f"warning: unknown --vio stage '{name}' "
                  f"(known: {sorted(stages)})", file=sys.stderr)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmvio_tpu.models import coarse_tracker, full_system, window
    from dmvio_tpu.ops import pyramid
    from dmvio_tpu.utils import lie, synthetic
    from dmvio_tpu.utils.camera import Calib

    args = list(argv if argv is not None else sys.argv[1:])
    vio = "--vio" in args
    if vio:
        args.remove("--vio")
    want = set(args) or (
        {"vio_ba", "vio_tail"} if vio else
        {"pyramid", "track", "trace", "activate", "ba", "marg", "tref"})

    H = W = 512
    calib = Calib.create(380.0, 380.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)
    cfg = window.Config(f_max=8, p_max=2048, i_max=2048, max_frames=7,
                        levels=6, ba_iters=6, realtime=False)
    if vio:
        _profile_vio(want, cfg, H, W)
        return
    fs = full_system.FullSystem(calib, H, W, cfg)

    def pose(i):
        center = np.array([0.035 * i, 0.015 * np.sin(i * 0.4), 0.004 * i])
        wv = np.array([0.002 * i, -0.004 * i, 0.001 * i])
        R_wc = np.asarray(lie.so3_exp(jnp.asarray(wv)))
        R_cw = R_wc.T
        return (jnp.asarray(R_cw, jnp.float32),
                jnp.asarray(-R_cw @ center, jnp.float32))

    frames = [synthetic.render(scene, *pose(i), calib, H, W)
              for i in range(40)]
    for i in range(36):
        fs.add_frame(frames[i], timestamp=i * 0.05)
    print(f"steady state: {fs.stats_kf} keyframes, "
          f"{fs._n_active:.0f} active points", flush=True)

    w = fs.win
    slot = fs.ref_kf_slot
    pyr = tuple(pyramid.build_pyramid_jit(frames[36], levels=cfg.levels))
    jax.block_until_ready(pyr)
    R_cw = jnp.eye(3, dtype=jnp.float32)
    t_cw = jnp.zeros(3, jnp.float32)
    aff = jnp.zeros(2, jnp.float32)
    R_c = jnp.broadcast_to(jnp.eye(3), (4, 3, 3)).astype(jnp.float32)
    t_c = jnp.zeros((4, 3), jnp.float32)
    m_c = jnp.asarray([True, True, False, False])
    z = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1e9, jnp.float32)
    targs = (fs.tracker_ref, pyr, fs.calib, R_c, t_c, m_c, z, z, g)

    stages = {
        "pyramid": lambda: jax.block_until_ready(
            pyramid.build_pyramid_jit(frames[37], levels=cfg.levels)),
        "track": lambda: jax.block_until_ready(
            coarse_tracker.track_multi_jit(*targs, levels=cfg.levels)[1]),
        "trace": lambda: (fs._trace_pool(R_cw, t_cw, aff, pyr),
                          jax.block_until_ready(fs.imm.u)),
        "activate": lambda: (fs._activate_points(slot),
                             jax.block_until_ready(w.points.idepth)),
        "ba": lambda: (fs._run_ba(max_iters=cfg.ba_iters),
                       jax.block_until_ready(w.points.idepth)),
        "marg": lambda: jax.block_until_ready(
            fs._dispatch_marg_fused(slot)[:3]),
        "tref": lambda: (fs._build_tracker_ref_dev(slot),
                         jax.block_until_ready(fs.tracker_ref)),
    }

    for name, fn in stages.items():
        if name not in want:
            continue
        fn()   # warm / compile outside the trace
        d = tempfile.mkdtemp(prefix=f"dmvio_prof_{name}_")
        with jax.profiler.trace(d):
            fn()
        print(f"== {name}")
        for kk, (n, dur) in _top_kernels(d):
            print(f"  {dur / 1e3:9.3f} ms x{n:5d}  {kk[:78]}", flush=True)


if __name__ == "__main__":
    main()
