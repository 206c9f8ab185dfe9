"""Link-stall behavior of the realtime pipeline (round-5 architecture).

The measured TPU link stalls 0.3-1.2 s roughly once per second under bad
weather (docs/PERF.md). With dispatch-time keyframe decisions
(Config.rt_dispatch_kf) the pipeline rides through such a stall without
stalling every frame: tracking keeps dispatching, the keyframe cadence
degrades gracefully to the rate-extrapolated ramp, and the one deferred
keyframe whose host half is stuck crossing the link STRETCHES the
interval — up to the rt_kf_stretch bound, past which the decision
deliberately paces to the link (one bounded block) so the map never
starves (the round-4 design instead blocked on every frame past its
queue depth).

The stall is emulated by gating the fetch pool's futures: copies
submitted inside the stall window do not land until it ends — exactly
what a stalled D2H channel looks like to the host.
"""

import time

import numpy as np
import pytest

from dmvio_tpu.models import full_system, imu_system, window
from dmvio_tpu.utils import synthetic

H, W = 192, 256
N_FRAMES = 56


class _GatedFuture:
    def __init__(self, inner, gate):
        self._inner = inner
        self._gate = gate

    def done(self):
        return time.monotonic() >= self._gate and self._inner.done()

    def result(self, timeout=None):
        dt = self._gate - time.monotonic()
        if dt > 0:
            time.sleep(dt)
        return self._inner.result(timeout)

    def exception(self, timeout=None):
        dt = self._gate - time.monotonic()
        if timeout is not None and dt > timeout:
            from concurrent.futures import TimeoutError as _FT
            time.sleep(timeout)
            raise _FT()
        if dt > 0:
            time.sleep(dt)
        return self._inner.exception(timeout)


class _StallFetcher:
    """Wraps the real fetch pool; futures submitted while `stalled` do
    not complete until `release_at` — an emulated D2H channel stall."""

    def __init__(self, inner):
        self._inner = inner
        self.release_at = 0.0

    def submit(self, tree):
        f = self._inner.submit(tree)
        if time.monotonic() < self.release_at:
            return _GatedFuture(f, self.release_at)
        return f

    def shutdown(self):
        self._inner.shutdown()


@pytest.mark.slow
def test_pipeline_rides_through_link_stall():
    seq = synthetic.generate_vio_sequence(
        n_frames=N_FRAMES, frame_dt=0.05, h=H, w=W,
        s_dso=1.3, g2=(0.05, -0.03), accel_scale=0.5, rot_scale=0.3,
        seed=7, scene=synthetic.default_scene(depth=2.0))
    cfg = window.Config(f_max=6, p_max=512, i_max=512, max_frames=4,
                        levels=4, ba_iters=6, realtime=True)
    fs = full_system.FullSystem(seq["calib"], H, W, cfg,
                                imu_calib=imu_system.IMUCalib())
    stall = _StallFetcher(fs._fetcher)
    fs._fetcher = stall

    kf_fids = []
    for name in ("_make_keyframe_rt_vio", "_make_keyframe_rt"):
        orig = getattr(fs, name)

        def wrap(pyr, ts, fid, *a, __orig=orig, **k):
            kf_fids.append(fid)
            return __orig(pyr, ts, fid, *a, **k)

        setattr(fs, name, wrap)

    spf = seq["steps_per_frame"]
    stall_start_fid = 28
    stall_s = 2.5
    frame_wall = {}
    for i in range(N_FRAMES):
        chunk = None
        if i > 0:
            s0, s1 = (i - 1) * spf, i * spf
            chunk = (seq["acc"][s0:s1], seq["gyr"][s0:s1],
                     np.full(s1 - s0, seq["imu_dt"], np.float32))
        if i == stall_start_fid:
            stall.release_at = time.monotonic() + stall_s
        in_stall_now = time.monotonic() < stall.release_at
        t0 = time.monotonic()
        fs.add_frame(seq["images"][i], float(seq["timestamps"][i]),
                     imu_data=chunk)
        frame_wall[i] = time.monotonic() - t0
        if in_stall_now:
            stalled_fids = i   # newest frame fed while copies were gated
    fs.finish()

    # The system survived the stall: no reset, still tracking, IMU alive.
    assert fs.initialized
    assert fs.stats_resets == 0
    assert fs.stats_lost_frames <= 2, fs.stats_lost_frames

    # The frame loop kept FLOWING through the stall: multiple frames
    # dispatched quickly while copies were gated (the round-4
    # consume-time design starts blocking as soon as the queue exceeds
    # its depth). A single bounded block IS allowed — once the scene
    # moves rt_kf_stretch past the keyframe need, the decision
    # deliberately paces to the link rather than starve the map.
    in_stall = [frame_wall[i]
                for i in range(stall_start_fid, stalled_fids + 1)]
    fast = sum(1 for t in in_stall if t < 0.5)
    assert fast >= 4, (fast, [round(t, 2) for t in in_stall])

    # Keyframes kept coming while copies were gated: at least one
    # keyframe was BUILT from a frame dispatched inside the stall window
    # (the rate-extrapolated ramp + the pre-stall finalize allow exactly
    # that; with consume-time decisions zero keyframes can fire until the
    # stall clears).
    n_in_stall = sum(1 for f in kf_fids
                     if stall_start_fid + 1 <= f <= stalled_fids)
    assert n_in_stall >= 1, (kf_fids, stall_start_fid, stalled_fids)
