"""Host-side sliding-window state manager (fixed-capacity SoA).

The functional core (ops/, models/ba.py) is pure and jitted; this module is
the thin mutable shell around it: slot allocation for frames and points,
incidence masks, the marginalization prior, and the per-frame metadata the
reference keeps in FrameShell/FrameHessian (src/dso/util/FrameShell.h:37-78,
src/dso/FullSystem/HessianBlocks.h). All array state lives on device; only
small masks are mirrored on host for slot bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import window_ops
from dmvio_tpu.ops import ba_solve
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils.camera import Calib


@dataclasses.dataclass
class Config:
    """Runtime knobs, defaults mirroring the reference operating point
    (settings.cpp:93-103, SURVEY.md §6)."""

    f_max: int = 8              # window capacity (reference maxFrames=7 + newest)
    p_max: int = 2048           # active point capacity (setting_desiredPointDensity)
    i_max: int = 2048           # immature pool capacity (setting_desiredImmatureDensity 1500)
    max_frames: int = 7         # marginalize down to this many KFs
    ba_iters: int = 6           # setting_maxOptIterations
    levels: int = 6             # PYR_LEVELS
    kf_weight: float = 1.0      # setting_kfGlobalWeight
    w_flow_t: float = 0.04 * (640 + 480)    # setting_maxShiftWeightT
    w_flow_rt: float = 0.02 * (640 + 480)   # setting_maxShiftWeightRT
    w_aff: float = 2.0          # setting_maxAffineWeight
    calib_prior: float = 1e8    # pin intrinsics (reference optimizes with prior)
    first_pose_prior: float = 1e10   # initialRotPrior/TransPrior magnitude
    first_aff_prior: float = 1e10
    aff_a_prior: float = 1e6    # setting_affineOptModeA-style prior
    aff_b_prior: float = 1e4
    min_rel_baseline: float = 0.02  # initializer parallax gate (RMS px / (w+h))
    # Pipelined tracking/mapping (the reference's realtime mode,
    # linearizeOperation=false): the host consumes each frame's tracking
    # result one frame late, so device compute overlaps host bookkeeping
    # and the keyframe path. Carries the full inertial stack: the IMU
    # coarse filter issues a dispatch-time preview and advances at consume
    # time, and inertial keyframes finalize deferred with divergence
    # revert (full_system._make_keyframe_rt_vio / _finalize_kf_vio).
    realtime: bool = False
    # Realtime pipeline depth: frames are consumed as soon as their result
    # copy lands (issued at dispatch time on the fetch pool, utils/fetch.py
    # — one link round trip is ~30-55ms and overlaps frames of host work).
    # The frame loop only BLOCKS beyond `rt_stall_depth` in-flight frames:
    # the pipeline's depth self-tunes to the link latency (a ~40ms round
    # trip at ~5ms of host work per frame settles near 8 deep) and a link
    # stall tail (100-500ms events, docs/PERF.md) absorbs into queue depth
    # instead of stalling every subsequent frame — the round-3 headline's
    # 2x run-to-run swing was exactly this structural exposure. With
    # dispatch-time keyframe decisions (rt_dispatch_kf) depth no longer
    # distorts KF cadence; the binding constraint is now the IMU
    # PREVIEW's dead-reckoning horizon: the dispatch-time tracker prior
    # propagates from the last CONSUMED frame through every pending
    # chunk, so the queue depth bounds how long the prior runs on IMU
    # alone. 24 frames ≈ 1.2 s — about where inertial dead-reckoning
    # stays a useful prior, and exactly the measured stall-tail maximum.
    # Measured round 5 (same code, real TPU): depth 24 ran clean at
    # 28.3 fps with se3 1.0%; depth 64 lost tracking and reset on every
    # bad-weather run (3+ s IMU-only priors under stall) — a prediction-
    # physics bound, not the round-4 decision-lag bound (that mechanism
    # is gone: the legacy consume-decision control at depth 64 collapses
    # via KF cadence instead, docs/PERF.md).
    rt_stall_depth: int = 24
    # Make the keyframe decision at DISPATCH time from the newest LANDED
    # tracker stats extrapolated by their measured per-frame growth rate
    # (plus the incremental IMU preview for the keyframe's own state),
    # instead of at consume time from the frame's fetched stats. The
    # keyframe's device half (insert, activate, BA, fused tail, tracker
    # ref) runs IN the dispatch stream from the deciding frame's own
    # device arrays — so a link stall can no longer delay the reference
    # switch, every subsequent frame tracks against the newest reference
    # (no stale-reference redispatch at all), and trace ordering matches
    # the serial pipeline exactly. The reference tolerates the same
    # lateness class across its mapping-thread handoff
    # (FullSystem.cpp:1124-1320). False restores the round-4 consume-time
    # decisions.
    rt_dispatch_kf: bool = True
    # Density factor of the DISPATCH-TIME keyframe score (multiplies
    # kf_weight; only the rt_dispatch_kf path reads it). That path uses
    # the reference's RMS-flow semantics (FullSystem.cpp:1052-1054 —
    # linear in baseline, which the rate extrapolation requires), whose
    # crossing at factor 1.0 is ~25 px of flow: measured on the 512x512
    # TPU bench sequence that loses tracking between keyframes under
    # aggressive motion (9-frame loss streaks), while 2.0 (~12.5 px)
    # ran 340 frames with zero losses/resets and stable map density.
    # The serial/batch path keeps its original squared-flow crossing
    # (unchanged since round 1; every batch basin is tuned against it).
    rt_kf_density: float = 2.0
    # When a keyframe decision fires while the PREVIOUS keyframe's host
    # half is still crossing the link, wait up to this many seconds for
    # it before stretching the interval. One RTT-class wait (~40 ms) per
    # keyframe is cheap; without it, full-speed dispatch (where one RTT
    # spans ~10 dispatched frames) treats every ordinary round trip as a
    # stall and chronically starves the keyframe cadence (measured on
    # TPU: map death + resets). Genuine stall events (0.3-1.2 s) exceed
    # the wait and stretch as designed.
    rt_kf_wait: float = 0.15
    # Bound on the stretch: once the predicted score exceeds this
    # multiple of the keyframe threshold while the previous finalize is
    # still stuck, BLOCK on it instead of stretching further — under
    # SUSTAINED link weather (a 0.3-1.2 s stall every second, measured)
    # an unbounded stretch lets frames race arbitrarily far past the
    # keyframe need and starves the map in frame space (measured: resets
    # on every bad-weather bench run). Blocking paces the pipeline to
    # the link exactly when the estimator's survival demands it; under
    # camera-rate feeding the stretch still absorbs ~2-4 frames of
    # stall before the bound engages.
    rt_kf_stretch: float = 2.0
    # On a keyframe switch, only the newest rt_redispatch_max in-flight
    # frames are re-tracked against the fresh reference; older ones are
    # consumed as tracked (against the previous reference — geometrically
    # consistent, the reference likewise lets stale-tracked frames
    # through, FullSystem.cpp:978-1002). Default = full redispatch:
    # measured on the 512x512 CLI synthetic (3 seeds), capping at 3 with
    # a deep queue systematically degraded se3 ATE 5.1% -> 11.4% (stale
    # frames starve the trace pool and the IMU init window); the extra
    # tracker dispatches only bite during link-stall bursts, where device
    # time is idle anyway.
    rt_redispatch_max: int = 24
    # Issue device->host result copies from a fetch-thread pool at dispatch
    # time instead of blocking the frame loop (utils/fetch.py). Consume
    # order is unchanged; only the link round trip moves off the critical
    # path.
    async_fetch: bool = True
    # Coarse-tracking energy gate: a candidate's solution is accepted while
    # its per-level energy stays below scale*ref + offset, where ref is a
    # running mean of achieved energies capped at `cap` (the TPU-side
    # stand-in for the reference's per-level coarse cutoff machinery,
    # setting_coarseCutoffTH + achieved-energy bookkeeping,
    # CoarseTracker.cpp:590-660; registered so the knob is tunable).
    track_gate_scale: float = 1.5
    track_gate_offset: float = 0.5
    track_gate_cap: float = 100.0
    # Distributed BA: shard the window's point-axis programs (BA solve,
    # point marginalization) over an n-device jax.sharding.Mesh — the
    # reference's residual-range thread pool (IndexThreadReduce.h:80-146)
    # mapped onto chips. 0/1 = single device; >1 needs that many visible
    # devices (real chips, or --xla_force_host_platform_device_count).
    mesh_devices: int = 0


@dataclasses.dataclass
class FrameShell:
    """Per-processed-frame record for trajectory output.

    Non-KF poses are stored relative to their tracking reference KF and
    composed at output time (the reference's deferred camToWorld evaluation
    through trackingRef, FrameShell.h:52-60)."""

    frame_id: int
    timestamp: float
    ref_kf_id: int                  # keyframe id this pose is relative to
    R_c_ref: np.ndarray             # cam-from-ref (this frame <- ref KF)
    t_c_ref: np.ndarray
    is_kf: bool = False


class Window:
    """Fixed-capacity sliding window of keyframes + active points."""

    def __init__(self, calib: Calib, h: int, w: int, cfg: Config):
        self.cfg = cfg
        self.h, self.w = h, w
        F, P = cfg.f_max, cfg.p_max
        C = ba_solve.cdim(F)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (F, 3, 3))
        self.frames = BAFrames(
            R_cw=eye, t_cw=jnp.zeros((F, 3), jnp.float32),
            aff=jnp.zeros((F, 2), jnp.float32),
            R0_cw=eye, t0_cw=jnp.zeros((F, 3), jnp.float32),
            aff0=jnp.zeros((F, 2), jnp.float32),
            mask=jnp.zeros((F,), bool),
        )
        self.points = BAPoints(
            host=jnp.zeros((P,), jnp.int32),
            u=jnp.zeros((P,), jnp.float32), v=jnp.zeros((P,), jnp.float32),
            idepth=jnp.ones((P,), jnp.float32),
            idepth_zero=jnp.ones((P,), jnp.float32),
            color=jnp.zeros((P, 8), jnp.float32),
            weight=jnp.ones((P, 8), jnp.float32),
            mask=jnp.zeros((P,), bool),
        )
        self.pair_mask = jnp.zeros((F, P), bool)
        self.calib = calib
        self.calib0 = calib.as_vec()
        # Marginalization prior on HOST in float64: Schur complements of
        # large-magnitude information in f32 accumulate indefinite error
        # (see vio_ba.schur_out_np); it is tiny and touched per-KF only.
        self.HM = np.zeros((C, C), np.float64)
        self.bM0 = np.zeros((C,), np.float64)
        prior = np.zeros(C, np.float32)
        prior[:4] = cfg.calib_prior
        # prior_diag lives on HOST (numpy): it is mutated/read by host
        # bookkeeping every keyframe; device users receive it via
        # jnp.asarray at problem-build time (h2d transfers are ~free,
        # device fetches are a full tunnel round trip).
        self.prior_diag = prior
        # Level-0 image stacks per slot for BA; full pyramids kept separately.
        self.images = jnp.zeros((F, 3, h, w), jnp.float32)
        self.pyramids: List[Optional[tuple]] = [None] * F
        # Host-side bookkeeping.
        self.slot_frame_id: List[Optional[int]] = [None] * F
        self.kf_count = 0

    # -- host-side mask mirrors ------------------------------------------
    def frame_mask_np(self) -> np.ndarray:
        return np.asarray(self.frames.mask)

    def point_mask_np(self) -> np.ndarray:
        return np.asarray(self.points.mask)

    def free_frame_slot(self) -> int:
        """First unoccupied slot (host truth: slot_frame_id)."""
        for s, fid in enumerate(self.slot_frame_id):
            if fid is None:
                return s
        raise RuntimeError("window full: marginalize before inserting")

    def newest_slot(self) -> int:
        ids = [(-1 if i is None else i) for i in self.slot_frame_id]
        return int(np.argmax(ids))

    def slots_by_age(self):
        """Occupied slots, oldest first (host truth, no device fetch)."""
        occ = [(fid, s) for s, fid in enumerate(self.slot_frame_id)
               if fid is not None]
        return [s for _, s in sorted(occ)]

    # -- mutations -------------------------------------------------------
    def insert_frame(self, slot: int, frame_id: int, pyr: tuple,
                     R_cw, t_cw, aff) -> None:
        self.frames, self.images, self.pair_mask = window_ops.insert_frame(
            self.frames, self.images, self.pair_mask, self.points.mask,
            slot, pyr[0], jnp.asarray(R_cw), jnp.asarray(t_cw),
            jnp.asarray(aff))
        self.pyramids[slot] = pyr
        self.slot_frame_id[slot] = frame_id
        self.kf_count += 1

    def set_fej_to_current(self, slot: int) -> None:
        """Move a frame's linearization point to its current state
        (reference setEvalPT, FullSystemOptimize.cpp:596)."""
        self.frames = window_ops.set_fej_current(self.frames, slot)

    def add_points(self, hosts, u, v, idepth, color, weight, valid,
                   score=None) -> None:
        """Admit candidate points into free slots (device rank-matching)."""
        if score is None:
            score = jnp.ones_like(jnp.asarray(u))
        self.points, self.pair_mask, _ = window_ops.admit_points(
            self.points, self.pair_mask, self.frames.mask,
            jnp.asarray(hosts, jnp.int32), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(idepth), jnp.asarray(color), jnp.asarray(weight),
            jnp.asarray(valid), jnp.asarray(score))

    def drop_points(self, drop) -> None:
        self.points, self.pair_mask = window_ops.drop_points_mask(
            self.points, self.pair_mask, jnp.asarray(drop))

    def drop_frame(self, slot: int) -> None:
        """Clear a slot after its information is in the prior."""
        self.frames, self.pair_mask = window_ops.drop_frame_slot(
            self.frames, self.pair_mask, slot)
        self.pyramids[slot] = None
        self.slot_frame_id[slot] = None

    def frame_prior_into_HM(self, slot: int) -> None:
        """Move a frame's diagonal prior into HM before frame
        marginalization (zero convention: b contribution is zero at FEJ)."""
        i0 = ba_solve.CPART + 8 * slot
        pr = np.asarray(self.prior_diag).copy()
        blk = pr[i0:i0 + 8].copy()
        if blk.any():
            idx = np.arange(i0, i0 + 8)
            self.HM[idx, idx] += blk
            pr[i0:i0 + 8] = 0.0
            self.prior_diag = pr

    def set_frame_prior(self, slot: int, pose_prior: float,
                        aff_a_prior: float, aff_b_prior: float) -> None:
        i0 = ba_solve.CPART + 8 * slot
        pr = np.asarray(self.prior_diag).copy()
        pr[i0:i0 + 6] = pose_prior
        pr[i0 + 6] = aff_a_prior
        pr[i0 + 7] = aff_b_prior
        self.prior_diag = pr
