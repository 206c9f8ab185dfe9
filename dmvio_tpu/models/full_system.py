"""Visual odometry pipeline orchestrator.

TPU-native re-design of FullSystem (src/dso/FullSystem/FullSystem.cpp:
addActiveFrame :882, trackNewCoarse :300, makeKeyFrame :1337,
makeNonKeyFrame :1322, initializeFromInitializer :1543, activatePointsMT
:604, traceNewCoarse :541, flagFramesForMarginalization
FullSystemMarginalize.cpp:61). Host Python is ONLY control flow and slot
bookkeeping; every compute step is one of a fixed set of jitted programs
with static shapes (pyramid, track, trace, activate, BA optimize,
marginalize), so nothing recompiles after the first keyframe.

Non-realtime ("linearizeOperation", main_dmvio_dataset.cpp:122) semantics:
each frame is processed to completion before the next. The IMU-coupled
variant plugs in at the tracking and BA seams (see models/coarse_imu.py /
models/ba_imu.py once built).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import ba, coarse_tracker, initializer, window
from dmvio_tpu.models import imu_system, vio_ba, vio_coarse
from dmvio_tpu.ops import ba_solve, immature, interp, pyramid, select
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import fetch, lie
from dmvio_tpu.utils.camera import Calib, PATTERN
from dmvio_tpu.utils.timing import TimeMeasurement


from dmvio_tpu.models import window_ops
from dmvio_tpu.models.window_ops import (pattern_colors as _pattern_colors,
                                         project_into as _project_into)


@jax.jit
def _trace_jit(imm, frames, R_cw, t_cw, aff_new, level0, calib):
    """Host-state gather + trace fused into one dispatch."""
    R_h = frames.R_cw[imm.host]
    t_h = frames.t_cw[imm.host]
    aff_h = frames.aff[imm.host]
    return immature.trace(imm, R_h, t_h, aff_h, R_cw, t_cw, aff_new,
                          level0, calib)


_make_ref_jit = jax.jit(coarse_tracker.make_tracker_ref)


@jax.jit
def _guard_kf_pose(anyv, R, t, aff, R_fb, t_fb, aff_fb):
    """Keyframe pose guard for dispatch-time KF builds: tracking validity
    is a device scalar the host has not seen yet, so select between the
    solved pose and a fallback (the last VALID pose; the reference KF's
    affine) on device. A diverged solve must never seed the window."""
    ok = anyv > 0.5
    return (jnp.where(ok, R, R_fb), jnp.where(ok, t, t_fb),
            jnp.where(ok, aff, aff_fb))


@jax.jit
def _carry_valid_pose(anyv, R, t, aff, R_prev, t_prev, aff_prev):
    """Device-carried newest VALID absolute pose: updated per frame from
    the packed validity flag, so the keyframe guard's fallback is never a
    diverged solve. (Measured failure without it: a loss streak fed the
    previous frame's DIVERGED pose into a dispatch-time keyframe — the
    poisoned reference then failed every subsequent track until a full
    reset, docs/PERF.md round-5 weather notes.)"""
    ok = anyv > 0.5
    return (jnp.where(ok, R, R_prev), jnp.where(ok, t, t_prev),
            jnp.where(ok, aff, aff_prev))


class TrackInfo(NamedTuple):
    ok: bool
    flow_t: float
    flow_rt: float
    energy: float


class FullSystem:
    """Monocular visual(-inertial) odometry.

    Pass `imu_calib` to enable the inertial stack: IMU-aided coarse
    tracking, coarse IMU init, and joint visual-inertial BA (the seams the
    reference wires through IMUIntegration, IMUIntegration.hpp:66-204)."""

    def __init__(self, calib: Calib, h: int, w: int,
                 cfg: Optional[window.Config] = None,
                 imu_calib: Optional[imu_system.IMUCalib] = None):
        self.cfg = cfg or window.Config()
        # Cap pyramid depth so the coarsest level keeps enough pixels to
        # constrain a pose (the reference's coarsest is 20x15 at VGA,
        # settings.h pyramid setup): a 8x6 top level can swing the
        # coarse-to-fine ladder into an arbitrary basin — measured, a
        # 6-level ladder on 192-row images produced a 71-degree tracking
        # divergence that a 5-level one does not.
        while self.cfg.levels > 1 and \
                (min(h, w) >> (self.cfg.levels - 1)) < 12:
            self.cfg.levels -= 1
        self.imu = (imu_system.IMUSystem(imu_calib, self.cfg.f_max)
                    if imu_calib is not None else None)
        if self.imu is not None:
            # Realtime mode runs PGBA on a background thread (the
            # reference's RealtimePGBAState); non-RT stays deterministic.
            self.imu.pgba_background = bool(self.cfg.realtime)
        self.calib = calib
        self.h, self.w = h, w
        self.win = window.Window(calib, h, w, self.cfg)
        self.imm = immature.empty_pool(self.cfg.i_max)
        self.init = initializer.VisualInitializer(
            calib, h, w, n_points=min(1024, self.cfg.p_max),
            levels=self.cfg.levels,
        )
        self.initialized = False
        self.is_lost = False
        self.frame_id = 0
        self.first_id = 0
        self.shells: List[window.FrameShell] = []
        self.kf_poses = {}          # frame_id -> (R_cw, t_cw) numpy
        self.tracker_ref = None
        self.ref_kf_slot = -1
        self.ref_kf_id = -1
        # Host-side caches of the reference KF pose/affine (avoid per-frame
        # device syncs; refreshed on every tracker-ref rebuild).
        self.ref_pose_np = (np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32))
        self.ref_aff_np = np.zeros(2, np.float32)
        # Constant-velocity model state (all relative to current ref KF).
        self.T_last_ref = (np.eye(3, dtype=np.float32),
                           np.zeros(3, np.float32))
        self.motion = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        self.last_rho = 0.0
        self.last_b = 0.0
        self.track_energy_ref = 1.0   # running mean of achieved track energy
        self._n_active = 0.0          # density estimate (lagged one KF)
        self.stats_kf = 0
        self.stats_lost_frames = 0
        self.stats_resets = 0
        self._consec_lost = 0
        # Observer chain (reference Output3DWrapper, Output3DWrapper.h:144).
        self.output_wrappers = []
        self._published_status = -1
        self._rt_queue = []       # in-flight frames (realtime pipeline)
        self._kf_finalize = None  # deferred keyframe tail (realtime)
        # Fetch pool: device->host copies cost a fixed ~30-55ms round trip
        # on the TPU link; issuing them from worker threads at DISPATCH
        # time overlaps that latency with the host's consume/bookkeeping
        # work (utils/fetch.py). Width covers the full stall-depth queue
        # plus keyframe/PGBA fetches, or queued copies re-serialize.
        self._fetcher = fetch.AsyncFetcher(
            enabled=self.cfg.async_fetch,
            workers=self.cfg.rt_stall_depth + 8)
        self._last_pose_dev = None   # device pose history for candidates
        self._prev_pose_dev = None
        self._valid_pose_dev = None  # newest VALID pose (KF-guard fallback)
        self._last_exposure = None   # previous frame's shutter time
        self._frame_th_dev = None    # adaptive energy thresholds (device)
        self._frame_th_np = None     # ... host mirror (fused-tail fetch)
        self._rt_chunks_since_kf = None  # replay buffer (deferred VIO KF)
        # Dispatch-time keyframe decision state (Config.rt_dispatch_kf):
        # the newest LANDED tracker score for the current reference epoch
        # plus an EMA of its per-frame growth rate. Landed stats are
        # PEEKED from in-flight futures without consuming them, so the
        # decision never waits on the link.
        self._kf_score_meas = None     # (fid, score) newest landed, this epoch
        self._kf_score_rate = 0.0      # EMA d(score)/d(frame), persists epochs
        self._kf_epoch_fid = -1        # fid at which the current ref epoch began
        # Frame id the authoritative coarse IMU belief sits at. Needed by
        # the dispatch-decision mode, where a keyframe finalize can move
        # the belief AHEAD of the consume position (the keyframe was built
        # at dispatch): consuming an older frame must then neither
        # re-advance nor fuse into the belief.
        self._belief_fid = -1
        # Distributed BA: the point-axis programs (window BA, point
        # marginalization) run sharded over a device mesh; everything else
        # stays on the home device (parallel/dist_ba.Placer).
        self.placer = None
        from dmvio_tpu.parallel import dist_init
        if dist_init.is_multiprocess():
            # Multi-host runtime (jax.distributed): every process runs
            # this same host pipeline; the mesh spans the whole slice
            # (dp axis across processes/DCN) regardless of mesh_devices.
            from dmvio_tpu.parallel import dist_ba
            self.placer = dist_ba.Placer(dist_ba.make_mesh(0))
        elif self.cfg.mesh_devices and self.cfg.mesh_devices > 1:
            from dmvio_tpu.parallel import dist_ba
            self.placer = dist_ba.Placer(
                dist_ba.make_mesh(self.cfg.mesh_devices))

    # ------------------------------------------------------------------
    def add_frame(self, img: jnp.ndarray, timestamp: float,
                  imu_data=None, exposure: float = 1.0) -> None:
        """Feed one photometrically-corrected [H, W] image.

        imu_data: optional (acc [N,3], gyr [N,3], dts [N]) measurements
        since the previous frame (addActiveFrame's imuData argument).
        exposure: shutter time of this frame (seconds or any consistent
        unit; 1.0 = unknown/constant)."""
        fid = self.frame_id
        self.frame_id += 1
        # Exposure-relative brightness model (AffLight::fromToVecExposure,
        # NumType.h:174; used throughout tracking, CoarseTracker.cpp:306):
        # the KNOWN log-exposure ratio shifts every log-gain seed — the
        # constant-brightness prediction, the initializer's warm starts —
        # so the estimators only absorb the residual (unknown) gain. The
        # per-frame affine states themselves stay total-gain (exposure
        # included), which keeps every residual/Jacobian unchanged.
        e_exp = max(float(exposure), 1e-6)
        if self._last_exposure is not None and e_exp != self._last_exposure:
            dlog = float(np.log(e_exp) - np.log(self._last_exposure))
            self.last_rho += dlog
            if not self.initialized:
                self.init.shift_rho(dlog)
        self._last_exposure = e_exp
        if self.imu is not None and imu_data is not None:
            self.imu.add_frame_imu(*imu_data, fid=fid)
        with TimeMeasurement("pyramid"):
            pyr = tuple(pyramid.build_pyramid_jit(img, levels=self.cfg.levels))

        if fid == self.first_id:
            self.init.set_first(pyr)
            self._first_pyr = pyr
            self._first_ts = timestamp
            self.shells.append(window.FrameShell(
                frame_id=fid, timestamp=timestamp, ref_kf_id=fid,
                R_c_ref=np.eye(3), t_c_ref=np.zeros(3), is_kf=True))
            return

        if not self.initialized:
            r = self.init.try_init(pyr)
            self.shells.append(window.FrameShell(
                frame_id=fid, timestamp=timestamp, ref_kf_id=self.first_id,
                R_c_ref=np.asarray(self.init.last_R),
                t_c_ref=np.asarray(self.init.last_t)))
            if r is not None:
                self._initialize(r, pyr, timestamp, fid)
            elif fid - self.first_id > 60:
                # Give up and restart from the current frame (the reference
                # resets after a timeout, FullSystem.cpp:959-963).
                self.first_id = fid
                self.init.set_first(pyr)
                self._first_pyr = pyr
                self._first_ts = timestamp
                self.shells[-1] = window.FrameShell(
                    frame_id=fid, timestamp=timestamp, ref_kf_id=fid,
                    R_c_ref=np.eye(3), t_c_ref=np.zeros(3), is_kf=True)
            return

        if self.cfg.realtime:
            # Pipelined mode, visual AND inertial: per-frame tracking is
            # dispatched immediately and consumed a frame later; the coarse
            # IMU filter advances at consume time while dispatch-time
            # predictions come from a non-mutating preview through the
            # in-flight chunks (the reference runs the full inertial stack
            # through its two-thread pipeline too, FullSystem.cpp:1124-1320,
            # IMUIntegration.cpp:228-330).
            self._rt_frame(pyr, timestamp, fid)
            return

        # ---- tracking front-end ----
        with TimeMeasurement("coarse_tracking"):
            res, pk, need_kf = self._track_frame(pyr)
        self.shells.append(window.FrameShell(
            frame_id=fid, timestamp=timestamp, ref_kf_id=self.ref_kf_id,
            R_c_ref=pk.R.copy(), t_c_ref=pk.t.copy()))

        # Absolute pose on DEVICE (trace dispatch never waits on a fetch);
        # the host mirrors it from the packed stats + cached ref pose.
        R_cw, t_cw, aff_new = window_ops.compose_abs_pose(
            res.R, res.t, res.rho, res.b_aff, self.win.frames,
            self.ref_kf_slot)

        with TimeMeasurement("trace"):
            self._trace_pool(R_cw, t_cw, aff_new, pyr)

        if self.imu is not None:
            R_cw_np = pk.R @ self.ref_pose_np[0]
            t_cw_np = pk.R @ self.ref_pose_np[1] + pk.t
            if self.imu.phase == imu_system.ACTIVE:
                # Fold the visual evidence into the coarse belief and move
                # its center to the tracked state (addVisualToCoarseGraph).
                self.imu.fuse_tracked(pk.H_vis, R_cw_np, t_cw_np,
                                      pk.v, pk.bias)
            else:
                self.imu.record_init_pose(fid, self.ref_kf_id,
                                          pk.R, pk.t, R_cw_np,
                                          H_vis=pk.H_vis)

        if self.output_wrappers:
            R_np = pk.R @ self.ref_pose_np[0]
            t_np = pk.R @ self.ref_pose_np[1] + pk.t
            from dmvio_tpu.io import output_wrapper as ow
            status = (ow.VISUAL_INERTIAL if self._vio_mode()
                      else ow.VISUAL_ONLY)
            for w_ in self.output_wrappers:
                w_.publish_cam_pose(fid, timestamp, R_np, t_np)
                if status != self._published_status:
                    w_.publish_system_status(status)
            self._published_status = status

        if need_kf and not self.is_lost:
            # Never build a keyframe from an untracked pose — a garbage KF
            # poisons the window beyond recovery (the reference aborts the
            # run on isLost; we keep predicting and retry instead).
            with TimeMeasurement("keyframe_total"):
                self._make_keyframe(pyr, timestamp, fid, R_cw, t_cw, aff_new)

        # Algorithmic self-reset (the reference's fullResetRequested,
        # main_dmvio_dataset.cpp:262-277): a dead map or sustained loss is
        # unrecoverable in-window — rebuild from the current frame, keeping
        # the trajectory so far.
        self._consec_lost = self._consec_lost + 1 if self.is_lost else 0
        map_dead = self.initialized and self._n_active < 25 \
            and self.stats_kf > 3
        if map_dead or self._consec_lost > 8:
            self._full_reset(pyr, timestamp, fid)

    # ------------------------------------------------------------------
    # Realtime (pipelined) mode: the reference's two-thread track/map
    # pipeline (deliverTrackedFrame/mappingLoop, FullSystem.cpp:1124-1320)
    # becomes a one-frame-deep software pipeline: each frame's front-end is
    # DISPATCHED immediately (track + trace, all device-side), and its
    # results are CONSUMED when the next frame arrives — by then the packed
    # stats have been async-copied to the host, so the per-frame tunnel
    # round trip overlaps the next frame's device compute. Keyframes are
    # created one frame late; subsequent frames keep tracking against the
    # old reference until the switch (the reference's tracker
    # double-buffering, FullSystem.cpp:978-1002).
    def _rt_frame(self, pyr, ts, fid) -> None:
        # Inertial dispatch-time state: the frame's own chunk snapshot plus
        # a preview belief propagated through every unconsumed chunk (the
        # authoritative filter sits at the last consumed frame).
        imu_chunk = None
        prior = None
        v_init = None
        bias_init = None
        pred_pose = None
        preview = None
        if self.imu is not None:
            imu_chunk = self.imu.frame_chunk()
            # Only chunks AHEAD of the authoritative belief: after a
            # dispatch-time keyframe finalize the belief can sit at the
            # keyframe while older frames are still unconsumed in the
            # queue — their chunks are already inside the belief.
            pending = [q["imu_chunk"]["pre_np"]
                       if q.get("imu_chunk") else None
                       for q in self._rt_queue
                       if q["fid"] > self._belief_fid]
            pending.append(imu_chunk["pre_np"] if imu_chunk else None)
            # Preview horizon cap: past ~0.6 s of IMU-only propagation
            # (a stalled link backs consumption up) the dead-reckoned
            # prior is worse than no prior — it SINKS the joint solve
            # where the visual-only candidate ladder still tracks
            # (measured under sustained weather: the VIO path lost 29
            # frames and reset 3x while the prior-less VO control on the
            # same link ran clean). Track visually until the belief
            # catches back up.
            preview = (self.imu.predict_preview(pending)
                       if len(pending) <= 12 else None)
            if preview is not None and self._kf_finalize is not None \
                    and self._kf_finalize.get("ref_pose_approx") is None:
                # Deferred keyframe without a host-expressible reference
                # pose (built before the preview chain was available):
                # the prior cannot be phrased against the new reference —
                # track this frame unassisted rather than against a stale
                # pose.
                preview = None
            if preview is not None:
                # Host ref pose: fresh after finalize; while a deferred
                # keyframe's optimized pose is still in flight, its
                # TRACKED (pre-BA, or IMU-predicted for dispatch-time
                # keyframes) pose stands in — the BA correction is 1-2
                # degrees, well inside the prior's tolerance.
                if self._kf_finalize is not None:
                    R_ref, t_ref = self._kf_finalize["ref_pose_approx"]
                else:
                    R_ref, t_ref = self.ref_pose_np
                R_rel = preview.R_cw @ np.asarray(R_ref, np.float64).T
                t_rel = preview.t_cw - R_rel @ np.asarray(t_ref, np.float64)
                pred_pose = (R_rel.astype(np.float32),
                             t_rel.astype(np.float32))
                prior = vio_coarse.make_tracker_prior(
                    preview, np.asarray(R_ref, np.float64),
                    np.asarray(t_ref, np.float64),
                    float(self.last_rho), float(self.last_b))
                v_init = jnp.asarray(preview.v, jnp.float32)
                bias_init = jnp.asarray(preview.bias, jnp.float32)
        if self._last_pose_dev is not None \
                and self._prev_pose_dev is not None:
            # Candidates from DEVICE pose history: dispatch never waits on
            # a pose fetch, so a deferred keyframe's finalize can ride the
            # next drain's fetch instead of gating this dispatch.
            R_c, t_c, mask_c = window_ops.track_candidates(
                *self._last_pose_dev, *self._prev_pose_dev,
                self.win.frames, self.ref_kf_slot)
            if pred_pose is not None:
                # IMU prediction takes the pad slot of the fixed [4] batch.
                R_c = R_c.at[3].set(jnp.asarray(pred_pose[0]))
                t_c = t_c.at[3].set(jnp.asarray(pred_pose[1]))
                mask_c = mask_c.at[3].set(True)
        else:
            # Cold start (right after init/reset): host caches are fresh.
            self._finalize_kf()
            mR, mt = self.motion
            lR, lt = self.T_last_ref
            R_h = np.zeros((4, 3, 3), np.float32)
            t_h = np.zeros((4, 3), np.float32)
            m_h = np.zeros(4, bool)
            R_h[0] = np.eye(3)
            R_h[1] = mR @ lR
            t_h[1] = mR @ lt + mt
            R_h[2] = lR
            t_h[2] = lt
            R_h[3] = np.eye(3)
            m_h[1:] = True
            if pred_pose is not None:
                R_h[0], t_h[0] = pred_pose
                m_h[0] = True
            R_c, t_c, mask_c = (jnp.asarray(R_h), jnp.asarray(t_h),
                                jnp.asarray(m_h))
        gate = (self.cfg.track_gate_scale * self.track_energy_ref
                + self.cfg.track_gate_offset)
        res, packed = coarse_tracker.track_multi_jit(
            self.tracker_ref, pyr, self.calib,
            R_c, t_c, mask_c,
            jnp.asarray(self.last_rho, jnp.float32),
            jnp.asarray(self.last_b, jnp.float32),
            jnp.asarray(gate, jnp.float32), levels=self.cfg.levels,
            prior=prior, v_init=v_init, bias_init=bias_init)
        # NOTE: no copy_to_host_async here — under the axon TPU tunnel its
        # first use stalls the process for minutes (measured 86-600s), and
        # when it does not stall it buys nothing over a settled device_get
        # (~30ms round trip). The pipeline overlaps the round trip with the
        # next frame's dispatches instead.
        R_cw, t_cw, aff_new = window_ops.compose_abs_pose(
            res.R, res.t, res.rho, res.b_aff, self.win.frames,
            self.ref_kf_slot)
        # Device pose history for the next frame's candidate batch.
        self._prev_pose_dev = self._last_pose_dev or (R_cw, t_cw)
        self._last_pose_dev = (R_cw, t_cw)
        # Newest VALID pose (device-carried; keyframe-guard fallback).
        if self._valid_pose_dev is None:
            self._valid_pose_dev = (
                self.win.frames.R_cw[self.ref_kf_slot],
                self.win.frames.t_cw[self.ref_kf_slot],
                self.win.frames.aff[self.ref_kf_slot])
        self._valid_pose_dev = _carry_valid_pose(
            packed[-1], R_cw, t_cw, aff_new, *self._valid_pose_dev)
        imm_before = self.imm     # pre-trace pool (device refs: free)
        with TimeMeasurement("trace"):
            self._trace_pool(R_cw, t_cw, aff_new, pyr)
        self.shells.append(window.FrameShell(
            frame_id=fid, timestamp=ts, ref_kf_id=self.ref_kf_id,
            R_c_ref=np.eye(3), t_c_ref=np.zeros(3)))
        self._rt_queue.append(dict(
            fid=fid, ts=ts, pyr=pyr, packed=packed,
            ref_kf_id=self.ref_kf_id,
            # A mid-flight keyframe switch means this frame tracked
            # against a reference whose pose has not reached the host:
            # record None and let _finalize_kf patch it.
            ref_pose=(None if self._kf_finalize is not None
                      else self.ref_pose_np),
            shell_idx=len(self.shells) - 1,
            R_cw=R_cw, t_cw=t_cw, aff=aff_new, imm_before=imm_before,
            imu_chunk=imu_chunk, had_prior=prior is not None,
            # Start the host copy NOW: by the time this frame is consumed
            # (one frame later) the round trip has landed.
            future=self._fetcher.submit(packed)))
        if self.cfg.rt_dispatch_kf:
            self._dispatch_kf_maybe(fid, preview)
        self._rt_drain(keep_last=True)

    def _rt_drain(self, keep_last: bool) -> None:
        """Consume in-flight frames whose host copies have landed, oldest
        first. The copies were issued at dispatch time (one per frame, on
        the fetch pool); the pipeline depth self-tunes to the link round
        trip and this only BLOCKS when it exceeds rt_stall_depth frames
        (see window.Config) or on a full flush — so neither the steady
        ~30-55ms round trip nor a 100-500ms stall tail sits on the
        per-frame critical path. keep_last leaves the newest frame in
        flight (the steady-state minimum pipeline depth)."""
        keep = 1 if keep_last else 0
        cap = max(self.cfg.rt_stall_depth, keep) if keep_last else 0
        while len(self._rt_queue) > keep:
            p = self._rt_queue[0]
            if len(self._rt_queue) <= cap and not p["future"].done():
                break
            if p.get("ref_pose") is None and len(self._rt_queue) <= cap \
                    and self._kf_finalize is not None \
                    and not self._kf_finalize["future"].done():
                # This frame needs the deferred keyframe's host half,
                # whose copy is still crossing the link (a stall): defer
                # rather than block the frame loop on the fetch.
                break
            with TimeMeasurement("track_fetch"):
                arr = p["future"].result()
            if p.get("ref_pose") is None:
                # Tracked against a reference whose pose is still in
                # flight: finalize the deferred keyframe first (its copy
                # rides the second fetch worker). The patch loop inside
                # must see this entry, so pop only afterwards.
                self._finalize_kf()
                if not self._rt_queue or self._rt_queue[0] is not p:
                    # Finalize detected a failed init and reset the map;
                    # this frame (and the rest of the queue) died with it.
                    continue
            self._rt_queue.pop(0)
            self._rt_consume(p, arr)

    # -- dispatch-time keyframe decisions (Config.rt_dispatch_kf) --------
    def _kf_score_of(self, flow_t: float, flow_rt: float,
                     rho: float) -> float:
        """Dispatch-decision KF score: the reference's RMS-flow
        semantics (FullSystem.cpp:1052-1054 applies sqrtf, so the score
        is LINEAR in baseline — which the rate extrapolation requires),
        scaled by rt_kf_density (see window.Config). The serial/batch
        path keeps its original squared-flow crossing in _track_frame —
        every batch accuracy basin since round 1 is tuned against it."""
        cfg = self.cfg
        return cfg.kf_weight * cfg.rt_kf_density * (
            cfg.w_flow_t * np.sqrt(max(flow_t, 0.0)) / (self.w + self.h)
            + cfg.w_flow_rt * np.sqrt(max(flow_rt, 0.0)) / (self.w + self.h)
            + cfg.w_aff * abs(rho))

    def _peek_landed_scores(self) -> None:
        """Feed the dispatch-decision score state from in-flight futures
        whose copies have LANDED, without consuming them (done futures
        hold host arrays — no link traffic). Under async_fetch=False
        every future resolves at submit, so the peek sees every frame's
        measured score in order and the decision is bit-deterministic —
        the regime the accuracy tests run in; on the live link the peek
        lags by the round trip and the extrapolation covers the rest."""
        for p in self._rt_queue:
            if p.get("score_noted") or not p["future"].done():
                continue
            try:
                arr = p["future"].result()
            except Exception:   # noqa: BLE001 — consume path will handle
                p["score_noted"] = True
                continue
            self._note_score(
                p, coarse_tracker.PackedTrack(arr, self.cfg.levels))

    def _note_score(self, p, pk) -> None:
        """Update the dispatch-decision score state from one frame's
        measured stats (called from the dispatch-time peek and, for
        frames whose copy landed late, from consume)."""
        if p.get("score_noted"):
            return
        p["score_noted"] = True
        if not pk.any_valid or p["ref_kf_id"] != self.ref_kf_id:
            return              # measured against a replaced reference
        score = self._kf_score_of(pk.flow_t, pk.flow_rt, pk.rho)
        prev = self._kf_score_meas
        # Rate from ABSOLUTE growth since the reference switch (the score
        # is ~0 there and LINEAR in baseline with the RMS-flow
        # semantics): every landed frame is an observation, robust to
        # lag; the first observation seeds the EMA directly (a
        # zero-seeded EMA underestimates for many keyframes and starves
        # the map).
        d_epoch = p["fid"] - self._kf_epoch_fid
        if d_epoch > 0:
            obs = score / d_epoch
            if self._kf_score_rate <= 0.0:
                self._kf_score_rate = obs
            else:
                self._kf_score_rate = (0.5 * self._kf_score_rate
                                       + 0.5 * obs)
        if prev is None or p["fid"] > prev[0]:
            self._kf_score_meas = (p["fid"], score)

    def _dispatch_kf_maybe(self, fid: int, preview) -> None:
        """Decide AT DISPATCH TIME whether the just-dispatched frame
        becomes a keyframe, and if so run the keyframe's device half
        immediately from its own device arrays (round-5 re-design;
        docs/PERF.md). The decision extrapolates the newest LANDED score
        by the measured per-frame growth rate, so it needs no fetch; the
        keyframe build itself is dispatch-only. When the PREVIOUS
        keyframe's host half is still crossing the link (a stall), the
        interval stretches — frames keep flowing — and the keyframe is
        built from the then-current frame once the copy lands."""
        if not self.initialized or self.is_lost:
            return
        self._peek_landed_scores()
        meas = self._kf_score_meas
        rate = self._kf_score_rate
        if meas is not None:
            # Newest landed score extrapolated to THIS frame: the same
            # crossing the reference tests (FullSystem.cpp:1052-1054),
            # predicted for the frame the keyframe will actually be built
            # from. Under a link stall the measurement ages and the
            # extrapolation smoothly takes over the cadence instead of
            # pausing keyframes.
            pred = meas[1] + rate * (fid - meas[0])
        else:
            # Fresh epoch with nothing landed yet: ramp from the switch.
            pred = rate * (fid - self._kf_epoch_fid)
        if pred <= 1.0 or fid - self._kf_epoch_fid < 2:
            # The interval floor bounds a transiently over-estimated rate
            # (a score spike would otherwise chain keyframes every frame
            # until real stats land; the reference's cadence is ~3.5).
            return
        kfp = self._kf_finalize
        if kfp is not None and not kfp["future"].done():
            # Previous keyframe's host half still in flight. Wait one
            # RTT-class bound for it — at full-speed dispatch an ordinary
            # round trip spans many dispatched frames and must not read
            # as a stall (measured: treating it as one starves the KF
            # cadence into map death). A genuine stall exceeds the bound
            # and STRETCHES the interval instead of blocking.
            from concurrent.futures import TimeoutError as _FTimeout
            waited = False
            if self.cfg.rt_kf_wait > 0:
                try:
                    with TimeMeasurement("kf_decision_wait"):
                        kfp["future"].exception(timeout=self.cfg.rt_kf_wait)
                    waited = True
                except (_FTimeout, TimeoutError):
                    pass
            if not waited:
                if pred <= self.cfg.rt_kf_stretch:
                    return      # stretch through the stall
                # The stretch bound: the scene has moved well past the
                # keyframe need and the finalize is still stuck — block
                # and pace the pipeline to the link rather than starve
                # the map (see window.Config.rt_kf_stretch).
                with TimeMeasurement("kf_stretch_block"):
                    kfp["future"].exception()
        p = self._rt_queue[-1] if self._rt_queue else None
        if p is None or p["fid"] != fid:
            return
        self._finalize_kf()
        if not self.initialized or not self._rt_queue \
                or self._rt_queue[-1] is not p:
            return              # finalize reset the map under us
        # Tracking validity is unknown at dispatch: guard the keyframe
        # pose on device with the newest VALID pose as fallback (a
        # diverged solve must never seed the window — and during a loss
        # streak the previous frame's pose IS a diverged solve, so the
        # fallback must be the device-carried last-valid pose).
        if self._valid_pose_dev is not None:
            R_fb, t_fb, aff_fb = self._valid_pose_dev
            anyv = p["packed"][-1]
            R_kf, t_kf, aff_kf = _guard_kf_pose(
                anyv, p["R_cw"], p["t_cw"], p["aff"], R_fb, t_fb, aff_fb)
        else:
            R_kf, t_kf, aff_kf = p["R_cw"], p["t_cw"], p["aff"]
        p["is_kf"] = True
        with TimeMeasurement("keyframe_total"):
            if self.imu is not None:
                approx = None
                pred_v = None
                if preview is not None:
                    approx = (np.asarray(preview.R_cw, np.float32),
                              np.asarray(preview.t_cw, np.float32))
                    pred_v = np.asarray(preview.v)
                self._make_keyframe_rt_vio(
                    p["pyr"], p["ts"], p["fid"], R_kf, t_kf, aff_kf,
                    shell_idx=p["shell_idx"], upto_fid=p["fid"],
                    ref_pose_approx=approx, pred_v_override=pred_v)
            else:
                self._make_keyframe_rt(p["pyr"], p["ts"], p["fid"],
                                       R_kf, t_kf, aff_kf,
                                       shell_idx=p["shell_idx"])

    def _rt_consume(self, p, packed_np) -> None:
        """Finish a pipelined frame: host bookkeeping + keyframe decision
        from its (already fetched) packed stats."""
        pk = coarse_tracker.PackedTrack(packed_np, self.cfg.levels)
        if not pk.any_valid:
            # Rescue tracks against the CURRENT reference: make the host
            # caches consistent first if a keyframe switch is mid-flight.
            self._finalize_kf()
            res_r, pk_r = self._rescue_track(p["pyr"])
            if pk_r.any_valid:
                pk = pk_r
                p["ref_pose"] = self.ref_pose_np
                p["ref_kf_id"] = self.ref_kf_id
                p["R_cw"], p["t_cw"], p["aff"] = window_ops.compose_abs_pose(
                    res_r.R, res_r.t, res_r.rho, res_r.b_aff,
                    self.win.frames, self.ref_kf_slot)
                if p.get("had_prior") and self.imu is not None:
                    # The IMU-prior joint solve failed but pure-visual
                    # rescue succeeded: the coarse belief is inconsistent —
                    # reset it; the next keyframe's BA re-seeds it (mutual
                    # vision/IMU fallback, FullSystem.cpp:440-445).
                    self.imu.coarse = None
                    p["had_prior"] = False
        if not pk.any_valid:
            # Lost: report the constant-velocity prediction, never a
            # diverged solve's (possibly non-finite) pose.
            mR, mt = self.motion
            lR, lt = self.T_last_ref
            pk.R = (mR @ lR).astype(np.float32)
            pk.t = (mR @ lt + mt).astype(np.float32)
            pk.rho, pk.b_aff = self.last_rho, self.last_b
            p["ref_pose"] = self.ref_pose_np
            p["ref_kf_id"] = self.ref_kf_id
        R_old, t_old = p["ref_pose"]          # ref pose used at dispatch
        R_cw_np = pk.R @ R_old
        t_cw_np = pk.R @ t_old + pk.t
        self.shells[p["shell_idx"]] = window.FrameShell(
            frame_id=p["fid"], timestamp=p["ts"],
            ref_kf_id=p["ref_kf_id"],
            R_c_ref=pk.R.copy(), t_c_ref=pk.t.copy(),
            # A dispatch-time keyframe marked the shell BEFORE this
            # consume; the replacement must not lose that.
            is_kf=self.shells[p["shell_idx"]].is_kf)
        if pk.any_valid:
            self.is_lost = False
            self.track_energy_ref = min(
                0.7 * self.track_energy_ref
                + 0.3 * float(pk.level_energy[0]), self.cfg.track_gate_cap)
            # Motion model relative to the CURRENT reference (the frame may
            # have been tracked against an older one).
            R_cur, t_cur = self.ref_pose_np
            R_rel = (R_cw_np @ R_cur.T).astype(np.float32)
            t_rel = (t_cw_np - R_rel @ t_cur).astype(np.float32)
            lR, lt = self.T_last_ref
            self.motion = (R_rel @ lR.T, t_rel - R_rel @ lR.T @ lt)
            self.T_last_ref = (R_rel, t_rel)
            self.last_rho = pk.rho
            self.last_b = pk.b_aff
        else:
            self.is_lost = True
            self.stats_lost_frames += 1

        if self.imu is not None:
            # Advance the AUTHORITATIVE coarse belief through this frame's
            # own chunk (the serial path's predict-before-track, replayed
            # at consume time — the filter always sits at the last consumed
            # frame), then fold in the visual evidence exactly as the
            # serial path does (addVisualToCoarseGraph).
            chunk = p.get("imu_chunk")
            advanced = chunk is not None and p["fid"] > self._belief_fid
            if advanced:
                self.imu.predict_coarse(chunk["pre_np"])
                self._belief_fid = p["fid"]
                if self._kf_finalize is not None \
                        and self._rt_chunks_since_kf is not None \
                        and p["fid"] > self._kf_finalize["fid"]:
                    # A deferred keyframe's reseed will rewind the belief
                    # to the keyframe; keep this (post-keyframe) chunk for
                    # the replay. Chunks at or before the keyframe are
                    # inside its optimized state already.
                    self._rt_chunks_since_kf.append(
                        (p["fid"], chunk["pre_np"]))
            if pk.any_valid:
                if self.imu.phase == imu_system.ACTIVE:
                    # Only fuse when the belief actually sits at this
                    # frame: after a dispatch-time keyframe finalize the
                    # belief can be AHEAD of the consume position, and
                    # stale visual evidence must not re-enter it.
                    if p.get("had_prior") and advanced:
                        self.imu.fuse_tracked(pk.H_vis, R_cw_np, t_cw_np,
                                              pk.v, pk.bias)
                elif chunk is not None:
                    self.imu.record_init_pose(p["fid"], p["ref_kf_id"],
                                              pk.R, pk.t, R_cw_np,
                                              chunk=chunk, H_vis=pk.H_vis)

        if self.output_wrappers:
            from dmvio_tpu.io import output_wrapper as ow
            status = (ow.VISUAL_INERTIAL if self._vio_mode()
                      else ow.VISUAL_ONLY)
            for w_ in self.output_wrappers:
                w_.publish_cam_pose(p["fid"], p["ts"], R_cw_np, t_cw_np)
                if status != self._published_status:
                    w_.publish_system_status(status)
            self._published_status = status

        self._note_score(p, pk)
        score = self._kf_score_of(pk.flow_t, pk.flow_rt, pk.rho)
        if score > 1.0 and not self.is_lost \
                and not self.cfg.rt_dispatch_kf:
            # Undo the still-in-flight frames' traces first: they ran
            # against the pre-keyframe window state and are re-issued after
            # the switch (non-RT ordering is trace(N-1) -> KF(N-1) ->
            # trace(N)). Batch-mates already fetched are consumed as-is
            # (the reference likewise lets stale-tracked frames through,
            # coarseTrackerSwapMutex, FullSystem.cpp:978-1002).
            # A previous keyframe from the same drained batch may still be
            # mid-flight — finish it before building another.
            self._finalize_kf()
            # Only the newest rt_redispatch_max in-flight frames re-track
            # against the fresh reference (older ones are consumed as
            # tracked — see window.Config.rt_redispatch_max); rewind the
            # immature pool to just before the first RE-dispatched frame's
            # trace, keeping the older frames' (pre-keyframe, slightly
            # stale) traces.
            n_redispatch = min(len(self._rt_queue),
                               max(self.cfg.rt_redispatch_max, 0))
            redispatch = (self._rt_queue[-n_redispatch:]
                          if n_redispatch else [])
            if redispatch:
                self.imm = redispatch[0]["imm_before"]
            with TimeMeasurement("keyframe_total"):
                if self.imu is not None:
                    # Deferred inertial keyframe: device half now, host
                    # half (f64 priors, delayed log, init machine, PGBA,
                    # coarse reseed) at finalize — the keyframe tail
                    # overlaps in-flight tracking like the reference's
                    # mapping thread (FullSystem.cpp:1124-1320,
                    # IMUIntegration.cpp:228-330). The tracked (pre-BA)
                    # pose of the keyframe serves as the approximate host
                    # ref pose for IMU priors until the optimized pose
                    # lands with the finalize fetch.
                    self._make_keyframe_rt_vio(
                        p["pyr"], p["ts"], p["fid"],
                        p["R_cw"], p["t_cw"], p["aff"],
                        shell_idx=p["shell_idx"], upto_fid=p["fid"],
                        ref_pose_approx=(R_cw_np.astype(np.float32),
                                         t_cw_np.astype(np.float32)))
                else:
                    self._make_keyframe_rt(p["pyr"], p["ts"], p["fid"],
                                           p["R_cw"], p["t_cw"], p["aff"],
                                           shell_idx=p["shell_idx"])
            # Re-issue the newest in-flight frames' tracking against the
            # fresh reference — extra device dispatches, zero extra host
            # syncs (the replacement results are consumed at the next
            # drain). Bounded: at stall depth, redispatching the WHOLE
            # queue would add O(depth) tracker programs of device time per
            # keyframe.
            for q in redispatch:
                # Identity check (dict == would compare device arrays):
                # the keyframe build may have reset/emptied the queue.
                if any(q is x for x in self._rt_queue):
                    self._rt_redispatch(q)
        self._consec_lost = self._consec_lost + 1 if self.is_lost else 0
        map_dead = self.initialized and self._n_active < 25 \
            and self.stats_kf > 3
        if map_dead or self._consec_lost > 8:
            self._full_reset(p["pyr"], p["ts"], p["fid"])

    def _rescue_candidates(self):
        """32-candidate rescue batch: motion variants + the reference's 26
        rotation-perturbed constant-motion initializations ("just try a TON
        of different initializations", FullSystem.cpp:369-399; rotDelta =
        0.02 quaternion component ~ 0.04 rad)."""
        from dmvio_tpu.models.vio_coarse import _exp_so3, _log_so3
        mR, mt = self.motion
        lR, lt = self.T_last_ref
        cv_R, cv_t = mR @ lR, mR @ lt + mt
        w_half = _log_so3(np.asarray(mR, np.float64)) * 0.5
        R_half = _exp_so3(w_half).astype(np.float32)
        cands = [
            (cv_R, cv_t),                                  # const motion
            (mR @ cv_R, mR @ cv_t + mt),                   # double motion
            (R_half @ lR, R_half @ lt + 0.5 * mt),         # half motion
            (lR, lt),                                      # zero motion
            (np.eye(3, dtype=np.float32),
             np.zeros(3, np.float32)),                     # zero from KF
        ]
        delta = 0.04
        for sx in (-1, 0, 1):
            for sy in (-1, 0, 1):
                for sz in (-1, 0, 1):
                    if sx == sy == sz == 0:
                        continue
                    dR = _exp_so3(delta * np.array(
                        [sx, sy, sz], np.float64)).astype(np.float32)
                    cands.append((cv_R @ dR, cv_t))
        C = 32
        R_c = np.zeros((C, 3, 3), np.float32)
        t_c = np.zeros((C, 3), np.float32)
        mask_c = np.zeros(C, bool)
        for k, (R0, t0) in enumerate(cands[:C]):
            R_c[k] = R0
            t_c[k] = t0
            mask_c[k] = True
        return R_c, t_c, mask_c

    def _rescue_track(self, pyr):
        """Last-resort tracking attempt with the big perturbation batch
        (one extra dispatch + sync; only runs when the primary candidates
        all failed). Returns (res, pk)."""
        R_c, t_c, mask_c = self._rescue_candidates()
        gate = (self.cfg.track_gate_scale * self.track_energy_ref
                + self.cfg.track_gate_offset)
        res, packed = coarse_tracker.track_multi_jit(
            self.tracker_ref, pyr, self.calib,
            jnp.asarray(R_c), jnp.asarray(t_c), jnp.asarray(mask_c),
            jnp.asarray(self.last_rho, jnp.float32),
            jnp.asarray(self.last_b, jnp.float32),
            jnp.asarray(gate, jnp.float32), levels=self.cfg.levels)
        pk = coarse_tracker.PackedTrack(jax.device_get(packed),
                                        self.cfg.levels)
        return res, pk

    def _rt_redispatch(self, p) -> None:
        """Re-track the in-flight frame against the (just switched)
        tracking reference, replacing its pending results in place.

        The new reference's pose has NOT reached the host yet (deferred
        keyframe): the candidate batch is computed ON DEVICE from the
        in-flight frame's own absolute pose + the new KF's window pose
        (window_ops.rel_candidates); the host pose cache is patched in
        when the keyframe finalizes — before this frame is consumed."""
        R_c, t_c, mask_c = window_ops.rel_candidates(
            p["R_cw"], p["t_cw"], self.win.frames, self.ref_kf_slot)
        gate = (self.cfg.track_gate_scale * self.track_energy_ref
                + self.cfg.track_gate_offset)
        res, packed = coarse_tracker.track_multi_jit(
            self.tracker_ref, p["pyr"], self.calib,
            R_c, t_c, mask_c,
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(gate, jnp.float32), levels=self.cfg.levels)
        R_cw, t_cw, aff_new = window_ops.compose_abs_pose(
            res.R, res.t, res.rho, res.b_aff, self.win.frames,
            self.ref_kf_slot)
        p.update(packed=packed, ref_kf_id=self.ref_kf_id,
                 # Deferred keyframe: pose cache is in flight, patched by
                 # _finalize_kf. Synchronous keyframe (VIO): fresh already.
                 ref_pose=(None if self._kf_finalize is not None
                           else self.ref_pose_np),
                 R_cw=R_cw, t_cw=t_cw, aff=aff_new, imm_before=self.imm,
                 # The replacement solve carried no IMU prior: its v/bias
                 # outputs are passthroughs, not estimates.
                 had_prior=False,
                 # The pending copy belongs to the replaced dispatch —
                 # start a fresh one for the replacement results.
                 future=self._fetcher.submit(packed))
        if self._rt_queue and p is self._rt_queue[-1]:
            # Keep the device pose history pointing at the refreshed solve.
            self._last_pose_dev = (R_cw, t_cw)
        self._trace_pool(R_cw, t_cw, aff_new, p["pyr"])

    def finish(self) -> None:
        """Flush the realtime pipeline (finalize the deferred keyframe,
        consume the in-flight frame, finalize again if consuming created
        another keyframe)."""
        self._finalize_kf()
        while self._rt_queue:
            self._rt_drain(keep_last=False)
            self._finalize_kf()

    # ------------------------------------------------------------------
    def _full_reset(self, pyr, timestamp, fid) -> None:
        """Rebuild the visual window from the current frame (the reference
        recreates FullSystem keeping the output wrappers)."""
        self.stats_resets += 1
        self._consec_lost = 0
        self._rt_queue = []       # in-flight frames belong to the dead map
        self._kf_finalize = None  # so does the deferred keyframe tail
        self._rt_chunks_since_kf = None
        self._last_pose_dev = None
        self._prev_pose_dev = None
        self._valid_pose_dev = None
        self._kf_score_meas = None
        self._kf_score_rate = 0.0
        self._kf_epoch_fid = fid
        self._belief_fid = -1
        self.win = window.Window(self.calib, self.h, self.w, self.cfg)
        self.imm = immature.empty_pool(self.cfg.i_max)
        self.initialized = False
        self.is_lost = False
        self.tracker_ref = None
        self.ref_kf_slot = -1
        self.ref_kf_id = -1
        self._n_active = 0.0
        self.track_energy_ref = 1.0
        self.T_last_ref = (np.eye(3, dtype=np.float32),
                           np.zeros(3, np.float32))
        self.motion = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        self.last_rho = 0.0
        self.last_b = 0.0
        self.first_id = fid
        self.init.set_first(pyr)
        self._first_pyr = pyr
        self._first_ts = timestamp
        for k in range(len(self.shells) - 1, -1, -1):
            # The reset frame is usually the newest shell, but in realtime
            # mode a younger in-flight frame may sit after it.
            if self.shells[k].frame_id == fid:
                self.shells[k] = window.FrameShell(
                    frame_id=fid, timestamp=timestamp, ref_kf_id=fid,
                    R_c_ref=np.eye(3), t_c_ref=np.zeros(3), is_kf=True)
                break
        if self.imu is not None:
            # Back to coarse-init collection; metric knowledge (bias, the
            # last scale estimate) survives as the next init's warm start.
            imu = self.imu
            imu.phase = imu_system.COARSE_INIT
            imu.states = None
            imu.pairs = []
            imu._pending_pairs = []
            imu.coarse = None
            imu._init_poses.clear()
            imu._init_pres.clear()
            imu._init_fids.clear()
            imu._init_dts.clear()
            imu._init_sigs.clear()
            imu._kf_acc.clear()
            imu._kf_gyr.clear()
            imu._kf_dts.clear()
            imu._kf_fids.clear()
            imu.kf_since_pgba = 0
        from dmvio_tpu.io import output_wrapper as ow
        for w_ in self.output_wrappers:
            w_.reset()
            w_.publish_system_status(ow.RESETTING)
        self._published_status = ow.RESETTING

    def _slot_pose(self, slot: int):
        return self.win.frames.R_cw[slot], self.win.frames.t_cw[slot]

    def _track_frame(self, pyr):
        """Coarse tracking with constant-velocity prediction + fallbacks
        (reference trackNewCoarse pose-candidate ladder, FullSystem.cpp:320).

        The whole candidate ladder runs as ONE vmapped program with
        on-device selection, so the common path costs exactly one device
        sync (each sync is a full tunnel round trip); the visual-only
        fallback dispatch only fires when the IMU-prior solve failed on
        every candidate.
        """
        mR, mt = self.motion
        lR, lt = self.T_last_ref
        # Fixed candidate batch [4]: (imu-prediction | const-velocity,
        # zero-motion, identity). A masked fixed shape avoids recompiles
        # when the IMU prediction is unavailable.
        R_c = np.zeros((4, 3, 3), np.float32)
        t_c = np.zeros((4, 3), np.float32)
        mask_c = np.zeros(4, bool)
        R_c[0] = np.eye(3)
        R_c[1] = mR @ lR
        t_c[1] = mR @ lt + mt
        R_c[2] = lR
        t_c[2] = lt
        R_c[3] = np.eye(3)
        mask_c[1:] = True
        prior = None
        v_init = None
        bias_init = None
        if self.imu is not None:
            pred = self.imu.predict_coarse()
            if pred is not None:
                R_ref, t_ref = self.ref_pose_np
                R_rel = pred.R_cw @ np.asarray(R_ref, np.float64).T
                t_rel = pred.t_cw - R_rel @ np.asarray(t_ref, np.float64)
                R_c[0] = R_rel.astype(np.float32)
                t_c[0] = t_rel.astype(np.float32)
                mask_c[0] = True
                prior = self.imu.coarse_prior(R_ref, t_ref,
                                              self.last_rho, self.last_b)
                v_init = jnp.asarray(pred.v, jnp.float32)
                bias_init = jnp.asarray(pred.bias, jnp.float32)
        gate = (self.cfg.track_gate_scale * self.track_energy_ref
                + self.cfg.track_gate_offset)
        args = (self.tracker_ref, pyr, self.calib,
                jnp.asarray(R_c), jnp.asarray(t_c), jnp.asarray(mask_c),
                jnp.asarray(self.last_rho, jnp.float32),
                jnp.asarray(self.last_b, jnp.float32),
                jnp.asarray(gate, jnp.float32))
        res, packed = coarse_tracker.track_multi_jit(
            *args, levels=self.cfg.levels,
            prior=prior, v_init=v_init, bias_init=bias_init)
        # ONE small-array fetch carries every stat the host needs.
        pk = coarse_tracker.PackedTrack(jax.device_get(packed),
                                        self.cfg.levels)
        if not pk.any_valid and prior is not None:
            # The IMU-prior joint solve failed on every candidate: the
            # coarse belief is likely inconsistent (e.g. after a tracking
            # glitch it dead-reckons without correction). Fall back to
            # pure-visual tracking and rebuild the belief at the next BA
            # (the reference's mutual vision/IMU fallback,
            # FullSystem.cpp:440-445).
            res2, packed2 = coarse_tracker.track_multi_jit(
                *args, levels=self.cfg.levels)
            pk2 = coarse_tracker.PackedTrack(jax.device_get(packed2),
                                             self.cfg.levels)
            if pk2.any_valid:
                res, pk = res2, pk2
                self.imu.coarse = None   # belief reset; BA re-seeds it
        if not pk.any_valid:
            res3, pk3 = self._rescue_track(pyr)
            if pk3.any_valid:
                res, pk = res3, pk3
                if self.imu is not None:
                    self.imu.coarse = None
        best_res = res
        best = pk
        best_e = float(pk.level_energy[0])
        if not pk.any_valid:
            self.is_lost = True
            self.stats_lost_frames += 1
            # Report the constant-velocity prediction as this frame's pose
            # (the reference keeps predicting through losses too,
            # FullSystem.cpp:440-445) — never a diverged solve's output.
            pk.R = (mR @ lR).astype(np.float32)
            pk.t = (mR @ lt + mt).astype(np.float32)
            pk.rho, pk.b_aff = self.last_rho, self.last_b
        else:
            self.is_lost = False   # a valid track recovers the system
            # Cap: prior-inflated energies must not poison the ladder gate.
            self.track_energy_ref = min(
                0.7 * self.track_energy_ref + 0.3 * best_e,
                self.cfg.track_gate_cap)
            # Constant-velocity model update (host numpy: tiny matrices).
            # Only from a VALID track — a diverged solve's pose would
            # poison every future frame's candidate ladder.
            lR_new = best.R
            lt_new = best.t
            self.motion = (lR_new @ lR.T, lt_new - lR_new @ lR.T @ lt)
            self.T_last_ref = (lR_new, lt_new)
            self.last_rho = best.rho
            self.last_b = best.b_aff

        # Keyframe decision (FullSystem.cpp:1038-1100 heuristic).
        cfg = self.cfg
        score = cfg.kf_weight * (
            cfg.w_flow_t * best.flow_t / (self.w + self.h)
            + cfg.w_flow_rt * best.flow_rt / (self.w + self.h)
            + cfg.w_aff * abs(best.rho)
        )
        need_kf = score > 1.0
        return best_res, best, need_kf

    def _trace_pool(self, R_cw, t_cw, aff_new, pyr):
        """Trace all immature points against the new frame (traceNewCoarse,
        FullSystem.cpp:541). No host sync: dead slots are masked on device."""
        self.imm = _trace_jit(self.imm, self.win.frames, R_cw, t_cw,
                              aff_new, pyr[0], self.calib)

    # ------------------------------------------------------------------
    def _initialize(self, r: initializer.InitResult, pyr, ts, fid):
        cfg = self.cfg
        w = self.win
        # First keyframe: identity pose, gauge-pinning priors.
        w.insert_frame(0, self.first_id, self._first_pyr,
                       jnp.eye(3), jnp.zeros(3), jnp.zeros(2))
        w.set_frame_prior(0, cfg.first_pose_prior, cfg.first_aff_prior,
                          cfg.first_aff_prior)
        # Second keyframe at the initializer pose.
        aff1 = jnp.asarray([float(r.rho), float(r.b_aff)], jnp.float32)
        w.insert_frame(1, fid, pyr, r.R, r.t, aff1)
        w.set_frame_prior(1, 0.0, cfg.aff_a_prior, cfg.aff_b_prior)

        hosts = np.zeros(r.u.shape[0], np.int32)
        w.add_points(hosts, r.u, r.v, r.idepth, r.color, r.weight, r.mask)

        self._run_ba(max_iters=8)
        w.set_fej_to_current(0)
        w.set_fej_to_current(1)
        self._record_kf_poses()

        self.shells[-1] = window.FrameShell(
            frame_id=fid, timestamp=ts, ref_kf_id=fid,
            R_c_ref=np.eye(3), t_c_ref=np.zeros(3), is_kf=True)
        # Pre-init frames were tracked at the initializer's arbitrary
        # scale; the handoff renormalized the map (median idepth -> 1,
        # t *= r.scale) and BA refined the second KF. Rescale their shells
        # into the final map scale — the dominant early-trajectory ATE
        # error otherwise (the reference leaves these shells inconsistent;
        # we can do better for free).
        t1_ba = self.kf_poses.get(fid, (None, None))[1]
        f_corr = float(r.scale)
        raw = float(np.linalg.norm(np.asarray(r.t))) / max(f_corr, 1e-12)
        if t1_ba is not None and raw > 1e-9:
            f_corr = float(np.linalg.norm(t1_ba)) / raw
        for sh in self.shells:
            if self.first_id < sh.frame_id < fid \
                    and sh.ref_kf_id == self.first_id:
                sh.t_c_ref = sh.t_c_ref * f_corr
        self._set_tracker_ref(1, fid)
        self._spawn_immatures(1, pyr)
        self.initialized = True
        self.stats_kf = 2
        if self.imu is not None:
            # Visual init rescaled the world (median idepth -> 1): poses
            # recorded before it live at a different scale; restart the
            # IMU-init pose window from here.
            self.imu._init_poses.clear()
            self.imu._init_pres.clear()
            self.imu._init_fids.clear()
            self.imu._init_dts.clear()
            self.imu._init_sigs.clear()
            self.imu._kf_acc.clear()
            self.imu._kf_gyr.clear()
            self.imu._kf_dts.clear()
            self.imu._kf_fids.clear()
            self.imu.phase = imu_system.COARSE_INIT

    # ------------------------------------------------------------------
    def _make_keyframe(self, pyr, ts, fid, R_cw, t_cw, aff_new,
                       shell_idx: Optional[int] = None,
                       upto_fid: Optional[int] = None):
        cfg = self.cfg
        w = self.win
        slot = w.free_frame_slot()
        prev_slot = self.ref_kf_slot
        w.insert_frame(slot, fid, pyr, R_cw, t_cw, aff_new)
        w.set_frame_prior(slot, 0.0, cfg.aff_a_prior, cfg.aff_b_prior)
        self.shells[-1 if shell_idx is None else shell_idx].is_kf = True
        self.stats_kf += 1

        if self.imu is not None:
            pred_v = (np.asarray(self.imu.coarse.v)
                      if self.imu.coarse is not None else None)
            # upto_fid (realtime): younger in-flight frames' samples are
            # already buffered — the KF-to-KF chunk stops at this keyframe.
            prev_fid = (w.slot_frame_id[prev_slot]
                        if prev_slot is not None and prev_slot >= 0
                        else None)
            self.imu.on_new_keyframe(prev_slot, slot, pred_v,
                                     upto_fid=upto_fid,
                                     fids=(prev_fid, fid))

        with TimeMeasurement("activate"):
            self._activate_points(slot)
        snap = (w.frames, w.points, w.pair_mask, w.calib,
                self.imu.states if self.imu is not None else None)
        with TimeMeasurement("ba_optimize"):
            ba_res = self._run_ba(max_iters=cfg.ba_iters)
        if self.stats_kf <= 4 and \
                self._init_failed(float(jax.device_get(
                    self._ba_rmse_dev(ba_res)))):
            # INITIALIZATION FAILED (reference FullSystem.cpp:1417-1434):
            # high photometric RMSE on keyframes 2-4 means the two-frame
            # init handed over a bad map — rebuild from the current frame.
            self._full_reset(pyr, ts, fid)
            return
        w.frames = window_ops.set_fej_current(w.frames, slot)
        self._imu_set_fej(slot)
        F = cfg.f_max
        self._kf_st_host = None   # states prefetch (VIO branch fills it)
        if not self._vio_mode():
            # Visual path: victim selection + point-marg fold + drops all
            # run ON DEVICE (ba.marg_fused), so the entire keyframe tail
            # costs ONE blocking fetch — which also absorbs the BA's
            # device time (dispatches above are async).
            pose_pack_np = self._kf_fused_tail(slot, snap)
            pose_pack = self._record_kf_poses(pose_pack_np)
        else:
            # VIO path: fused single-sync tail, the extended twin of the
            # visual one (vio_ba.vio_marg_fused) — device victim selection,
            # extended point-marg fold, pair-factor fold, drops; the
            # inertial states ride the same fetch (reinit_coarse_from_ba
            # needs them after marginalization).
            pose_pack_np = self._kf_fused_tail_vio(slot, snap)
            pose_pack = self._record_kf_poses(pose_pack_np)
        with TimeMeasurement("tracker_ref"):
            self._set_tracker_ref(slot, fid, pose_pack)
        with TimeMeasurement("spawn_immatures"):
            self._spawn_immatures(slot, pyr)

        self._publish_keyframe_events()

        if self.imu is not None:
            if self.imu.phase == imu_system.COARSE_INIT:
                # postBAInit seam: run the coarse IMU init; take over when
                # the scale marginal is trustworthy.
                if self.imu.try_initialize(self.kf_poses):
                    self._imu_activate(slot)
            if self.imu.phase == imu_system.ACTIVE:
                adopted = self.imu.maybe_run_pgba(
                    w.frames, w.slot_frame_id,
                    active_event_fn=self._active_visual_event)
                F_ = self.cfg.f_max
                R_np = pose_pack[:9 * F_].reshape(F_, 3, 3)[slot]
                t_np = pose_pack[9 * F_:12 * F_].reshape(F_, 3)[slot]
                st_pref = getattr(self, "_kf_st_host", None)
                self.imu.reinit_coarse_from_ba(
                    R_np, t_np, slot,
                    st_np=None if adopted else st_pref)
                self._kf_st_host = None

    def _imu_set_fej(self, slot: int) -> None:
        if self.imu is None or self.imu.states is None:
            return
        st = self.imu.states
        self.imu.states = st._replace(
            v0=st.v0.at[slot].set(st.v[slot]),
            bg0=st.bg0.at[slot].set(st.bg[slot]),
            ba0=st.ba0.at[slot].set(st.ba[slot]),
        )

    def _imu_activate(self, newest_slot: int) -> None:
        """COARSE_INIT -> ACTIVE takeover (initFromIMUInit seam,
        BAIMULogic.cpp:683): build VIO states around the current window and
        convert the visual marginalization prior into the extended units."""
        w = self.win
        imu = self.imu
        imu.activate(w.frames, w.slot_frame_id, imu.init_velocity_of)
        Cv = ba_solve.cdim(self.cfg.f_max)
        C = vio_ba.cdim_ext(self.cfg.f_max)
        imu.HM = np.zeros((C, C), np.float64)
        imu.HM[:Cv, :Cv] = w.HM * vio_ba.W_DSO
        imu.bM0 = np.zeros((C,), np.float64)
        imu.bM0[:Cv] = w.bM0 * vio_ba.W_DSO
        # The activation prior seeds the delayed log so a marginalization
        # replacement can re-derive the FULL main prior later.
        imu.record_base_event(w.frames, w.slot_frame_id)
        imu.reinit_coarse_from_ba(
            w.frames.R_cw[newest_slot], w.frames.t_cw[newest_slot],
            newest_slot)

    def _vio_mode(self) -> bool:
        return (self.imu is not None
                and self.imu.phase == imu_system.ACTIVE
                and self.imu.states is not None)

    def _ext_prior_diag(self) -> jnp.ndarray:
        """Extended prior diagonal: visual priors converted to Mahalanobis
        units + the IMU-block priors (host numpy -> device transfer)."""
        w = self.win
        Cv = ba_solve.cdim(self.cfg.f_max)
        return jnp.asarray(np.concatenate([
            np.asarray(w.prior_diag) * vio_ba.W_DSO,
            np.asarray(self.imu.prior_diag)[Cv:]]))

    def _run_ba(self, max_iters: int):
        w = self.win
        base = ba.BAProblem(
            frames=w.frames, points=w.points, calib=w.calib,
            calib0=w.calib0, HM=jnp.asarray(w.HM, jnp.float32),
            bM0=jnp.asarray(w.bM0, jnp.float32),
            prior_diag=jnp.asarray(w.prior_diag), pair_mask=w.pair_mask,
        )
        images = w.images
        if self._vio_mode():
            imu = self.imu
            problem = vio_ba.VIOProblem(
                base=base, states=imu.states, pairs=imu.device_pairs(),
                HM=jnp.asarray(imu.HM, jnp.float32),
                bM0=jnp.asarray(imu.bM0, jnp.float32),
                prior_diag=self._ext_prior_diag(),
                R_cb=imu.R_cb, t_cb=imu.t_cb, imu_on=jnp.asarray(True),
            )
            if self.placer is not None:
                problem = self.placer.place_vio(problem)
                images = self.placer.place_images(w.images)
            result = vio_ba.optimize_jit(problem, images,
                                         max_iters=max_iters)
            if self.placer is not None:
                result = self.placer.gather(result)
            imu.states = result.states
        else:
            if self.placer is not None:
                base = self.placer.place_ba(base)
                images = self.placer.place_images(w.images)
            result = ba.optimize_jit(base, images, max_iters=max_iters)
            if self.placer is not None:
                result = self.placer.gather(result)
        self._frame_th_dev = result.frame_th
        w.frames = result.frames
        w.points = result.points
        w.calib = result.calib
        self.calib = result.calib
        # Drop outlier pairs + orphaned points, all on device.
        w.points, w.pair_mask = window_ops.post_ba_update(
            w.points, w.pair_mask, result.pair_outlier)
        return result

    def _ba_rmse_dev(self, result):
        """Photometric RMSE per pattern pixel of a BA result (device
        scalar) — the reference's init-health metric (FullSystem::optimize
        returns sqrt(E / (patternNum * resInA)), FullSystemOptimize.cpp)."""
        w = self.win
        pair_ok = w.pair_mask & w.points.mask[None, :] \
            & ~result.pair_outlier
        n = jnp.sum(pair_ok.astype(jnp.float32))
        return jnp.sqrt(result.energy / jnp.maximum(8.0 * n, 1.0))

    def _init_failed(self, rmse: float) -> bool:
        """RMSE thresholds on keyframes 2-4 (FullSystem.cpp:1417-1434)."""
        th = {2: 20.0, 3: 13.0, 4: 9.0}.get(self.stats_kf)
        return th is not None and (not np.isfinite(rmse) or rmse > th)

    def _record_kf_poses(self, pack_np: Optional[np.ndarray] = None):
        """Record window poses into kf_poses from ONE packed fetch."""
        w = self.win
        F = self.cfg.f_max
        if pack_np is None:
            pack_np = jax.device_get(window_ops.kf_pose_pack(w.frames))
        R = pack_np[:9 * F].reshape(F, 3, 3)
        t = pack_np[9 * F:12 * F].reshape(F, 3)
        for s in range(F):
            fid = w.slot_frame_id[s]
            if fid is not None:
                self.kf_poses[fid] = (R[s].copy(), t[s].copy())
        return pack_np

    # ------------------------------------------------------------------
    def _activate_points(self, new_slot: int):
        """Activate well-traced immatures with spatial spreading, entirely
        on device (activatePointsMT, FullSystem.cpp:604). The spreading
        radius adapts to the point density estimated at the PREVIOUS
        keyframe (currentMinActDist feedback, FullSystem.cpp:606-630) —
        lagged by one KF so no extra fetch is needed."""
        w = self.win
        ratio = self._n_active / max(self.cfg.p_max, 1)
        use_spacing = ratio >= 0.5
        radius = 0 if ratio < 0.8 else (1 if ratio < 1.0 else 2)
        self.imm, w.points, w.pair_mask = window_ops.activate_and_admit(
            self.imm, w.frames, w.points, w.pair_mask, w.images, w.calib,
            new_slot, h=self.h, w=self.w, radius=radius,
            use_spacing=use_spacing)

    # ------------------------------------------------------------------
    def _kf_fused_tail(self, newest_slot: int, snap) -> np.ndarray:
        """Single-sync visual keyframe tail: device victim selection +
        point marginalization + drops (ba.marg_fused), one blocking fetch,
        then host prior algebra. Returns the pose pack. The rare
        divergence revert costs one extra fetch."""
        w = self.win
        cfg = self.cfg
        F = cfg.f_max

        def dispatch():
            out = self._dispatch_marg_fused(newest_slot)
            vlist_d, HM_d, bM_d, pts_d, pm_d, n_pre_d, n_post_d = out
            # Fetch ONLY the small pieces; the updated point arrays stay
            # on device.
            with TimeMeasurement("kf_sync_stats"):
                fetched = jax.device_get(
                    (vlist_d, HM_d, bM_d, n_pre_d, n_post_d,
                     window_ops.kf_pose_pack(w.frames),
                     self._frame_th_dev))
            return fetched[:-1], (pts_d, pm_d), fetched[-1]

        fetched, (pts_new_d, pm_new_d), self._frame_th_np = dispatch()
        vlist, HM_np, bM_np, n_pre, n_post, pose_pack_np = fetched
        if self._n_active > 60 and \
                float(n_pre) < max(40.0, 0.15 * self._n_active):
            # Diverged BA: restore the snapshot and redo the tail on the
            # restored window (reference initFailed/reset regime).
            w.frames, w.points, w.pair_mask, w.calib = snap[:4]
            self.calib = w.calib
            w.frames = window_ops.set_fej_current(w.frames, newest_slot)
            fetched, (pts_new_d, pm_new_d), self._frame_th_np = dispatch()
            vlist, HM_np, bM_np, n_pre, n_post, pose_pack_np = fetched

        self._n_active = float(n_post)
        self._apply_marg_host(vlist, HM_np, bM_np, pts_new_d, pm_new_d)
        return pose_pack_np

    def _dispatch_vio_tail(self, newest_slot: int):
        """Device dispatch of the fused EXTENDED keyframe tail (no fetch):
        vio_ba.vio_marg_fused + the FEJ/state/pose references that ride
        the single result fetch. Returns (refs, pts_d, pm_d) where `refs`
        is the tuple to fetch (blocking or via the fetch pool)."""
        w = self.win
        cfg = self.cfg
        imu = self.imu
        F = cfg.f_max
        slots = w.slots_by_age()
        age_rank = np.full(F, -1, np.int32)
        for r_, s_ in enumerate(slots):
            age_rank[s_] = r_
        n_drop = max(0, len(slots) - cfg.max_frames) \
            if len(slots) > 2 else 0
        base = ba.BAProblem(
            frames=w.frames, points=w.points, calib=w.calib,
            calib0=w.calib0, HM=jnp.asarray(w.HM, jnp.float32),
            bM0=jnp.asarray(w.bM0, jnp.float32),
            prior_diag=jnp.asarray(w.prior_diag),
            pair_mask=w.pair_mask)
        vproblem = vio_ba.VIOProblem(
            base=base, states=imu.states, pairs=imu.device_pairs(),
            HM=jnp.asarray(imu.HM, jnp.float32),
            bM0=jnp.asarray(imu.bM0, jnp.float32),
            prior_diag=self._ext_prior_diag(),
            R_cb=imu.R_cb, t_cb=imu.t_cb, imu_on=jnp.asarray(True))
        vp, images = vproblem, w.images
        if self.placer is not None:
            vp = self.placer.place_vio(vproblem)
            images = self.placer.place_images(w.images)
        out = vio_ba.vio_marg_fused_jit(
            vp, images, jnp.asarray(age_rank),
            jnp.asarray(n_drop, jnp.int32), newest_slot)
        if self.placer is not None:
            out = self.placer.gather(out)
        (vlist_d, HM_d, bM_d, foldH_d, foldb_d, pts_d, pm_d,
         n_pre_d, n_post_d) = out
        st = imu.states
        fej_dev = (w.frames.R0_cw, w.frames.t0_cw, w.frames.aff0,
                   st.v0, st.bg0, st.ba0, st.s_log0, st.g20)
        refs = (vlist_d, HM_d, bM_d, foldH_d, foldb_d, n_pre_d,
                n_post_d, window_ops.kf_pose_pack(w.frames),
                fej_dev, st, self._frame_th_dev)
        return refs, pts_d, pm_d

    def _apply_vio_tail_host(self, fetched, pts_d, pm_d) -> np.ndarray:
        """Host half of the fused VIO tail: float64 prior algebra,
        delayed-log events, slot bookkeeping. Returns the pose pack."""
        w = self.win
        imu = self.imu
        (vlist, HM_np, bM_np, foldH, foldb, n_pre, n_post, pose_pack_np,
         fej_np, st_host, self._frame_th_np) = fetched
        self._kf_st_host = st_host
        self._n_active = float(n_post)
        victims = [int(s) for s in vlist if s >= 0]
        with TimeMeasurement("marginalize"):
            w.points, w.pair_mask = pts_d, pm_d
            HM_add_np = np.asarray(HM_np, np.float64)
            bM_add_np = np.asarray(bM_np, np.float64)
            imu.HM = imu.HM + HM_add_np
            imu.bM0 = imu.bM0 + bM_add_np
            if victims:
                self._vio_event_quad = (HM_add_np, bM_add_np)
                self._vio_marginalize_frames(
                    victims, fold_np=(foldH, foldb), fej_np=fej_np)
                self._vio_event_quad = None
                for s_ in victims:
                    w.pyramids[s_] = None
                    w.slot_frame_id[s_] = None
                vlist_j = jnp.asarray(np.asarray(vlist, np.int32))
                is_victim = jnp.any(
                    self.imm.host[None, :] == vlist_j[:, None], axis=0)
                self.imm = self.imm._replace(
                    mask=self.imm.mask & ~is_victim)
            w.points, w.pair_mask = window_ops.post_ba_update(
                w.points, w.pair_mask, jnp.zeros_like(w.pair_mask))
        return pose_pack_np

    def _kf_fused_tail_vio(self, newest_slot: int, snap) -> np.ndarray:
        """Single-sync EXTENDED (visual-inertial) keyframe tail: one fused
        device program (vio_ba.vio_marg_fused) + one blocking fetch, then
        the host float64 prior algebra and delayed-log events. Replaces
        the two-fetch stats/marg flow (each fetch is a tunnel round
        trip)."""
        w = self.win
        imu = self.imu

        def dispatch():
            refs, pts_d, pm_d = self._dispatch_vio_tail(newest_slot)
            with TimeMeasurement("kf_sync_stats"):
                fetched = jax.device_get(refs)
            return fetched, pts_d, pm_d

        fetched, pts_d, pm_d = dispatch()
        if self._n_active > 60 and \
                float(fetched[5]) < max(40.0, 0.15 * self._n_active):
            # The BA flagged (nearly) the whole map as outliers — a
            # diverged optimization, not a map update. Revert it entirely
            # (the reference aborts via initFailed/reset).
            w.frames, w.points, w.pair_mask, w.calib = snap[:4]
            if snap[4] is not None:
                imu.states = snap[4]
            self.calib = w.calib
            w.frames = window_ops.set_fej_current(w.frames, newest_slot)
            fetched, pts_d, pm_d = dispatch()
        return self._apply_vio_tail_host(fetched, pts_d, pm_d)

    def _dispatch_marg_fused(self, newest_slot: int):
        """Dispatch the fused marg-tail program (no fetch): victim
        selection from host slot ages, point-marg fold, drops."""
        w = self.win
        cfg = self.cfg
        F = cfg.f_max
        slots = w.slots_by_age()
        age_rank = np.full(F, -1, np.int32)
        for r_, s_ in enumerate(slots):
            age_rank[s_] = r_
        n_drop = max(0, len(slots) - cfg.max_frames) \
            if len(slots) > 2 else 0
        problem = ba.BAProblem(
            frames=w.frames, points=w.points, calib=w.calib,
            calib0=w.calib0, HM=jnp.asarray(w.HM, jnp.float32),
            bM0=jnp.asarray(w.bM0, jnp.float32),
            prior_diag=jnp.asarray(w.prior_diag), pair_mask=w.pair_mask)
        images = w.images
        if self.placer is not None:
            problem = self.placer.place_ba(problem)
            images = self.placer.place_images(w.images)
        out = ba.marg_fused_jit(
            problem, images, jnp.asarray(age_rank),
            jnp.asarray(n_drop, jnp.int32), newest_slot)
        if self.placer is not None:
            # points_new / pair_mask_new re-enter the single-device window
            # state; the rest is fetched host-side anyway.
            out = self.placer.gather(out)
        return out

    def _apply_marg_host(self, vlist, HM_np, bM_np,
                         pts_new_d, pm_new_d) -> None:
        """Host side of the fused marginalization: prior float64 algebra,
        per-victim Schur, slot bookkeeping, immature/orphan pruning."""
        w = self.win
        F = self.cfg.f_max
        with TimeMeasurement("marginalize"):
            w.points, w.pair_mask = pts_new_d, pm_new_d
            w.HM = w.HM + np.asarray(HM_np, np.float64)
            w.bM0 = w.bM0 + np.asarray(bM_np, np.float64)
            victims = [int(s_) for s_ in vlist if s_ >= 0]
            Cv = ba_solve.cdim(F)
            for s_ in victims:
                w.frame_prior_into_HM(s_)
                i0 = ba_solve.CPART + 8 * s_
                mmask = np.zeros(Cv, bool)
                mmask[i0:i0 + 8] = True
                w.HM, w.bM0 = vio_ba.schur_out_np(w.HM, w.bM0, mmask)
                w.frames, w.pair_mask = window_ops.drop_frame_slot(
                    w.frames, w.pair_mask, s_)
                w.pyramids[s_] = None
                w.slot_frame_id[s_] = None
            if victims:
                vl = jnp.asarray(np.asarray(vlist))
                is_victim = jnp.any(
                    self.imm.host[None, :] == vl[:, None], axis=0)
                self.imm = self.imm._replace(
                    mask=self.imm.mask & ~is_victim)
                # Orphaned points (all pairs died with the victims).
                w.points, w.pair_mask = window_ops.post_ba_update(
                    w.points, w.pair_mask, jnp.zeros_like(w.pair_mask))

    # ------------------------------------------------------------------
    # Deferred keyframe (realtime visual pipeline): _make_keyframe_rt
    # dispatches every device program of the keyframe build and returns
    # without blocking; _finalize_kf — run at the START of the next frame —
    # fetches the (by then settled) results and does the host prior
    # algebra. The keyframe thereby leaves the per-frame critical path
    # almost entirely (the reference gets the same effect from its mapping
    # thread, FullSystem.cpp:1216).
    def _make_keyframe_rt(self, pyr, ts, fid, R_cw, t_cw, aff_new,
                          shell_idx: int) -> None:
        cfg = self.cfg
        w = self.win
        slot = w.free_frame_slot()
        w.insert_frame(slot, fid, pyr, R_cw, t_cw, aff_new)
        w.set_frame_prior(slot, 0.0, cfg.aff_a_prior, cfg.aff_b_prior)
        self.shells[shell_idx].is_kf = True
        self.stats_kf += 1
        with TimeMeasurement("activate"):
            self._activate_points(slot)
        snap = (w.frames, w.points, w.pair_mask, w.calib, None)
        with TimeMeasurement("ba_optimize"):
            ba_res = self._run_ba(max_iters=cfg.ba_iters)
        # Init-health metric rides the deferred fetch (checked at finalize
        # — one frame late, like the reference's main-loop initFailed flag).
        rmse_d = (self._ba_rmse_dev(ba_res) if self.stats_kf <= 4
                  else jnp.asarray(0.0, jnp.float32))
        w.frames = window_ops.set_fej_current(w.frames, slot)
        out = self._dispatch_marg_fused(slot)
        vlist_d, HM_d, bM_d, pts_d, pm_d, n_pre_d, n_post_d = out
        with TimeMeasurement("tracker_ref"):
            self._build_tracker_ref_dev(slot)
        with TimeMeasurement("spawn_immatures"):
            self._spawn_immatures(slot, pyr)
        # The reference switch is recorded NOW (host ints; later frames
        # compose against the new slot); the pose caches arrive with the
        # finalize fetch.
        prev_ref = self.ref_kf_id
        self.ref_kf_slot = slot
        self.ref_kf_id = fid
        self._kf_epoch_fid = fid
        self._kf_score_meas = None
        fetch_refs = (vlist_d, HM_d, bM_d, n_pre_d, n_post_d,
                      window_ops.kf_pose_pack(w.frames), rmse_d,
                      self._frame_th_dev)
        self._kf_finalize = dict(
            slot=slot, fid=fid, snap=snap, prev_ref=prev_ref,
            kf_count=self.stats_kf,
            # Copy starts now, overlapping the next frame's tracking (the
            # second fetch worker; concurrent copies share one round trip).
            future=self._fetcher.submit(fetch_refs),
            pts=pts_d, pm=pm_d)

    def _make_keyframe_rt_vio(self, pyr, ts, fid, R_cw, t_cw, aff_new,
                              shell_idx: int, upto_fid: int,
                              ref_pose_approx=None,
                              pred_v_override=None) -> None:
        """Deferred INERTIAL keyframe: the device half (insert, activate,
        extended BA, fused VIO tail, tracker ref) dispatches now and
        overlaps in-flight tracking; the host half (f64 priors, delayed
        log, init machine, PGBA, coarse-filter reseed) runs at finalize —
        one-plus frames later, like the reference's mapping thread
        publishing keyframe results while the coarse tracker keeps going
        (FullSystem.cpp:1124-1320, IMUIntegration.cpp:228-330)."""
        cfg = self.cfg
        w = self.win
        imu = self.imu
        slot = w.free_frame_slot()
        prev_slot = self.ref_kf_slot
        w.insert_frame(slot, fid, pyr, R_cw, t_cw, aff_new)
        w.set_frame_prior(slot, 0.0, cfg.aff_a_prior, cfg.aff_b_prior)
        self.shells[shell_idx].is_kf = True
        self.stats_kf += 1
        # Dispatch-time keyframes pass the PREVIEW velocity (propagated to
        # this very frame); the consume-time path falls back to the
        # authoritative filter (which then sits at this frame anyway).
        pred_v = pred_v_override
        if pred_v is None and imu.coarse is not None:
            pred_v = np.asarray(imu.coarse.v)
        # The KF-to-KF chunk stops at this keyframe's frame id: younger
        # in-flight frames' samples are already buffered and stay.
        with TimeMeasurement("imu_kf_pair"):
            prev_fid = (w.slot_frame_id[prev_slot]
                        if prev_slot is not None and prev_slot >= 0
                        else None)
            imu.on_new_keyframe(prev_slot, slot, pred_v, upto_fid=upto_fid,
                                fids=(prev_fid, fid))
        with TimeMeasurement("activate"):
            self._activate_points(slot)
        snap = (w.frames, w.points, w.pair_mask, w.calib,
                imu.states if imu.states is not None else None)
        with TimeMeasurement("ba_optimize"):
            ba_res = self._run_ba(max_iters=cfg.ba_iters)
        rmse_d = (self._ba_rmse_dev(ba_res) if self.stats_kf <= 4
                  else jnp.asarray(0.0, jnp.float32))
        w.frames = window_ops.set_fej_current(w.frames, slot)
        self._imu_set_fej(slot)
        if self._vio_mode():
            with TimeMeasurement("kf_dispatch_tail"):
                refs, pts_d, pm_d = self._dispatch_vio_tail(slot)
            kind = "vio"
        else:
            out = self._dispatch_marg_fused(slot)
            vlist_d, HM_d, bM_d, pts_d, pm_d, n_pre_d, n_post_d = out
            refs = (vlist_d, HM_d, bM_d, n_pre_d, n_post_d,
                    window_ops.kf_pose_pack(w.frames), self._frame_th_dev)
            kind = "visual_imu"
        with TimeMeasurement("tracker_ref"):
            self._build_tracker_ref_dev(slot)
        with TimeMeasurement("spawn_immatures"):
            self._spawn_immatures(slot, pyr)
        prev_ref = self.ref_kf_id
        self.ref_kf_slot = slot
        self.ref_kf_id = fid
        self._kf_epoch_fid = fid
        self._kf_score_meas = None
        self._kf_finalize = dict(
            kind=kind, slot=slot, fid=fid, snap=snap, prev_ref=prev_ref,
            kf_count=self.stats_kf, ref_pose_approx=ref_pose_approx,
            future=self._fetcher.submit(refs + (rmse_d,)),
            pts=pts_d, pm=pm_d)
        # Chunks consumed while this finalize is pending: replayed after
        # the coarse-filter reseed so the belief returns to the newest
        # consumed frame.
        self._rt_chunks_since_kf = []

    def _finalize_kf_vio(self, kfp) -> None:
        """Host half of a deferred inertial keyframe."""
        w = self.win
        imu = self.imu
        slot, fid = kfp["slot"], kfp["fid"]
        with TimeMeasurement("kf_finalize_fetch"):
            fetched = kfp["future"].result()
        fetched, rmse_np = fetched[:-1], fetched[-1]
        if kfp["kf_count"] <= 4:
            th = {2: 20.0, 3: 13.0, 4: 9.0}.get(int(kfp["kf_count"]))
            if th is not None and (not np.isfinite(float(rmse_np))
                                   or float(rmse_np) > th):
                src = self._rt_queue[-1] if self._rt_queue else None
                pyr = src["pyr"] if src else self.win.pyramids[slot]
                self._full_reset(pyr, src["ts"] if src else 0.0,
                                 src["fid"] if src else fid)
                return
        if kfp["kind"] == "vio":
            n_pre = float(fetched[5])
        else:
            n_pre = float(fetched[3])
        if self._n_active > 60 and n_pre < max(40.0, 0.15 * self._n_active):
            # Rare divergence revert, one-plus frames late: restore and
            # redo the tail synchronously.
            w.frames, w.points, w.pair_mask, w.calib = kfp["snap"][:4]
            if kfp["snap"][4] is not None:
                imu.states = kfp["snap"][4]
            self.calib = w.calib
            w.frames = window_ops.set_fej_current(w.frames, slot)
            if kfp["kind"] == "vio":
                pose_pack_np = self._kf_fused_tail_vio(slot, kfp["snap"])
            else:
                pose_pack_np = self._kf_fused_tail(slot, kfp["snap"])
            self._build_tracker_ref_dev(slot)
        elif kfp["kind"] == "vio":
            with TimeMeasurement("kf_apply_host"):
                pose_pack_np = self._apply_vio_tail_host(
                    fetched, kfp["pts"], kfp["pm"])
        else:
            (vlist, HM_np, bM_np, _, n_post, pose_pack_np,
             self._frame_th_np) = fetched
            self._n_active = float(n_post)
            self._apply_marg_host(vlist, HM_np, bM_np,
                                  kfp["pts"], kfp["pm"])
        pose_pack = self._record_kf_poses(pose_pack_np)
        self._tracker_ref_host_update(slot, fid, pose_pack_np,
                                      prev_ref_id=kfp["prev_ref"])
        for q in self._rt_queue:
            if q.get("ref_pose") is None:
                q["ref_pose"] = self.ref_pose_np
                q["ref_kf_id"] = self.ref_kf_id
        self._publish_keyframe_events()

        # Inertial phase machine (postBAInit seam), one-plus frames late —
        # the reference's IMU initializer likewise runs threaded
        # (IMUInitializerLogic.h threading mode).
        if imu.phase == imu_system.COARSE_INIT:
            if imu.try_initialize(self.kf_poses):
                self._imu_activate(slot)
        if imu.phase == imu_system.ACTIVE:
            with TimeMeasurement("pgba_maybe"):
                adopted = imu.maybe_run_pgba(
                    w.frames, w.slot_frame_id,
                    active_event_fn=self._active_visual_event,
                    submit_fn=self._fetcher.submit)
            F_ = self.cfg.f_max
            R_np = pose_pack[:9 * F_].reshape(F_, 3, 3)[slot]
            t_np = pose_pack[9 * F_:12 * F_].reshape(F_, 3)[slot]
            st_pref = getattr(self, "_kf_st_host", None)
            # st arrives with the vio fetch; after a PGBA adoption (new
            # device states) or on the activation keyframe (visual-kind
            # tail) it must be re-fetched inside.
            st_np = None if (adopted or kfp["kind"] != "vio") else st_pref
            with TimeMeasurement("coarse_reseed"):
                imu.reinit_coarse_from_ba(R_np, t_np, slot, st_np=st_np)
                # The belief now sits AT the keyframe — possibly ahead of
                # the consume position (dispatch-time keyframes): older
                # frames consumed later must not re-advance it.
                self._belief_fid = max(self._belief_fid, fid)
                # Replay the post-keyframe frames consumed since, so the
                # belief returns to the newest consumed frame (their visual
                # fusion is lost — conservative, like the dispatch preview).
                for fid_ch, ch in (self._rt_chunks_since_kf or []):
                    imu.predict_coarse(ch)
                    self._belief_fid = fid_ch
            self._kf_st_host = None
        self._rt_chunks_since_kf = None

    def _finalize_kf(self, prefetched=None) -> None:
        kfp = self._kf_finalize
        if kfp is None:
            return
        self._kf_finalize = None
        if "kind" in kfp:
            self._finalize_kf_vio(kfp)
            return
        w = self.win
        slot, fid = kfp["slot"], kfp["fid"]
        if prefetched is not None:
            (vlist, HM_np, bM_np, n_pre, n_post, pose_pack_np,
             rmse_np, self._frame_th_np) = prefetched
        else:
            with TimeMeasurement("kf_finalize_fetch"):
                (vlist, HM_np, bM_np, n_pre, n_post, pose_pack_np,
                 rmse_np, self._frame_th_np) = kfp["future"].result()
        if kfp["kf_count"] <= 4:
            th = {2: 20.0, 3: 13.0, 4: 9.0}.get(int(kfp["kf_count"]))
            if th is not None and (not np.isfinite(float(rmse_np))
                                   or float(rmse_np) > th):
                # INITIALIZATION FAILED (FullSystem.cpp:1417-1434), one
                # frame late: rebuild from the newest in-flight frame (or
                # this keyframe's own pyramid when the queue is empty).
                src = self._rt_queue[-1] if self._rt_queue else None
                pyr = src["pyr"] if src else self.win.pyramids[kfp["slot"]]
                ts = src["ts"] if src else 0.0
                fid2 = src["fid"] if src else kfp["fid"]
                self._full_reset(pyr, ts, fid2)
                return
        if self._n_active > 60 and \
                float(n_pre) < max(40.0, 0.15 * self._n_active):
            # Rare divergence revert, one frame late: restore the
            # snapshot and redo the tail synchronously.
            w.frames, w.points, w.pair_mask, w.calib = kfp["snap"][:4]
            self.calib = w.calib
            w.frames = window_ops.set_fej_current(w.frames, slot)
            pose_pack_np = self._kf_fused_tail(slot, kfp["snap"])
            self._build_tracker_ref_dev(slot)
        else:
            self._n_active = float(n_post)
            self._apply_marg_host(vlist, HM_np, bM_np,
                                  kfp["pts"], kfp["pm"])
        self._record_kf_poses(pose_pack_np)
        self._tracker_ref_host_update(slot, fid, pose_pack_np,
                                      prev_ref_id=kfp["prev_ref"])
        # Patch in-flight frames that were re-dispatched against this
        # reference before its pose reached the host.
        for q in self._rt_queue:
            if q.get("ref_pose") is None:
                q["ref_pose"] = self.ref_pose_np
                q["ref_kf_id"] = self.ref_kf_id
        self._publish_keyframe_events()

    def _publish_keyframe_events(self) -> None:
        w = self.win
        if not self.output_wrappers:
            return
        win_fids = [f for f in w.slot_frame_id if f is not None]
        conn = {f: [g for g in win_fids if g != f] for f in win_fids}
        depth_pack = None
        if any(getattr(w_, "wants_depth_images", False)
               for w_ in self.output_wrappers):
            u_d, v_d, d_d, m_d, img_d = self._ref_depth_dev
            u_np, v_np, d_np, m_np, img_np = jax.device_get(
                (u_d, v_d, d_d, m_d, img_d))
            sel = np.asarray(m_np, bool)
            img_np = np.asarray(img_np)
            if img_np.ndim == 3:
                img_np = img_np[0]
            depth_pack = (np.asarray(u_np)[sel], np.asarray(v_np)[sel],
                          np.asarray(d_np)[sel], img_np)
        th_new = (float(self._frame_th_np[self.ref_kf_slot])
                  if self._frame_th_np is not None else None)
        for w_ in self.output_wrappers:
            w_.publish_keyframes(dict(self.kf_poses))
            w_.publish_graph(conn)
            if th_new is not None:
                w_.publish_frame_energy_th(self.ref_kf_id, th_new)
            if depth_pack is not None:
                w_.push_depth_image(self.ref_kf_id, depth_pack[0],
                                    depth_pack[1], depth_pack[2],
                                    img=depth_pack[3])
            if self._vio_mode():
                w_.publish_transform_dso_to_imu(
                    float(np.exp(self.imu.s_log)), self.imu.g2)
        if self._vio_mode() and any(
                getattr(w_, "wants_imu_state", False)
                for w_ in self.output_wrappers):
            # Newest KF's inertial estimates (one small fetch, only when a
            # stream consumer is attached) — the reference's per-BA scale/
            # bias/gravity/velocity streams (BAIMULogic.cpp:88-91,439-455).
            slot = self.ref_kf_slot
            st = self.imu.states
            v_np, bg_np, ba_np = jax.device_get(
                (st.v[slot], st.bg[slot], st.ba[slot]))
            R_g = np.asarray(lie.so3_exp(jnp.asarray(
                np.concatenate([self.imu.g2, [0.0]]), jnp.float32)))
            g_dir = R_g @ np.array([0.0, 0.0, -1.0])
            sh = next((s for s in reversed(self.shells)
                       if s.frame_id == self.ref_kf_id), None)
            ts = sh.timestamp if sh is not None else 0.0
            for w_ in self.output_wrappers:
                if getattr(w_, "wants_imu_state", False):
                    w_.publish_imu_state(
                        ts, float(np.exp(self.imu.s_log)),
                        np.asarray(bg_np), np.asarray(ba_np),
                        np.asarray(v_np), g_dir)

    def _active_visual_event(self):
        """The active window's reduced visual system as a quadratic over
        the current keyframes — getActiveDSOFactor parity
        (BAGTSAMIntegration.cpp:473-481): marginalize EVERY active point's
        idepth out of the photometric system at the FEJ states.

        Two-phase: DISPATCHES the device program and returns
        (device_refs, build_fn) so the caller (imu_system.maybe_run_pgba)
        can merge the fetch with its own state snapshot — every D2H copy
        is a fixed ~30-55 ms link round trip, and the old one-call form
        cost four of them back-to-back on the keyframe critical path."""
        from dmvio_tpu.models import delayed as dly
        w = self.win
        F = self.cfg.f_max
        imu = self.imu
        problem = ba.BAProblem(
            frames=w.frames, points=w.points, calib=w.calib,
            calib0=w.calib0, HM=jnp.asarray(w.HM, jnp.float32),
            bM0=jnp.asarray(w.bM0, jnp.float32),
            prior_diag=jnp.asarray(w.prior_diag), pair_mask=w.pair_mask)
        if self.placer is not None:
            H_add, b_add = ba.marginalization_update_jit(
                self.placer.place_ba(problem),
                self.placer.place_images(w.images),
                self.placer.point_sharded(w.points.mask))
        else:
            H_add, b_add = ba.marginalization_update_jit(
                problem, w.images, w.points.mask)
        H_ext = vio_ba.embed_vis(H_add * vio_ba.W_DSO, F)
        b_ext = vio_ba.embed_vis(b_add * vio_ba.W_DSO, F)
        slots = w.slots_by_age()
        fids = [w.slot_frame_id[s_] for s_ in slots]
        slot_fids = list(w.slot_frame_id)
        st = imu.states
        refs = (H_ext, b_ext, w.frames.R0_cw, w.frames.t0_cw,
                w.frames.aff0, st.v0, st.bg0, st.ba0, st.s_log0, st.g20)

        def build(pack):
            (H_np, b_np, R0, t0, aff0, v0, bg0, ba0, s0, g20) = pack
            H_ev, b_ev = imu.cext_to_event(
                np.asarray(H_np, np.float64), np.asarray(b_np, np.float64),
                slots)
            fej = imu.build_kf_snapshot((R0, t0, aff0, v0, bg0, ba0),
                                        slot_fids)
            return dly.MargEvent(
                victim=-1, fids=fids, H=H_ev, b0=b_ev,
                fej={f: fej[f] for f in fids if f in fej},
                s_log0=float(s0), g20=np.asarray(g20, np.float64))

        return refs, build

    def _vio_marginalize_frames(self, victims, fold_np=None,
                                fej_np=None) -> None:
        """Extended-state frame marginalization: fold the victims' IMU pair
        factors and priors into the prior, then Schur out 8+9 coords per
        victim (the graphs side of marginalizeBAFrame).

        fold_np / fej_np arrive prefetched from _marginalize's batched
        fetch (fold = the victims' pair-factor quadratic; fej = the frame +
        inertial FEJ snapshot for the delayed log)."""
        w = self.win
        imu = self.imu
        F = self.cfg.f_max
        # Delayed-marginalization log: snapshot what this event absorbs
        # BEFORE any state is dropped (slots, fej, point quadratic, pairs).
        ev_slots = w.slots_by_age()
        ev_slot_fids = list(w.slot_frame_id)
        ev_quad = getattr(self, "_vio_event_quad", None)
        C_ext = vio_ba.cdim_ext(F)
        H_ev = ev_quad[0] if ev_quad is not None else np.zeros(
            (C_ext, C_ext))
        b_ev = ev_quad[1] if ev_quad is not None else np.zeros(C_ext)
        H_ev = H_ev.copy()
        # Fold the victims' diagonal priors into the event quadratic too.
        pr_vis0 = np.array(w.prior_diag)
        pr_imu0 = np.array(imu.prior_diag)
        for s_ in victims:
            i0 = ba_solve.CPART + 8 * s_
            j0 = vio_ba.imu_offset(F, s_)
            H_ev[np.arange(i0, i0 + 8), np.arange(i0, i0 + 8)] +=                 pr_vis0[i0:i0 + 8] * vio_ba.W_DSO
            H_ev[np.arange(j0, j0 + 9), np.arange(j0, j0 + 9)] +=                 pr_imu0[j0:j0 + 9]
        # 1) IMU pair factors touching victims -> prior (FEJ + r0); the
        # quadratic was dispatched+fetched by _marginalize already.
        if fold_np is not None:
            imu.HM = imu.HM + np.asarray(fold_np[0], np.float64)
            imu.bM0 = imu.bM0 + np.asarray(fold_np[1], np.float64)
        elif fej_np is None:
            # Legacy/synchronous path (no prefetch): fold here.
            touching = [q for q, tup in enumerate(imu.pairs)
                        if tup[0] in victims or tup[1] in victims]
            if touching:
                pairs_dev = imu.device_pairs()
                sel = np.zeros(F - 1, bool)
                sel[touching] = True
                HM_add, bM_add = vio_ba.fold_pairs_into_prior_jit(
                    w.frames, imu.states, pairs_dev, imu.R_cb, imu.t_cb,
                    w.calib, w.calib0, F, jnp.asarray(sel))
                HM_np, bM_np = jax.device_get((HM_add, bM_add))
                imu.HM = imu.HM + np.asarray(HM_np, np.float64)
                imu.bM0 = imu.bM0 + np.asarray(bM_np, np.float64)
        removed_pairs = imu.drop_pairs_touching(list(victims))
        slot_fid_map = {sl: ev_slot_fids[sl] for sl in range(F)}
        fej_snap = None
        st0 = None
        if fej_np is not None:
            fej_snap = imu.build_kf_snapshot(fej_np[:6], ev_slot_fids)
            st0 = (float(fej_np[6]), np.asarray(fej_np[7], np.float64))
        with TimeMeasurement("vio_marg_events"):
            for s_ in victims:
                imu.record_marg_event(
                    ev_slot_fids[s_], ev_slots, ev_slot_fids,
                    H_ev, b_ev, w.frames, removed_pairs, slot_fid_map,
                    fej_snapshot=fej_snap, st0=st0)
                # Only the first event carries the quadratic content.
                H_ev = np.zeros((C_ext, C_ext))
                b_ev = np.zeros(C_ext)
                removed_pairs = []
        # 2) Per-victim: diagonal priors into HM, Schur, free the slot.
        Cv = ba_solve.cdim(F)
        for s in victims:
            # Visual prior block (converted units) + IMU prior block.
            pr_vis = np.array(w.prior_diag)
            i0 = ba_solve.CPART + 8 * s
            blk = pr_vis[i0:i0 + 8] * vio_ba.W_DSO
            pr_imu = np.array(imu.prior_diag)
            j0 = vio_ba.imu_offset(F, s)
            idx = np.concatenate([np.arange(i0, i0 + 8),
                                  np.arange(j0, j0 + 9)])
            vals = np.concatenate([blk, pr_imu[j0:j0 + 9]])
            imu.HM[idx, idx] += vals
            pr_vis[i0:i0 + 8] = 0.0
            pr_imu[j0:j0 + 9] = 0.0
            w.prior_diag = pr_vis
            imu.prior_diag = pr_imu
            # Host-computed coordinate mask (frame_marg_mask is a pure
            # index pattern; fetching its device version costs a round
            # trip per victim).
            C_all = vio_ba.cdim_ext(F)
            mmask_v = np.zeros(C_all, bool)
            mmask_v[i0:i0 + 8] = True
            mmask_v[j0:j0 + 9] = True
            imu.HM, imu.bM0 = vio_ba.schur_out_np(imu.HM, imu.bM0, mmask_v)
            w.frames, w.pair_mask = window_ops.drop_frame_slot(
                w.frames, w.pair_mask, s)

    # ------------------------------------------------------------------
    def _build_tracker_ref_dev(self, slot: int) -> None:
        """Device-only half of the tracker-ref switch (makeCoarseDepthL0,
        CoarseTracker.cpp:138): project all points into the new KF and
        build the semi-dense reference. No host sync."""
        w = self.win
        u_p, v_p, d_p, valid = _project_into(
            w.frames, w.points.host, w.points.u, w.points.v,
            w.points.idepth, w.calib, slot)
        hosted_j = w.points.host == slot
        u_c = jnp.where(hosted_j, w.points.u, u_p)
        v_c = jnp.where(hosted_j, w.points.v, v_p)
        d_c = jnp.where(hosted_j, w.points.idepth, d_p)
        m_c = w.points.mask & (hosted_j | valid)
        self.tracker_ref = _make_ref_jit(
            w.pyramids[slot], w.calib, u_c, v_c, d_c, m_c)
        # Device refs for the (gated) depth-map publish — free unless a
        # viewer asks (wants_depth_images), in which case the KF finalize
        # fetches them once per KF.
        self._ref_depth_dev = (u_c, v_c, d_c, m_c, w.pyramids[slot][0])

    def _tracker_ref_host_update(self, slot: int, fid: int,
                                 pose_pack: np.ndarray,
                                 prev_ref_id: Optional[int] = None) -> None:
        """Host half of the tracker-ref switch: pose caches + motion-model
        rebase from an (already fetched) pose pack. prev_ref_id overrides
        the previous reference id when the switch was already recorded at
        dispatch time (deferred keyframes)."""
        F = self.cfg.f_max
        prev = self.ref_kf_id if prev_ref_id is None else prev_ref_id
        R_new_ref = pose_pack[:9 * F].reshape(F, 3, 3)[slot]
        t_new_ref = pose_pack[9 * F:12 * F].reshape(F, 3)[slot]
        aff_ref = pose_pack[12 * F:14 * F].reshape(F, 2)[slot]
        # Re-express the velocity model relative to the new reference
        # (host-side numpy: tiny matrices).
        if prev in self.kf_poses and prev != fid:
            R_old, t_old = self.kf_poses[prev]
            lR, lt = self.T_last_ref
            R_w = lR @ R_old
            t_w = lR @ t_old + lt
            nR = R_w @ R_new_ref.T
            nt = t_w - nR @ t_new_ref
            self.T_last_ref = (nR.astype(np.float32), nt.astype(np.float32))
        else:
            self.T_last_ref = (np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32))
        self.ref_pose_np = (R_new_ref.copy(), t_new_ref.copy())
        self.ref_aff_np = aff_ref.copy()
        self.ref_kf_slot = slot
        self.ref_kf_id = fid
        self.last_rho = 0.0
        self.last_b = 0.0
        if self._kf_epoch_fid != fid:
            # Synchronous reference switch (initializer handoff, revert
            # paths): start a fresh dispatch-decision epoch. Deferred
            # keyframes already did this at dispatch (same fid).
            self._kf_epoch_fid = fid
            self._kf_score_meas = None

    def _set_tracker_ref(self, slot: int, fid: int,
                         pose_pack: Optional[np.ndarray] = None):
        """Synchronous tracker-ref switch (non-deferred paths)."""
        if pose_pack is None:
            pose_pack = jax.device_get(
                window_ops.kf_pose_pack(self.win.frames))
        self._build_tracker_ref_dev(slot)
        self._tracker_ref_host_update(slot, fid, pose_pack)

    def _spawn_immatures(self, slot: int, pyr):
        """Select new candidate points in the newest KF (makeNewTraces,
        FullSystem.cpp:1640) — one device dispatch, eviction included."""
        self.imm = window_ops.respawn_immatures(
            self.imm, self.win.frames, self.win.points, pyr[0],
            self.win.calib, slot, h=self.h, w=self.w)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Serialize the complete odometry state (capability the reference
        lacks, SURVEY.md §5.4)."""
        from dmvio_tpu.utils import checkpoint
        checkpoint.save(self, path)

    @staticmethod
    def load_checkpoint(path: str) -> "FullSystem":
        from dmvio_tpu.utils import checkpoint
        return checkpoint.load(path)

    def metric_trajectory(self):
        """Body poses in the metric gravity-aligned world (the reference's
        resultScaled.txt via TransformDSOToIMU::transformPose,
        FullSystem.cpp:256-298). None until the IMU is initialized."""
        if not self._vio_mode():
            return None
        st = jax.device_get(self.imu.states)
        s_log = jnp.asarray(float(st.s_log))
        g2 = jnp.asarray(np.asarray(st.g2))
        dso = self.trajectory()
        R_wc = jnp.asarray(np.stack([p[1] for p in dso]))
        t_wc = jnp.asarray(np.stack([p[2] for p in dso]))
        R_cw = jnp.swapaxes(R_wc, -1, -2)
        t_cw = -jnp.einsum("nij,nj->ni", R_cw, t_wc)
        Rb, pb = jax.vmap(
            lambda R, t: vio_ba.dso_to_body(R, t, s_log, g2,
                                            self.imu.R_cb, self.imu.t_cb)
        )(R_cw, t_cw)
        Rb = np.asarray(Rb)
        pb = np.asarray(pb)
        return [(dso[i][0], Rb[i], pb[i]) for i in range(len(dso))]

    def trajectory(self):
        """All frame poses as cam-to-world (R_wc, t_wc) with timestamps
        (printResult semantics, FullSystem.cpp:256-298)."""
        self.finish()
        out = []
        for sh in self.shells:
            if sh.frame_id in self.kf_poses:
                R_cw, t_cw = self.kf_poses[sh.frame_id]
            elif sh.ref_kf_id in self.kf_poses:
                R_ref, t_ref = self.kf_poses[sh.ref_kf_id]
                R_cw, t_cw = lie.se3_mul(
                    jnp.asarray(sh.R_c_ref), jnp.asarray(sh.t_c_ref),
                    jnp.asarray(R_ref), jnp.asarray(t_ref))
                R_cw, t_cw = np.asarray(R_cw), np.asarray(t_cw)
            else:
                R_cw, t_cw = sh.R_c_ref, sh.t_c_ref
            R_wc, t_wc = lie.se3_inv(jnp.asarray(R_cw), jnp.asarray(t_cw))
            out.append((sh.timestamp, np.asarray(R_wc), np.asarray(t_wc)))
        return out
