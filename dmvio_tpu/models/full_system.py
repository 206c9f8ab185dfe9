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
from dmvio_tpu.ops import immature, interp, pyramid, select
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib, PATTERN


@jax.jit
def _project_into(frames: BAFrames, host, u, v, idepth, calib: Calib, slot):
    """Project per-point host pixels into window frame `slot`.

    Returns (u', v', idepth', valid). The batched analogue of the
    reference's FrameFramePrecalc + projectPoint pairing."""
    R_h = frames.R_cw[host]
    t_h = frames.t_cw[host]
    R_t = frames.R_cw[slot]
    t_t = frames.t_cw[slot]
    R_th = jnp.einsum("ij,pkj->pik", R_t, R_h)
    t_th = t_t[None] - jnp.einsum("pij,pj->pi", R_th, t_h)
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    pt = jnp.einsum("pij,pj->pi", R_th, ray) + t_th * idepth[:, None]
    pz = pt[..., 2]
    valid = pz > 1e-6
    pzs = jnp.where(valid, pz, 1.0)
    un = pt[..., 0] / pzs * calib.fx + calib.cx
    vn = pt[..., 1] / pzs * calib.fy + calib.cy
    return un, vn, idepth / pzs, valid


@jax.jit
def _pattern_colors(level0: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Host pattern intensities + gradient weights at new point locations
    (the data stored at point birth, ImmaturePoint ctor)."""
    pat = jnp.asarray(PATTERN)
    samp = jax.vmap(
        lambda uu, vv: interp.bilinear_stack(level0, uu + pat[:, 0],
                                             vv + pat[:, 1])
    )(u, v)
    color = samp[..., 0]
    g2 = samp[..., 1] ** 2 + samp[..., 2] ** 2
    weight = jnp.sqrt(2500.0 / (2500.0 + g2))
    return color, weight


@jax.jit
def _trace_jit(imm, frames, R_cw, t_cw, aff_new, level0, calib):
    """Host-state gather + trace fused into one dispatch."""
    R_h = frames.R_cw[imm.host]
    t_h = frames.t_cw[imm.host]
    aff_h = frames.aff[imm.host]
    return immature.trace(imm, R_h, t_h, aff_h, R_cw, t_cw, aff_new,
                          level0, calib)


_make_ref_jit = jax.jit(coarse_tracker.make_tracker_ref)
_activate_jit = jax.jit(immature.activate)


class TrackInfo(NamedTuple):
    ok: bool
    flow_t: float
    flow_rt: float
    energy: float


class FullSystem:
    """Monocular visual odometry (IMU extensions attach at the seams)."""

    def __init__(self, calib: Calib, h: int, w: int,
                 cfg: Optional[window.Config] = None):
        self.cfg = cfg or window.Config()
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
        self.stats_kf = 0

    # ------------------------------------------------------------------
    def add_frame(self, img: jnp.ndarray, timestamp: float) -> None:
        """Feed one photometrically-corrected [H, W] image."""
        pyr = tuple(pyramid.build_pyramid_jit(img, levels=self.cfg.levels))
        fid = self.frame_id
        self.frame_id += 1

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

        # ---- tracking front-end ----
        res, need_kf = self._track_frame(pyr)
        self.shells.append(window.FrameShell(
            frame_id=fid, timestamp=timestamp, ref_kf_id=self.ref_kf_id,
            R_c_ref=np.asarray(res.R), t_c_ref=np.asarray(res.t)))

        # Absolute pose of the new frame for tracing/keyframing.
        R_ref, t_ref = self.ref_pose_np
        R_cw = jnp.asarray(np.asarray(res.R) @ R_ref)
        t_cw = jnp.asarray(np.asarray(res.R) @ t_ref + np.asarray(res.t))
        aff_ref = self.ref_aff_np
        a_new = float(aff_ref[0]) + float(res.rho)
        b_new = float(res.b_aff) + float(np.exp(float(res.rho))) * aff_ref[1]
        aff_new = jnp.asarray([a_new, b_new], jnp.float32)

        self._trace_pool(R_cw, t_cw, aff_new, pyr)

        if need_kf:
            self._make_keyframe(pyr, timestamp, fid, R_cw, t_cw, aff_new)

    # ------------------------------------------------------------------
    def _slot_pose(self, slot: int):
        return self.win.frames.R_cw[slot], self.win.frames.t_cw[slot]

    def _track_frame(self, pyr):
        """Coarse tracking with constant-velocity prediction + fallbacks
        (reference trackNewCoarse pose-candidate ladder, FullSystem.cpp:320).

        ONE device sync on the common path: the whole TrackResult is pulled
        with a single device_get (tunnel latency dominates per-frame cost on
        TPU — every avoided round trip counts); fallback candidates only
        run when the first attempt tracks poorly.
        """
        mR, mt = self.motion
        lR, lt = self.T_last_ref
        cand = [
            (mR @ lR, mR @ lt + mt),                         # const velocity
            (lR, lt),                                        # zero motion
            (np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
        ]
        best = None
        best_e = float("inf")
        for (R0, t0) in cand:
            res = coarse_tracker.track_jit(
                self.tracker_ref, pyr, self.calib,
                jnp.asarray(R0), jnp.asarray(t0),
                jnp.asarray(self.last_rho, jnp.float32),
                jnp.asarray(self.last_b, jnp.float32),
                levels=self.cfg.levels,
            )
            rnp = jax.device_get(res)   # single transfer for all fields
            e = float(rnp.level_energy[0])
            if bool(rnp.valid) and e < best_e:
                best, best_e = rnp, e
            # Good enough relative to recent tracking quality -> stop
            # trying further initializations (reference achievedRes ladder
            # with setting_reTrackThreshold, FullSystem.cpp:320-430).
            if best is not None and best_e < 1.5 * self.track_energy_ref + 0.5:
                break
        if best is None:
            self.is_lost = True
            best = rnp  # keep last attempt; pose = prediction
        else:
            self.track_energy_ref = 0.7 * self.track_energy_ref + 0.3 * best_e
        # Constant-velocity model update (host-side numpy: tiny matrices).
        lR_new = np.asarray(best.R)
        lt_new = np.asarray(best.t)
        self.motion = (lR_new @ lR.T, lt_new - lR_new @ lR.T @ lt)
        self.T_last_ref = (lR_new, lt_new)
        self.last_rho = float(best.rho)
        self.last_b = float(best.b_aff)

        # Keyframe decision (FullSystem.cpp:1038-1100 heuristic).
        cfg = self.cfg
        score = cfg.kf_weight * (
            cfg.w_flow_t * float(best.flow_t) / (self.w + self.h)
            + cfg.w_flow_rt * float(best.flow_rt) / (self.w + self.h)
            + cfg.w_aff * abs(float(best.rho))
        )
        need_kf = score > 1.0
        return best, need_kf

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

        n = int(np.asarray(r.mask).sum())
        hosts = np.zeros(r.u.shape[0], np.int32)
        w.add_points(hosts, r.u, r.v, r.idepth, r.color, r.weight, r.mask)

        self._run_ba(max_iters=8)
        w.set_fej_to_current(0)
        w.set_fej_to_current(1)
        self._record_kf_poses()

        self.shells[-1] = window.FrameShell(
            frame_id=fid, timestamp=ts, ref_kf_id=fid,
            R_c_ref=np.eye(3), t_c_ref=np.zeros(3), is_kf=True)
        self._set_tracker_ref(1, fid)
        self._spawn_immatures(1, pyr)
        self.initialized = True
        self.stats_kf = 2

    # ------------------------------------------------------------------
    def _make_keyframe(self, pyr, ts, fid, R_cw, t_cw, aff_new):
        cfg = self.cfg
        w = self.win
        slot = w.free_frame_slot()
        w.insert_frame(slot, fid, pyr, R_cw, t_cw, aff_new)
        w.set_frame_prior(slot, 0.0, cfg.aff_a_prior, cfg.aff_b_prior)
        self.shells[-1].is_kf = True
        self.stats_kf += 1

        self._activate_points(slot)
        self._run_ba(max_iters=cfg.ba_iters)
        w.set_fej_to_current(slot)
        self._record_kf_poses()
        self._marginalize(slot)
        self._record_kf_poses()

        self._set_tracker_ref(slot, fid)
        self._spawn_immatures(slot, pyr)

    def _run_ba(self, max_iters: int):
        w = self.win
        problem = ba.BAProblem(
            frames=w.frames, points=w.points, calib=w.calib,
            calib0=w.calib0, HM=w.HM, bM0=w.bM0,
            prior_diag=w.prior_diag, pair_mask=w.pair_mask,
        )
        result = ba.optimize_jit(problem, w.images, max_iters=max_iters)
        w.frames = result.frames
        w.points = result.points
        w.calib = result.calib
        self.calib = result.calib
        # Drop outlier pairs; then points with no remaining observations.
        out = np.asarray(result.pair_outlier)
        if out.any():
            pm = np.array(w.pair_mask)
            pm &= ~out
            w.pair_mask = jnp.asarray(pm)
        pairs_left = np.asarray(w.pair_mask).sum(axis=0)
        dead = w.point_mask_np() & (pairs_left == 0)
        w.drop_points(dead)
        return result

    def _record_kf_poses(self):
        w = self.win
        fm = w.frame_mask_np()
        R = np.asarray(w.frames.R_cw)
        t = np.asarray(w.frames.t_cw)
        for s in np.where(fm)[0]:
            fid = w.slot_frame_id[s]
            if fid is not None:
                self.kf_poses[fid] = (R[s].copy(), t[s].copy())

    # ------------------------------------------------------------------
    def _activate_points(self, new_slot: int):
        """Activate well-traced immatures with spatial spreading
        (activatePointsMT, FullSystem.cpp:604)."""
        w = self.win
        pool = self.imm
        live = np.asarray(pool.mask)
        status = np.asarray(pool.status)
        quality = np.asarray(pool.quality)
        dmin = np.asarray(pool.idepth_min)
        dmax = np.asarray(pool.idepth_max)
        mid = 0.5 * (dmin + np.minimum(dmax, 1e3))
        tight = (dmax - dmin) < np.maximum(0.25 * mid, 0.05)
        # SKIPPED means the interval is already tight — those are the best
        # candidates (reference canActivate accepts GOOD/SKIPPED/OOB/
        # BADCONDITION, FullSystem.cpp:620-626).
        cand = live & np.isin(status, (immature.IPS_GOOD,
                                       immature.IPS_SKIPPED)) & \
            (quality > immature.MIN_TRACE_QUALITY) & tight & (mid > 1e-3)
        n_free = int((~w.point_mask_np()).sum())
        if n_free == 0 or not cand.any():
            return
        # Spacing: project actives and candidates into the new KF. The
        # spreading radius adapts to point density (the reference's
        # currentMinActDist feedback, FullSystem.cpp:606-630): starved
        # windows activate everything, saturated ones demand spacing.
        d_mid = jnp.clip(
            0.5 * (pool.idepth_min + jnp.minimum(pool.idepth_max, 1e3)),
            1e-3, 50.0)
        cu, cv, _, cvalid = _project_into(
            w.frames, pool.host, pool.u, pool.v, d_mid, w.calib, new_slot)
        n_active = int(w.point_mask_np().sum())
        ratio = n_active / max(self.cfg.p_max, 1)
        if ratio < 0.5:
            clear = np.ones(self.cfg.i_max, bool)
        else:
            au, av, _, avalid = _project_into(
                w.frames, w.points.host, w.points.u, w.points.v,
                w.points.idepth, w.calib, new_slot)
            radius = 0 if ratio < 0.8 else (1 if ratio < 1.0 else 2)
            clear = np.asarray(select.occupancy_spacing(
                au, av, w.points.mask & avalid, cu, cv, self.h, self.w,
                radius=radius, cell=8))
        cand &= clear & np.asarray(cvalid)
        if not cand.any():
            return
        d, ok, energy = _activate_jit(
            pool, jnp.asarray(cand), w.frames.R_cw, w.frames.t_cw,
            w.frames.aff, w.frames.mask, w.images, w.calib)
        ok_np = np.asarray(ok) & cand
        # Cap to free capacity, best quality first.
        if ok_np.sum() > n_free:
            order = np.argsort(-quality * ok_np)
            keep = np.zeros_like(ok_np)
            keep[order[:n_free]] = True
            ok_np &= keep
        w.add_points(np.asarray(pool.host), pool.u, pool.v, d,
                     pool.color, pool.weight, jnp.asarray(ok_np))
        # Activated (and failed-activation) candidates leave the pool.
        gone = cand
        self.imm = pool._replace(mask=pool.mask & ~jnp.asarray(gone))

    # ------------------------------------------------------------------
    def _marginalize(self, newest_slot: int):
        """Frame selection + point/frame marginalization
        (flagFramesForMarginalization heuristic, FullSystemMarginalize.cpp:61)."""
        w = self.win
        slots = w.slots_by_age()
        if len(slots) <= self.cfg.max_frames:
            return
        n_drop = len(slots) - self.cfg.max_frames
        # Never marginalize the two newest.
        eligible = slots[:-2] if len(slots) > 2 else []
        if not eligible:
            return
        t = np.asarray(w.frames.t_cw)
        latest = newest_slot
        scores = []
        for s in eligible:
            dists = [np.linalg.norm(t[s] - t[j]) for j in slots if j != s]
            d_latest = np.linalg.norm(t[s] - t[latest])
            score = -np.sqrt(d_latest) * sum(
                1.0 / (1e-5 + d) for d in dists)
            scores.append(score)
        victims = [eligible[i] for i in np.argsort(scores)[:n_drop]]

        host_np = np.asarray(w.points.host)
        pmask_np = w.point_mask_np()
        pair_np = np.array(w.pair_mask)
        hosted = pmask_np & np.isin(host_np, victims)
        # Marginalize hosted points that still constrain the window.
        n_pairs = pair_np.sum(axis=0)
        marg_pts = hosted & (n_pairs >= 1)
        if marg_pts.any():
            problem = ba.BAProblem(
                frames=w.frames, points=w.points, calib=w.calib,
                calib0=w.calib0, HM=w.HM, bM0=w.bM0,
                prior_diag=w.prior_diag, pair_mask=w.pair_mask,
            )
            HM_add, bM_add = ba.marginalization_update_jit(
                problem, w.images, jnp.asarray(marg_pts))
            w.HM = w.HM + HM_add
            w.bM0 = w.bM0 + bM_add
        w.drop_points(hosted)
        # Drop remaining pairs targeting the victims, then Schur the frames.
        pair_np = np.array(w.pair_mask)
        for s in victims:
            pair_np[s, :] = False
        w.pair_mask = jnp.asarray(pair_np)
        from dmvio_tpu.ops import ba_solve
        for s in victims:
            w.frame_prior_into_HM(s)
            w.HM, w.bM0 = ba_solve.marginalize_frame_prior(
                w.HM, w.bM0, s, self.cfg.f_max)
            w.drop_frame(s)
        # Immatures hosted in dead frames die too.
        imm_dead = np.isin(np.asarray(self.imm.host), victims)
        if imm_dead.any():
            self.imm = self.imm._replace(
                mask=self.imm.mask & ~jnp.asarray(imm_dead))
        # Points with no pairs after the victim pair-drop die.
        pairs_left = np.asarray(w.pair_mask).sum(axis=0)
        dead = w.point_mask_np() & (pairs_left == 0)
        w.drop_points(dead)

    # ------------------------------------------------------------------
    def _set_tracker_ref(self, slot: int, fid: int):
        """Build the semi-dense tracking reference from the newest KF
        (makeCoarseDepthL0, CoarseTracker.cpp:138)."""
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
        # Refresh host caches of the reference pose/affine (one transfer).
        R_new_ref, t_new_ref, aff_ref = jax.device_get(
            (w.frames.R_cw[slot], w.frames.t_cw[slot], w.frames.aff[slot]))
        # Re-express the velocity model relative to the new reference
        # (host-side numpy: tiny matrices).
        if self.ref_kf_slot >= 0 and self.ref_kf_id in self.kf_poses:
            R_old, t_old = self.kf_poses[self.ref_kf_id]
            lR, lt = self.T_last_ref
            R_w = lR @ R_old
            t_w = lR @ t_old + lt
            nR = R_w @ R_new_ref.T
            nt = t_w - nR @ t_new_ref
            self.T_last_ref = (nR.astype(np.float32), nt.astype(np.float32))
        else:
            self.T_last_ref = (np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32))
        self.ref_pose_np = (np.asarray(R_new_ref), np.asarray(t_new_ref))
        self.ref_aff_np = np.asarray(aff_ref)
        self.ref_kf_slot = slot
        self.ref_kf_id = fid
        self.last_rho = 0.0
        self.last_b = 0.0

    def _spawn_immatures(self, slot: int, pyr):
        """Select new candidate points in the newest KF (makeNewTraces,
        FullSystem.cpp:1640)."""
        sel = select.select_points_jit(pyr[0], self.cfg.i_max, pot=4)
        # Avoid areas already covered by active points in this KF.
        w = self.win
        au, av, _, avalid = _project_into(
            w.frames, w.points.host, w.points.u, w.points.v,
            w.points.idepth, w.calib, slot)
        clear = select.occupancy_spacing(
            au, av, w.points.mask & avalid, sel.u, sel.v,
            self.h, self.w, radius=0, cell=4)
        valid = np.asarray(sel.mask) & np.asarray(clear)
        free = ~np.asarray(self.imm.mask)
        # Under capacity pressure, evict stale OOB/OUTLIER slots (the
        # reference deletes immatures on OOB / host departure).
        if free.sum() < valid.sum():
            st = np.asarray(self.imm.status)
            evict = np.asarray(self.imm.mask) & np.isin(
                st, (immature.IPS_OOB, immature.IPS_OUTLIER))
            free |= evict
            self.imm = self.imm._replace(
                mask=self.imm.mask & ~jnp.asarray(evict))
        n = min(int(valid.sum()), int(free.sum()))
        if n == 0:
            return
        src = np.where(valid)[0][:n]
        dst = np.where(free)[0][:n]
        color, weight = _pattern_colors(pyr[0], sel.u, sel.v)
        sj, dj = jnp.asarray(src), jnp.asarray(dst)
        p = self.imm
        self.imm = p._replace(
            host=p.host.at[dj].set(slot),
            u=p.u.at[dj].set(sel.u[sj]),
            v=p.v.at[dj].set(sel.v[sj]),
            idepth_min=p.idepth_min.at[dj].set(0.0),
            idepth_max=p.idepth_max.at[dj].set(immature.IDEPTH_MAX_INIT),
            color=p.color.at[dj].set(color[sj]),
            weight=p.weight.at[dj].set(weight[sj]),
            quality=p.quality.at[dj].set(1e4),
            status=p.status.at[dj].set(immature.IPS_UNINITIALIZED),
            mask=p.mask.at[dj].set(True),
        )

    # ------------------------------------------------------------------
    def trajectory(self):
        """All frame poses as cam-to-world (R_wc, t_wc) with timestamps
        (printResult semantics, FullSystem.cpp:256-298)."""
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
