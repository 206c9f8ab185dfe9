"""IMU side-state of the full system: buffers, init machine, VIO window.

TPU-native re-design of the IMUIntegration facade + IMUInitializer state
machine (src/IMU/IMUIntegration.{hpp,cpp}, src/IMUInitialization/
IMUInitializer*.{h,cpp}): owns the per-frame/per-keyframe measurement
buffers, the gravity bootstrap, the coarse IMU init window, the extended
VIO prior (HM over C_ext), the per-slot velocity/bias states and the
KF-to-KF preintegration pairs. FullSystem calls into this at the same seams
the reference uses (addIMUData / addIMUDataToBA / postOptimization /
finishKeyframeOperations).

Init phases (simplified transition model; the reference's default
"CombinedWithMarginalizationReplacement" adds re-init + marg replacement,
IMUInitializerTransitions.h:62-163 — those arrive with the delayed-
marginalization layer):
    INACTIVE -> COARSE_INIT (visual ready, collecting poses)
             -> ACTIVE      (scale variance below threshold; VIO BA on)
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import delayed, imu_init, pgba, vio_ba, vio_coarse
from dmvio_tpu.ops import ba_solve, preint
from dmvio_tpu.utils.timing import TimeMeasurement

# Rolling init window length. Longer windows are NOT better here: poses are
# resolved against keyframes frozen at their marginalization time, so old
# entries live in a drifted window gauge and poison the fit (the reference
# re-optimizes old poses in PGBA for exactly this reason).
INIT_WINDOW = 100   # reference maxNumPoses (IMUInitSettings.h:38)

INACTIVE, COARSE_INIT, ACTIVE = 0, 1, 2


@dataclasses.dataclass
class IMUCalib:
    """Camera-IMU calibration (reference IMUCalibration, IMUSettings.h:126)."""

    R_cb: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(3, dtype=np.float32))
    t_cb: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, dtype=np.float32))
    sigma_gyro: float = 1.6968e-4
    sigma_acc: float = 2.0e-3
    sigma_gyro_walk: float = 8.0e-5
    sigma_acc_walk: float = 3.0e-3
    sigma_integration: float = 1e-8
    # IMU-init transition model (init_transitionModel,
    # IMUInitializerTransitions.h:62-71): 2 = full method (PGBA +
    # marginalization replacement, the paper default), 1 = no
    # marginalization replacement, 4 = no replacement at the initial
    # takeover (later ones allowed), 5 = coarse IMU init only (no PGBA).
    transition_model: int = 2
    # Scale-marginal gates, as multipliers on the built-in thresholds
    # (init_coarseScaleUncertaintyThresh / init_pgba_scaleUncertaintyThresh,
    # IMUInitSettings.h:64-65 — reference default 1.0).
    coarse_scale_th: float = 1.0
    pgba_scale_th: float = 1.0
    # Delayed-marginalization depth (init_pgbaDelay, IMUInitSettings.h:62 —
    # reference default 100) and the PGBA keyframe cap (>= delay so the
    # whole delayed window is re-optimizable).
    pgba_delay: int = 100
    pgba_max_kfs: int = 100
    # PGBA trigger cadence in keyframes since the last cycle. The cycle
    # COUNT is accuracy-relevant on short sequences: each cycle is a
    # chance to re-adopt a sharper scale estimate (docs/ACCURACY.md
    # measured 1-cycle vs 3-cycle runs landing in 10.4% vs 2.8% se3
    # basins), so this is a registered knob (init_pgbaEvery).
    pgba_every: int = 6


# (Chunk preintegration runs on the host in f64 — preint.preintegrate_np,
# vectorized — and uploads once via preint.state_from_np; the former
# padded on-device scans and their FRAME/KF sample caps are gone.)


@jax.jit
def _seed_slot_states_jit(st, new_slot, prev_slot, v_pred, use_pred):
    """Seed a fresh keyframe slot's inertial states from its predecessor
    (velocity from the coarse prediction when available) in one program."""
    v_new = jnp.where(use_pred, v_pred, st.v[prev_slot])
    return st._replace(
        v=st.v.at[new_slot].set(v_new),
        v0=st.v0.at[new_slot].set(v_new),
        bg=st.bg.at[new_slot].set(st.bg[prev_slot]),
        bg0=st.bg0.at[new_slot].set(st.bg[prev_slot]),
        ba=st.ba.at[new_slot].set(st.ba[prev_slot]),
        ba0=st.ba0.at[new_slot].set(st.ba[prev_slot]),
    )


class IMUSystem:
    """All inertial state surrounding the visual window."""

    def __init__(self, calib: IMUCalib, f_max: int):
        self.calib = calib
        self.f_max = f_max
        # The calibration is the single source of the process noise model
        # (the reference reads the same five densities from per-dataset
        # YAMLs into IMUCalibration, IMUSettings.h:126-135).
        preint.set_noise(
            sigma_gyro=calib.sigma_gyro, sigma_acc=calib.sigma_acc,
            sigma_gyro_walk=calib.sigma_gyro_walk,
            sigma_acc_walk=calib.sigma_acc_walk,
            sigma_integration=calib.sigma_integration)
        self.R_cb = jnp.asarray(calib.R_cb)
        self.t_cb = jnp.asarray(calib.t_cb)
        self.phase = INACTIVE
        # Gravity bootstrap accumulator (GravityInitializer.cpp:29-85).
        self._acc_sum = np.zeros(3)
        self._acc_n = 0
        # KF-chunk raw buffer (samples since the last keyframe).
        self._kf_acc: List[np.ndarray] = []
        self._kf_gyr: List[np.ndarray] = []
        self._kf_dts: List[np.ndarray] = []
        self._kf_fids: List[int] = []   # frame id per buffered chunk
        # Coarse-init rolling window: dso poses + frame-to-frame preints.
        self._init_poses: List[Tuple[np.ndarray, np.ndarray]] = []
        self._init_pres: List[preint.PreintState] = []
        self._init_fids: List[int] = []
        self._init_dts: List[float] = []
        self._init_sigs: List[Tuple[float, float]] = []  # (sig_rot, sig_pos)
        self.init_result: Optional[imu_init.CoarseInitResult] = None
        # VIO window state (valid in ACTIVE phase).
        self.states: Optional[vio_ba.VIOStates] = None
        self.pairs: List[Tuple[int, int, preint.PreintState]] = []
        self.HM = None
        self.bM0 = None
        self.prior_diag = None
        self.coarse: Optional[vio_coarse.CoarseIMUState] = None
        self.last_frame_pre: Optional[preint.PreintState] = None
        self.last_frame_pre_np: Optional[dict] = None
        self.s_log = 0.0
        self.g2 = np.zeros(2)
        # Delayed marginalization log + PGBA bookkeeping (real camera-IMU
        # extrinsics: every pair relinearization runs the full
        # TransformDSOToIMU chain).
        self.delayed_log = delayed.DelayedLog(
            delay=calib.pgba_delay, R_cb=calib.R_cb, t_cb=calib.t_cb)
        self.kf_since_pgba = 0
        self.best_pgba_var = float("inf")
        # device_pairs() memo (see its docstring) + shared identity preint.
        self._device_pairs_cache = None
        self._device_pairs_key = ()
        self._identity_pre = None
        # Async PGBA snapshot in flight (realtime pipeline; see
        # maybe_run_pgba).
        self._pgba_pending = None
        # KF-to-KF preintegrations recorded before ACTIVE, fid-keyed;
        # consumed by activate() (see on_new_keyframe).
        self._pending_pairs = []

    # -- per-frame ingestion ------------------------------------------------
    def add_frame_imu(self, acc, gyr, dts, fid: int = -1) -> None:
        """Buffer one frame's measurements; preintegrate the frame chunk.

        The frame chunk is preintegrated TWICE: on device (f32, feeds the
        init-window optimizer) and on host in float64 (feeds the coarse
        filter, whose information Schur cannot survive f32).

        fid tags the chunk with its frame id so the realtime pipeline's
        one-frame-late keyframe decision can split the KF-to-KF buffer at
        the right boundary (samples of frames dispatched AFTER the keyframe
        have already been ingested by the time the decision lands)."""
        if len(dts) == 0:
            self.last_frame_pre = None
            self.last_frame_pre_np = None
            self._last_chunk_acc_mean = None
            return
        self._last_chunk_acc_mean = np.asarray(acc).mean(axis=0)
        self._kf_acc.append(np.asarray(acc, np.float32))
        self._kf_gyr.append(np.asarray(gyr, np.float32))
        self._kf_dts.append(np.asarray(dts, np.float32))
        self._kf_fids.append(int(fid))
        # One host f64 preintegration per frame. Outside ACTIVE the coarse
        # bias is zero, so the same result serves both consumers: the
        # coarse filter (host dict) and the init window's device preint
        # (uploaded via state_from_np — replaces a padded FRAME_IMU_CAP
        # device scan per frame). In ACTIVE the init window is closed and
        # the device twin has no consumer.
        bias_np = (self.coarse.bias if self.coarse is not None
                   else np.zeros(6))
        self.last_frame_pre_np = preint.preintegrate_np(acc, gyr, dts,
                                                        bias_np)
        self.last_frame_pre = (None if self.phase == ACTIVE else
                               preint.state_from_np(self.last_frame_pre_np))

    def frame_chunk(self):
        """Snapshot of the just-ingested frame chunk (for the realtime
        pipeline, whose consume step runs frames late: the `last_*` members
        will have been overwritten by newer frames by then)."""
        if self.last_frame_pre_np is None:
            return None
        return dict(pre=self.last_frame_pre,
                    pre_np=self.last_frame_pre_np,
                    acc_mean=getattr(self, "_last_chunk_acc_mean", None))

    def gravity_guess(self) -> np.ndarray:
        if self._acc_n == 0:
            return np.zeros(2)
        return np.asarray(imu_init.gravity_from_accel(
            jnp.asarray(self._acc_sum / self._acc_n, jnp.float32)))

    # -- tracking-side (coarse, host float64) ------------------------------
    def predict_coarse(self, chunk_np: Optional[dict] = None):
        """Propagate the coarse belief through one frame chunk (the last
        ingested by default; the realtime pipeline passes the consumed
        frame's own chunk instead)."""
        if chunk_np is None:
            chunk_np = getattr(self, "last_frame_pre_np", None)
        if self.phase != ACTIVE or self.coarse is None or chunk_np is None:
            return None
        with TimeMeasurement("imu_predict"):
            self.coarse = vio_coarse.predict(
                self.coarse, chunk_np,
                np.asarray(self.calib.R_cb, np.float64),
                np.asarray(self.calib.t_cb, np.float64))
        return self.coarse

    def predict_preview(self, chunks_np) -> Optional[
            "vio_coarse.CoarseIMUState"]:
        """NON-mutating prediction through a list of frame chunks: the
        realtime pipeline's dispatch-time prediction. The authoritative
        belief sits at the last CONSUMED frame; the in-flight frames'
        chunks (visual results still crossing the link) plus the new
        frame's chunk are propagated through a copy, so dispatch never
        waits for a fetch. The preview is slightly weaker than the serial
        prediction (the in-flight frames' visual fusion is missing), which
        only softens the tracker prior — conservative by construction."""
        if self.phase != ACTIVE or self.coarse is None:
            return None
        if any(ch is None for ch in chunks_np):
            return None   # a chunk gap breaks the prediction chain
        # Incremental: propagation is O(pending chunks) per dispatch and
        # the pending list only GROWS while consumption lags (link
        # stalls, exactly when the list is longest). If the authoritative
        # belief hasn't moved (same object) and the previous preview's
        # chunk list is a prefix of this one, continue from it and
        # propagate only the new suffix. Identity keys are sound: chunk
        # dicts are immutable snapshots held by the realtime queue, and
        # every coarse-belief update rebinds self.coarse.
        key = tuple(id(ch) for ch in chunks_np)
        cached = getattr(self, "_preview_cache", None)
        state = self.coarse
        todo = chunks_np
        if cached is not None and cached[0] is self.coarse \
                and key[:len(cached[1])] == cached[1]:
            state = cached[2]
            todo = chunks_np[len(cached[1]):]
        R_cb = np.asarray(self.calib.R_cb, np.float64)
        t_cb = np.asarray(self.calib.t_cb, np.float64)
        with TimeMeasurement("imu_predict"):
            for ch in todo:
                state = vio_coarse.predict(state, ch, R_cb, t_cb)
        self._preview_cache = (self.coarse, key, state)
        return state

    def coarse_prior(self, R_ref_np, t_ref_np, rho0, b0):
        if self.phase != ACTIVE or self.coarse is None:
            return None
        return vio_coarse.make_tracker_prior(
            self.coarse, np.asarray(R_ref_np, np.float64),
            np.asarray(t_ref_np, np.float64), float(rho0), float(b0))

    def fuse_tracked(self, H_vis8_np, R_cw_np, t_cw_np, v_np, bias_np):
        if self.phase != ACTIVE or self.coarse is None:
            return
        self.coarse = vio_coarse.fuse_visual(
            self.coarse, H_vis8_np, R_cw_np, t_cw_np, v_np, bias_np)

    # -- init machine -------------------------------------------------------
    @staticmethod
    def _tracker_pose_sigmas(H_vis) -> tuple:
        """Marginal pose sigmas from the tracker's 8x8 photometric
        Hessian (coords [t(3), w(3), rho, b], Mahalanobis units — the
        same information the coarse filter fuses). Returns
        (sig_rot [rad], sig_pos [DSO units]), clipped to a sane band."""
        H = np.asarray(H_vis, np.float64)
        try:
            cov = np.linalg.inv(H + 1e-6 * np.eye(8))
            d = np.clip(np.diag(cov), 0.0, None)
            sig_pos = float(np.sqrt(np.mean(d[0:3])))
            sig_rot = float(np.sqrt(np.mean(d[3:6])))
        except np.linalg.LinAlgError:
            return 0.1, 0.1
        if not (np.isfinite(sig_pos) and np.isfinite(sig_rot)):
            return 0.1, 0.1
        return min(sig_rot, 0.1), min(sig_pos, 0.1)

    def record_init_pose(self, fid: int, ref_fid: int,
                         R_rel, t_rel, R_cw_approx,
                         chunk: Optional[dict] = None,
                         H_vis=None) -> None:
        """Feed a tracked-frame pose + its chunk into the init window
        (IMUInitializer::addPose path). `chunk` is the frame's own snapshot
        (frame_chunk()) in realtime mode, where the `last_*` members have
        moved on by consume time.

        Poses are stored RELATIVE to their tracking-reference keyframe and
        resolved against the LATEST optimized KF poses at init time —
        absolute poses recorded at tracking time jump by the BA correction
        at every keyframe (1-2 deg), which poisons the gyro consistency of
        the init window."""
        if chunk is None:
            chunk = self.frame_chunk()
        if self.phase == ACTIVE or chunk is None:
            return
        # Gravity bootstrap: rotate the chunk's mean specific force into the
        # DSO WORLD with the (approximate) tracked attitude before
        # averaging — raw body-frame averaging is meaningless once the
        # camera rotates (GravityInitializer.cpp:29-85 averages in a fixed
        # frame too).
        if chunk.get("acc_mean") is not None:
            # Body-frame specific force -> camera frame (R_cb) -> world
            # (tracked attitude). Identity-rig round 1 skipped the R_cb hop.
            self._acc_sum += np.asarray(R_cw_approx).T @ (
                np.asarray(self.calib.R_cb, np.float64)
                @ chunk["acc_mean"])
            self._acc_n += 1
        self._init_poses.append((np.asarray(R_rel), np.asarray(t_rel),
                                 ref_fid))
        self._init_pres.append(chunk["pre"])
        self._init_fids.append(fid)
        self._init_dts.append(float(chunk["pre_np"]["dt"]))
        # Tracker-Hessian pose sigmas (round-5 accuracy lever #1,
        # docs/ACCURACY.md). MEASURED AND REJECTED as a default: on both
        # the hard (se3 9.2 -> 12.0%) and smooth (3.2 -> 4.8%) fixtures
        # the per-pose down-weighting moved the init's scale AWAY from
        # truth — the tracker's Hessian is confident precisely on the
        # frames whose wiggle-band displacement is biased, so the
        # weighting removes scale information without removing the bias.
        # The machinery stays behind DMVIO_INIT_SIGMAS=1 for probing.
        use_sig = os.environ.get("DMVIO_INIT_SIGMAS", "0") == "1"
        self._init_sigs.append(
            self._tracker_pose_sigmas(H_vis)
            if (H_vis is not None and use_sig) else (0.0, 0.0))
        if len(self._init_poses) > INIT_WINDOW:
            self._init_poses.pop(0)
            self._init_pres.pop(0)
            self._init_fids.pop(0)
            self._init_dts.pop(0)
            self._init_sigs.pop(0)

    def _resolve_init_poses(self, kf_poses: dict):
        """Absolute DSO poses of the init window against the latest
        optimized keyframe poses (consistent chain)."""
        out = []
        for k, (R_rel, t_rel, ref_fid) in enumerate(self._init_poses):
            fid = self._init_fids[k]
            if fid in kf_poses:
                out.append((kf_poses[fid][0], kf_poses[fid][1]))
            elif ref_fid in kf_poses:
                R_ref, t_ref = kf_poses[ref_fid]
                out.append((R_rel @ R_ref, R_rel @ t_ref + t_rel))
            else:
                out.append(None)
        return out

    def init_velocity_of(self, fid: int) -> Optional[np.ndarray]:
        if self.init_result is None or fid not in self._init_fids:
            return None
        k = self._init_fids.index(fid)
        return np.asarray(self.init_result.v[k])

    def try_initialize(self, kf_poses: dict,
                       scale_var_th: float = 1.0) -> bool:
        """Run the coarse IMU init over the pose window; returns True when
        the scale estimate is trustworthy (threshold on the scale marginal,
        IMUInitSettings.h:64) AND the optimizer actually converged (the
        variance alone is blind to a diverged solution sitting in a steep
        spot)."""
        n = len(self._init_poses)
        if n < 24:
            return False
        with TimeMeasurement("imu_coarse_init"):
            N = imu_init.N_MAX
            resolved = self._resolve_init_poses(kf_poses)
            if any(p is None for p in resolved):
                return False
            Rs = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
            ts = np.zeros((N, 3), np.float32)
            for k, (R, t) in enumerate(resolved):
                Rs[k] = R
                ts[k] = t
            pres = list(self._init_pres[1:n])
            pres += [preint.identity_preint(jnp.zeros(6))] * (N - 1 - len(pres))
            pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
            sig_rot = np.zeros(N, np.float32)
            sig_pos = np.zeros(N, np.float32)
            for k in range(min(n, len(self._init_sigs))):
                sig_rot[k], sig_pos[k] = self._init_sigs[k]
            st = imu_init.CoarseInitState(
                R_cw=jnp.asarray(Rs), t_cw=jnp.asarray(ts), pre=pre_b,
                valid=jnp.arange(N) < n,
                sig_rot=jnp.asarray(sig_rot), sig_pos=jnp.asarray(sig_pos))
            warm = (self.init_result is not None
                    and getattr(self, "_last_init_decent", False))
            g20 = np.asarray(self.init_result.g2) if warm \
                else self.gravity_guess()
            s0 = float(self.init_result.s_log) if warm else 0.0
            b0 = jnp.asarray(self.init_result.bias) if warm else jnp.zeros(6)
            # Velocity initialization from pose finite differences in the
            # (guessed) metric frame — LM from zero velocities regularly
            # stalls far from the basin.
            v0_np = np.zeros((N, 3), np.float32)
            R_g = np.asarray(imu_init.lie.so3_exp(
                jnp.asarray([g20[0], g20[1], 0.0])))
            s_guess = np.exp(s0)
            p_m = []
            for (R, t) in resolved:
                t_wc = -R.T @ t
                p_m.append((R_g.T @ t_wc) / s_guess)
            for k in range(n - 1):
                dtk = max(self._init_dts[k + 1]
                          if k + 1 < len(self._init_dts) else 0.05, 1e-3)
                v0_np[k] = (p_m[k + 1] - p_m[k]) / dtk
            if n >= 2:
                v0_np[n - 1] = v0_np[n - 2]
            v0 = self.init_result.v if warm else jnp.asarray(v0_np)
            res = imu_init.optimize_jit(
                st, self.R_cb, self.t_cb,
                s_log0=jnp.asarray(s0, jnp.float32),
                g20=jnp.asarray(g20, jnp.float32), bias0=b0, v0=v0,
                iters=25,
                # Static flag so the default path keeps the ORIGINAL
                # constant-floor program bit-for-bit (chaotic basins;
                # see _residual_all).
                use_sig=bool(np.any(sig_rot) or np.any(sig_pos)))
            res = jax.device_get(res)
        self.init_result = res
        n_res = 9.0 * max(n - 1, 1)
        mean_e = float(res.energy) / n_res
        finite = np.isfinite(float(res.s_log)) and np.isfinite(mean_e)
        if not finite:
            # A diverged fit must not poison the next warm start.
            self.init_result = None
            self._last_init_decent = False
            return False
        self._last_init_decent = mean_e < 50.0
        # Gate: converged (E/dof at the noise floor), scale marginal tight
        # (threshold scaled by init_coarseScaleUncertaintyThresh).
        # Reference gate: scaleVariance < coarseScaleUncertaintyThresh
        # (IMUInitializerTransitions.cpp:61, default 1.0) — the variance
        # itself, not a scaled standard deviation.
        ok = (bool(res.ok)
              and float(res.s_var) < self.calib.coarse_scale_th
              and mean_e < 5.0)
        return ok

    def activate(self, window_frames, slot_frame_ids, frame_vel_lookup):
        """Switch to ACTIVE: build VIO states/prior around the visual window.

        frame_vel_lookup: callable frame_id -> (v [3] or None). Velocities
        for current window KFs come from the init window when available.
        """
        F = self.f_max
        res = self.init_result
        self.s_log = float(res.s_log)
        self.g2 = np.asarray(res.g2)
        C = vio_ba.cdim_ext(F)
        self.HM = np.zeros((C, C), np.float64)
        self.bM0 = np.zeros((C,), np.float64)

        v = np.zeros((F, 3), np.float32)
        bg = np.tile(np.asarray(res.bias[:3], np.float32), (F, 1))
        ba_ = np.tile(np.asarray(res.bias[3:6], np.float32), (F, 1))
        for s in range(F):
            fid = slot_frame_ids[s]
            if fid is not None:
                vv = frame_vel_lookup(fid)
                if vv is not None:
                    v[s] = vv
        st = vio_ba.empty_vio_states(F)._replace(
            v=jnp.asarray(v), v0=jnp.asarray(v),
            bg=jnp.asarray(bg), bg0=jnp.asarray(bg),
            ba=jnp.asarray(ba_), ba0=jnp.asarray(ba_),
            s_log=jnp.asarray(self.s_log, jnp.float32),
            s_log0=jnp.asarray(self.s_log, jnp.float32),
            g2=jnp.asarray(self.g2, jnp.float32),
            g20=jnp.asarray(self.g2, jnp.float32))
        self.states = st

        # Extended priors (reference addFirstBAFrame + initFromIMUInit:
        # priors on biases/velocities/gravity; scale free).
        prior = np.zeros(C, np.float32)
        for f in range(F):
            off = vio_ba.imu_offset(F, f)
            prior[off:off + 3] = 1.0 / (0.5 ** 2)        # velocity
            prior[off + 3:off + 6] = 1.0 / (0.01 ** 2)   # gyro bias
            prior[off + 6:off + 9] = 1.0 / (0.1 ** 2)    # accel bias
        Cg = ba_solve.cdim(F) + 9 * F
        # Pin scale/gravity at the (variance-gated, converged) coarse init
        # values, at least as hard as sigma ~ 1% / 0.01 rad and harder when
        # the init's own scale marginal is tighter. Scale must NOT float on
        # the window alone: with a handful of active IMU factors it is
        # weakly observable and the visual pose-noise bias inflates it
        # (shrink-the-world pressure — measured: a freed scale ran 122%
        # away on both synthetic seeds while sim3 IMPROVED). Corrections to
        # the pinned value come from PGBA takeovers over the delay-100 log
        # (the reference's route: IMUInitializerTransitions reinit), whose
        # adoption gate below is seeded with the init's own marginal so a
        # sloppier PGBA cannot override a sharper init.
        s_var = float(getattr(res, "s_var", np.nan))
        if not np.isfinite(s_var) or s_var <= 0:
            s_var = 1.0
        prior[Cg] = max(1.0 / s_var, 1e4)
        prior[Cg + 1:Cg + 3] = 1e4
        # The adoption ratchet is NOT seeded with the init's marginal:
        # PGBA sees that same information through the delayed log's base
        # event (record_base_event) and re-optimizes every pose jointly,
        # so its marginal is strictly better informed — seeding the
        # ratchet double-counts the init and was measured (round 4) to
        # block the adoption that corrects a wrong-but-confident coarse
        # init by a 0.9x hair (init 0.0111 vs PGBA 0.0111). The absolute
        # gate (res.s_var < 0.05 * th) governs the first adoption;
        # the ratchet orders later re-adoptions.
        # The init's honest scale marginal, kept for the delayed log's
        # base event (record_base_event): the WINDOW pin above is floored
        # at 1e4 for stability, but copying that floor into the log would
        # dominate every later PGBA's scale marginal (s_var ~= 1e-4
        # regardless of data), neutering the re-adoption ratchet.
        self.init_s_var = s_var
        self.prior_diag = prior   # host numpy (see window.py)
        # Chain the pre-activation keyframes that survived into the
        # window: their fid-keyed preintegrations (on_new_keyframe) become
        # live pairs, so anchor keyframes get IMU pose/velocity/bias-walk
        # factors from frame 0 on — like the reference, whose inertial
        # factors exist from the first keyframe (BAIMULogic.cpp
        # addFirstBAFrame onward), not only from activation.
        fid_to_slot = {f: s for s, f in enumerate(slot_frame_ids)
                       if f is not None}
        have = {(t[0], t[1]) for t in self.pairs}
        for pf, nf, pre, pre_np in self._pending_pairs:
            sa, sb = fid_to_slot.get(pf), fid_to_slot.get(nf)
            if sa is None or sb is None or (sa, sb) in have:
                continue
            if len(self.pairs) >= F - 1:
                break
            self.pairs.append((sa, sb, pre, pre_np))
            have.add((sa, sb))
        self._pending_pairs = []
        self.phase = ACTIVE

    # -- keyframe-side ------------------------------------------------------
    def kf_chunk_preint(self, upto_fid: Optional[int] = None):
        """Preintegrate everything since the last keyframe (device f32 for
        the window BA + host f64 for the delayed log / PGBA).

        upto_fid bounds the chunk at the keyframe's own frame: in realtime
        mode the KF decision lands one-plus frames late, by which time
        younger frames' samples are already buffered — they belong to the
        NEXT pair and stay."""
        if not self._kf_dts:
            return None, None
        if upto_fid is None:
            n_take = len(self._kf_dts)
        else:
            n_take = sum(1 for f in self._kf_fids if f <= int(upto_fid))
        if n_take == 0:
            return None, None
        acc = np.concatenate(self._kf_acc[:n_take])
        gyr = np.concatenate(self._kf_gyr[:n_take])
        dts = np.concatenate(self._kf_dts[:n_take])
        blin_np = np.zeros(6) if self.init_result is None else \
            np.asarray(self.init_result.bias)
        # ONE host f64 preintegration; the device twin is the same result
        # uploaded (preint.state_from_np) — replaces a padded KF_IMU_CAP
        # on-device f32 scan whose pad + H2D + dispatch cost ~10 ms on the
        # keyframe critical path for a LESS accurate result.
        pre_np = preint.preintegrate_np(acc, gyr, dts, blin_np)
        pre = preint.state_from_np(pre_np)
        del self._kf_acc[:n_take]
        del self._kf_gyr[:n_take]
        del self._kf_dts[:n_take]
        del self._kf_fids[:n_take]
        return pre, pre_np

    def on_new_keyframe(self, prev_slot: int, new_slot: int,
                        pred_v: Optional[np.ndarray],
                        upto_fid: Optional[int] = None,
                        fids: Optional[tuple] = None) -> None:
        """Register the KF-to-KF pair and seed the new slot's states.

        fids = (prev_kf_frame_id, new_kf_frame_id): before ACTIVE the pair
        cannot be registered against states that do not exist yet, but the
        preintegration is kept fid-keyed so `activate` can chain the
        keyframes that survive into the activation window — otherwise the
        pre-activation anchors never join the bias/velocity chain at all
        (measured: fid-0 anchors carried their seed bias forever,
        docs/ACCURACY.md)."""
        pre, pre_np = self.kf_chunk_preint(upto_fid)
        if self.phase != ACTIVE or self.states is None:
            if pre is not None and fids is not None \
                    and fids[0] is not None and fids[1] is not None:
                self._pending_pairs.append(
                    (int(fids[0]), int(fids[1]), pre, pre_np))
                # Only pairs whose BOTH keyframes survive to activation
                # can ever be used; a window's worth is plenty.
                if len(self._pending_pairs) > 4 * self.f_max:
                    del self._pending_pairs[0]
            return
        if pre is not None and prev_slot is not None and prev_slot >= 0:
            self.pairs.append((prev_slot, new_slot, pre, pre_np))
        st = self.states
        use_pred = pred_v is not None
        v_pred = jnp.asarray(pred_v if use_pred else np.zeros(3),
                             jnp.float32)
        # One fused dispatch (was six .at[].set chains on the keyframe
        # critical path).
        self.states = _seed_slot_states_jit(
            st, jnp.asarray(new_slot, jnp.int32),
            jnp.asarray(prev_slot, jnp.int32), v_pred,
            jnp.asarray(use_pred))

    def device_pairs(self) -> vio_ba.IMUPairs:
        """Stacked device form of the window's KF-to-KF pairs.

        Cached: building the stack costs ~7 ms of host work (tree_map +
        per-field jnp.stack over Q preints) and the pair set only changes
        at keyframe boundaries while the stack is consumed 2+ times per
        keyframe (BA dispatch + fused tail). Keyed on the identity of the
        pair tuples so ANY mutation (append, filter, reassignment from
        reset/checkpoint) invalidates without cooperation from callers."""
        key = tuple(id(t) for t in self.pairs)
        if self._device_pairs_cache is not None \
                and self._device_pairs_key == key:
            return self._device_pairs_cache
        Q = self.f_max - 1
        iis = np.zeros(Q, np.int32)
        jjs = np.zeros(Q, np.int32)
        val = np.zeros(Q, bool)
        for q, tup in enumerate(self.pairs[:Q]):
            iis[q], jjs[q], val[q] = tup[0], tup[1], True
        if all(len(t) > 3 and t[3] is not None for t in self.pairs[:Q]):
            # Host-stack from the f64 preints and upload ONCE (the
            # device-side tree_map/stack of Q preints costs ~7 ms of
            # dispatch work on the keyframe path).
            def stk(name, shape):
                a = np.zeros((Q,) + shape, np.float32)
                if name == "dR":
                    a[:] = np.eye(3, dtype=np.float32)
                for q, tup in enumerate(self.pairs[:Q]):
                    a[q] = np.asarray(tup[3][name], np.float32)
                return a

            pre_b = preint.PreintState(
                dR=stk("dR", (3, 3)), dv=stk("dv", (3,)),
                dp=stk("dp", (3,)),
                dt=np.asarray([np.float32(t[3]["dt"])
                               for t in self.pairs[:Q]]
                              + [np.float32(0.0)] * (Q - min(Q, len(self.pairs))),
                              np.float32),
                dR_dbg=stk("dR_dbg", (3, 3)), dv_dbg=stk("dv_dbg", (3, 3)),
                dv_dba=stk("dv_dba", (3, 3)), dp_dbg=stk("dp_dbg", (3, 3)),
                dp_dba=stk("dp_dba", (3, 3)), cov=stk("cov", (9, 9)),
                bias_lin=stk("bias_lin", (6,)))
            out = jax.device_put(vio_ba.IMUPairs(
                pre=pre_b, i=iis, j=jjs, valid=val))
        else:
            # Fallback (e.g. checkpoints without host preints): stack the
            # stored device preints.
            if self._identity_pre is None:
                self._identity_pre = preint.identity_preint(jnp.zeros(6))
            pres = [tup[2] for tup in self.pairs[:Q]]
            pres += [self._identity_pre] * (Q - len(pres))
            pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
            out = vio_ba.IMUPairs(pre=pre_b, i=jnp.asarray(iis),
                                  j=jnp.asarray(jjs), valid=jnp.asarray(val))
        self._device_pairs_cache = out
        self._device_pairs_key = key
        # Keep the keyed tuples alive so a freed tuple's id cannot be
        # reused by a NEW pair and alias the cache.
        self._device_pairs_ref = list(self.pairs)
        return out

    def drop_pairs_touching(self, slots: List[int]):
        """Remove pairs that reference marginalized slots; returns the
        removed pair tuples (the caller folds them into the prior FIRST and
        hands their symbolic form to the delayed log)."""
        keep = []
        removed = []
        for tup in self.pairs:
            if tup[0] in slots or tup[1] in slots:
                removed.append(tup)
            else:
                keep.append(tup)
        self.pairs = keep
        return removed

    # Scale-fix (reference finishKeyframeOperations, BAIMULogic.cpp:457-497
    # with setting_scaleFixTH): once the scale estimate is stable across a
    # sliding window of keyframes, STOP optimizing scale/gravity — with the
    # window's few active IMU factors they are only weakly observable and
    # would otherwise random-walk into a shrink-the-world runaway.
    SCALE_FIX_WINDOW = 6
    SCALE_FIX_TH = 1.03


    # -- delayed marginalization + PGBA ------------------------------------
    @staticmethod
    def build_kf_snapshot(pack, slot_fids):
        """Host KFState dict from already-fetched (R, t, aff, v, bg, ba)
        per-slot arrays."""
        R, t, aff, v, bg, ba = [np.asarray(x, np.float64) for x in pack]
        out = {}
        for slot, fid in enumerate(slot_fids):
            if fid is not None:
                out[fid] = delayed.KFState(
                    R_cw=R[slot].copy(), t_cw=t[slot].copy(),
                    aff=aff[slot].copy(), v=v[slot].copy(),
                    bg=bg[slot].copy(), ba=ba[slot].copy())
        return out

    def snapshot_kf_states(self, frames_dev, slot_fids, use_fej=True):
        """Host KFState dict for occupied slots (ONE device fetch)."""
        st = self.states
        if use_fej:
            pack = jax.device_get((frames_dev.R0_cw, frames_dev.t0_cw,
                                   frames_dev.aff0, st.v0, st.bg0, st.ba0))
        else:
            pack = jax.device_get((frames_dev.R_cw, frames_dev.t_cw,
                                   frames_dev.aff, st.v, st.bg, st.ba))
        return self.build_kf_snapshot(pack, slot_fids)

    def event_idx(self, slots) -> np.ndarray:
        """C_ext indices of the event layout [s,g2 | per-slot 17] (calib
        coords are dropped: the intrinsics are pinned by a huge prior)."""
        F = self.f_max
        Cv = ba_solve.cdim(F)
        Cg = Cv + 9 * F
        idx = [Cg, Cg + 1, Cg + 2]
        for slot in slots:
            idx.extend(range(ba_solve.CPART + 8 * slot,
                             ba_solve.CPART + 8 * slot + 8))
            idx.extend(range(Cv + 9 * slot, Cv + 9 * slot + 9))
        return np.asarray(idx)

    def cext_to_event(self, H_ext, b_ext, slots):
        """Remap a C_ext-layout quadratic onto the event layout."""
        idx = self.event_idx(slots)
        return (np.asarray(H_ext, np.float64)[np.ix_(idx, idx)],
                np.asarray(b_ext, np.float64)[idx])

    def record_base_event(self, frames_dev, slot_fids) -> None:
        """Log the activation-time prior as the delayed log's base
        quadratic (victim-less event), so a later marginalization
        replacement can re-derive the COMPLETE main prior from the log
        (the reference's delayed graph receives every factor group the
        main graph does, DelayedMarginalization.h factor groups)."""
        if self.phase != ACTIVE or self.states is None:
            return
        slots = [s for s, f in enumerate(slot_fids) if f is not None]
        fids = [slot_fids[s] for s in slots]
        # Include the activation PRIOR (velocities/biases AND the
        # init-marginal scale/gravity pin) alongside the (at this point
        # empty) marginalization quadratic: the reference's delayed graph
        # receives the priors factor group too. Without it PGBA's scale is
        # blind to what the coarse init established, and on low-excitation
        # stretches (flat chi^2 valley over s, measured dE ~ 6 over a 38%
        # scale range) it drifts multiple init-sigmas away and then ADOPTS
        # on a formally-tighter-but-biased marginal.
        # (After a marginalization REPLACEMENT the rebuilt HM carries this
        # prior while the window solver still adds prior_diag — a benign
        # double-count: vel 4, bias 1e4 vs ~3e8 walk factors, and 2x on
        # the scale/gravity pin, which is a pin either way.)
        H_full = np.asarray(self.HM, np.float64).copy()
        if self.prior_diag is not None:
            H_full[np.diag_indices_from(H_full)] += np.asarray(
                self.prior_diag, np.float64)
            # Scale/gravity enter the LOG at the init's HONEST marginal,
            # not the window-stability floor (1e4 = sigma 1%): with the
            # floor copied in, every PGBA over the log reported s_var ~=
            # 1e-4 no matter what the data said (measured, round 4) — the
            # first cycle adopted the pin value and the improvement
            # ratchet then blocked all later, better-informed adoptions.
            # The window BA keeps its hard pin via prior_diag; only what
            # PGBA gets to believe about the init changes. Gravity gets a
            # moderate ~2.9-degree prior for the same reason.
            F = self.f_max
            Cg = ba_solve.cdim(F) + 9 * F
            sv = float(getattr(self, "init_s_var", 1.0))
            H_full[Cg, Cg] += (1.0 / max(sv, 1e-8)
                               - float(self.prior_diag[Cg]))
            for k_ in (1, 2):
                H_full[Cg + k_, Cg + k_] += (
                    min(float(self.prior_diag[Cg + k_]), 400.0)
                    - float(self.prior_diag[Cg + k_]))
        H_ev, b_ev = self.cext_to_event(H_full, self.bM0, slots)
        fej = self.snapshot_kf_states(frames_dev, slot_fids, use_fej=True)
        st_np = jax.device_get((self.states.s_log0, self.states.g20))
        self.delayed_log.record_event(delayed.MargEvent(
            victim=-1, fids=fids, H=H_ev, b0=b_ev,
            fej={f: fej[f] for f in fids if f in fej},
            s_log0=float(st_np[0]), g20=np.asarray(st_np[1])), [])

    def replace_prior_from_log(self, frames_dev, slot_fids, res,
                               target=None) -> bool:
        """Marginalization replacement: swap the main prior for one
        re-derived from the delayed log at the PGBA-refined linearization
        point (prepareGraphForMainOptimization,
        PoseGraphBundleAdjustment.cpp:508). `target`: prefetched FEJ
        snapshot (adoption path batches it with its state fetch)."""
        F = self.f_max
        slots = [s for s, f in enumerate(slot_fids) if f is not None]
        window_fids = [slot_fids[s] for s in slots]
        if target is None:
            target = self.snapshot_kf_states(frames_dev, slot_fids,
                                             use_fej=True)
        out = self.delayed_log.rebuild_prior(
            window_fids, target, res.states, res.s_log,
            np.asarray(res.g2))
        if out is None:
            return False
        H_ev, b_ev = out
        if not (np.all(np.isfinite(H_ev)) and np.all(np.isfinite(b_ev))):
            return False
        C = vio_ba.cdim_ext(F)
        HM = np.zeros((C, C), np.float64)
        bM = np.zeros(C, np.float64)
        idx = self.event_idx(slots)
        HM[np.ix_(idx, idx)] = H_ev
        bM[idx] = b_ev
        self.HM = HM
        self.bM0 = bM
        return True

    def record_marg_event(self, victim_fid, slots, slot_fids,
                          H_ext_add, b_ext_add, frames_dev,
                          removed_pairs, slot_fid_map,
                          fej_snapshot=None, st0=None) -> None:
        """Append one marginalization event + the victim's symbolic pairs
        to the delayed log (DelayedGraph's addMarginalizedPointsBA +
        marginalization enqueue, DelayedMarginalization.cpp:82).

        fej_snapshot / st0 skip the device fetches when the caller already
        fetched the FEJ pack in its batched sync."""
        if self.phase != ACTIVE or self.states is None:
            return
        fej = (fej_snapshot if fej_snapshot is not None else
               self.snapshot_kf_states(frames_dev, slot_fids, use_fej=True))
        fids = [slot_fids[sl] for sl in slots]
        H_ev, b_ev = self.cext_to_event(H_ext_add, b_ext_add, slots)
        st_np = (st0 if st0 is not None else
                 jax.device_get((self.states.s_log0, self.states.g20)))
        ev = delayed.MargEvent(
            victim=victim_fid, fids=fids, H=H_ev, b0=b_ev,
            fej={f: fej[f] for f in fids if f in fej},
            s_log0=float(st_np[0]), g20=np.asarray(st_np[1]))
        sym = []
        for tup in removed_pairs:
            i, j = tup[0], tup[1]
            pre_np = tup[3] if len(tup) > 3 and tup[3] is not None else None
            fi = slot_fid_map.get(i)
            fj = slot_fid_map.get(j)
            if pre_np is not None and fi is not None and fj is not None:
                sym.append(delayed.SymbolicPair(fid_i=fi, fid_j=fj,
                                                pre=pre_np))
        self.delayed_log.record_event(ev, sym)

    # Run PGBA on a background thread (the reference's RealtimePGBAState
    # runs GTSAM LM off the BA thread, IMUInitializerStates.h:137-210;
    # adoption happens at a LATER keyframe against the live delayed log,
    # whose newer events cover keyframes created meanwhile — the
    # counterpart of extendGraph + DisconnectedDelayedGraph,
    # PoseGraphBundleAdjustment.cpp:108-207). pgba.run is pure host
    # NumPy on a snapshot, so the thread never touches device state.
    # FullSystem sets this to cfg.realtime: like the reference, the
    # non-realtime ("linearizeOperation") mode stays deterministic.
    pgba_background = False

    def maybe_run_pgba(self, frames_dev, slot_fids,
                       active_event_fn=None, every: Optional[int] = None,
                       submit_fn=None) -> bool:
        """Trigger PGBA periodically; adopt its result when the scale
        marginal improves (threshold-gated transitions,
        IMUInitializerTransitions.h:62-163).

        submit_fn (the realtime pipeline's fetch-pool submit) makes the
        snapshot fetch ASYNCHRONOUS: the trigger keyframe dispatches the
        programs and submits the copy; the NEXT keyframe's finalize
        consumes it and starts the optimization. Right behind a keyframe
        tail even the batched one-RTT fetch measured ~120 ms of critical
        path (it must drain the queued tail first); deferring one KF costs
        nothing — PGBA optimizes a snapshot by design."""
        if self.phase != ACTIVE or self.states is None:
            return False
        if self.calib.transition_model == 5:
            # ONLY_COARSE_IMU_INIT ablation: never run PGBA
            # (IMUInitializerTransitions.h:142-163, configs/ablations/
            # 4seasonsNoPGBA.yaml init_transitionModel: 5).
            return False
        # Harvest a finished background optimization first.
        bg = getattr(self, "_pgba_bg", None)
        if bg is not None:
            if bg["thread"].is_alive():
                return False        # still optimizing; keep collecting KFs
            self._pgba_bg = None
            res = bg["result"][0]
            if res is not None:
                self.last_pgba_svar = float(res.s_var)
            if res is not None and res.ok:
                return self._adopt_pgba(res, frames_dev, slot_fids)
            # Failed/insufficient background run: retry in 2 KFs rather
            # than waiting out a whole cadence slot (mirrors the
            # synchronous path below).
            self.kf_since_pgba = max(
                self.kf_since_pgba,
                max(2, self.calib.pgba_every // 2) - 2)
            return False
        # A pending async snapshot from the trigger keyframe: its copy
        # landed during the frames since — build inputs and start.
        pending = getattr(self, "_pgba_pending", None)
        if pending is not None:
            self._pgba_pending = None
            with TimeMeasurement("pgba_snapshot"):
                win_pack, ev_pack, st_np = pending["future"].result()
                win = self.build_kf_snapshot(win_pack,
                                             pending["slot_fids"])
                active_event = (pending["ev_build"](ev_pack)
                                if pending["ev_build"] else None)
            return self._start_pgba(win, active_event, st_np,
                                    frames_dev, slot_fids)
        self.kf_since_pgba += 1
        if every is None:
            every = self.calib.pgba_every
        # Schedule anchored at activation, denser early: the first two
        # cycles fire at half cadence (and a lower event floor) so SHORT
        # sequences still get 2-3 adoption chances — measured (round 3/4,
        # docs/ACCURACY.md): runs whose codegen basin completed only 0-1
        # cycles kept a locally-drifted activation pin (se3 10-13%) while
        # 3-cycle runs re-adopted to ~3%; the reference's threshold-gated
        # transitions likewise keep retrying from the first keyframes
        # (IMUInitializerTransitions.h:62-163).
        n_done = getattr(self, "pgba_count", 0)
        gate = max(2, every // 2) if n_done < 2 else every
        if self.kf_since_pgba < gate or len(self.delayed_log.events) < 4:
            return False
        self.kf_since_pgba = 0
        self.pgba_count = n_done + 1
        st = self.states
        ev_disp = (active_event_fn()
                   if active_event_fn is not None else None)
        win_refs = ((frames_dev.R_cw, frames_dev.t_cw, frames_dev.aff,
                     st.v, st.bg, st.ba)
                    if frames_dev is not None else None)
        refs = (win_refs, ev_disp[0] if ev_disp else None,
                (st.s_log, st.g2))
        if submit_fn is not None and win_refs is not None:
            # Async: copy rides the fetch pool; consumed next keyframe.
            self._pgba_pending = dict(
                future=submit_fn(refs), slot_fids=list(slot_fids),
                ev_build=ev_disp[1] if ev_disp else None)
            return False
        with TimeMeasurement("pgba_snapshot"):
            win_pack, ev_pack, st_np = jax.device_get(refs)
            win = (self.build_kf_snapshot(win_pack, slot_fids)
                   if win_pack is not None
                   else self.snapshot_kf_states(frames_dev, slot_fids,
                                                use_fej=False))
            active_event = ev_disp[1](ev_pack) if ev_disp else None
        return self._start_pgba(win, active_event, st_np, frames_dev,
                                slot_fids)

    def _start_pgba(self, win, active_event, st_np, frames_dev,
                    slot_fids) -> bool:
        if self.pgba_background:
            import threading

            log_copy = self.delayed_log.snapshot()
            holder = [None]

            def work():
                try:
                    holder[0] = pgba.run(log_copy, win, active_event,
                                         float(st_np[0]),
                                         np.asarray(st_np[1]),
                                         max_kfs=self.calib.pgba_max_kfs)
                except Exception:
                    holder[0] = None

            th = threading.Thread(target=work, daemon=True)
            th.start()
            self._pgba_bg = {"thread": th, "result": holder}
            return False
        with TimeMeasurement("pgba"):
            res = pgba.run(self.delayed_log, win, active_event,
                           float(st_np[0]), np.asarray(st_np[1]),
                           max_kfs=self.calib.pgba_max_kfs)
        if res is not None:
            self.last_pgba_svar = float(res.s_var)
        if res is None or not res.ok:
            # A failed/insufficient run must not consume the whole
            # cadence slot (short sequences get few): retry in 2 KFs.
            self.kf_since_pgba = max(
                self.kf_since_pgba,
                max(2, self.calib.pgba_every // 2) - 2)
            return False
        return self._adopt_pgba(res, frames_dev, slot_fids)

    def _adopt_pgba(self, res, frames_dev, slot_fids) -> bool:
        """Gate + take over a PGBA result (scale/gravity/velocities/biases
        + marginalization replacement per the transition model)."""
        # Absolute quality gate first (a PGBA over dozens of keyframes must
        # constrain scale tightly; threshold scaled by
        # init_pgba_scaleUncertaintyThresh), then require improvement.
        if not (res.s_var < 0.05 * self.calib.pgba_scale_th
                and res.s_var < self.best_pgba_var * 0.9):
            return False
        self.best_pgba_var = res.s_var
        self.pgba_adopt_count = getattr(self, "pgba_adopt_count", 0) + 1
        # Adopt scale/gravity (prior centers move with the FEJ mirrors) and
        # refresh current-window velocities/biases. ONE batched fetch
        # carries everything the whole adoption needs (states + the FEJ
        # frame mirrors for the prior rebuild below): each separate
        # device_get is a full ~30-55 ms link round trip, and the old
        # 4-fetch flow was the measured 300-740 ms `pgba_maybe` maxima
        # inside the keyframe scope under link stall (round-4 verdict).
        stx = self.states
        with TimeMeasurement("pgba_adopt_fetch"):
            fetch = jax.device_get(
                (stx.v, stx.bg, stx.ba,
                 (frames_dev.R0_cw, frames_dev.t0_cw, frames_dev.aff0))
                if frames_dev is not None
                else (stx.v, stx.bg, stx.ba, None))
        v = np.array(fetch[0])
        bg = np.array(fetch[1])
        ba_ = np.array(fetch[2])
        frames0_np = fetch[3]
        for slot, fid in enumerate(slot_fids):
            if fid is not None and fid in res.states:
                v[slot] = res.states[fid].v
                bg[slot] = res.states[fid].bg
                ba_[slot] = res.states[fid].ba
        self.states = stx._replace(
            s_log=jnp.asarray(res.s_log, jnp.float32),
            s_log0=jnp.asarray(res.s_log, jnp.float32),
            g2=jnp.asarray(res.g2, jnp.float32),
            g20=jnp.asarray(res.g2, jnp.float32),
            v=jnp.asarray(v, jnp.float32), v0=jnp.asarray(v, jnp.float32),
            bg=jnp.asarray(bg, jnp.float32),
            bg0=jnp.asarray(bg, jnp.float32),
            ba=jnp.asarray(ba_, jnp.float32),
            ba0=jnp.asarray(ba_, jnp.float32))
        self.s_log = float(res.s_log)
        self.g2 = np.asarray(res.g2)
        # Marginalization replacement: the old prior carries information
        # linearized at the pre-PGBA scale/gravity; re-derive it from the
        # delayed log at the adopted values. Ablations: model 1 never
        # replaces; model 4 skips the FIRST (initial) replacement only
        # (CombinedTransitionModelNoInitialMarginalizationReplacement).
        first = not getattr(self, "_pgba_adopted_once", False)
        self._pgba_adopted_once = True
        tm = self.calib.transition_model
        if tm != 1 and not (tm == 4 and first):
            # The FEJ target snapshot is assembled from the batched fetch
            # above (post-adoption v0/bg0/ba0 ARE the adopted host
            # arrays) — no further link traffic.
            target = None
            if frames0_np is not None:
                target = self.build_kf_snapshot(
                    (frames0_np[0], frames0_np[1], frames0_np[2],
                     v, bg, ba_), list(slot_fids))
            with TimeMeasurement("pgba_adopt_rebuild"):
                self.replace_prior_from_log(frames_dev, slot_fids, res,
                                            target=target)
        return True

    def reinit_coarse_from_ba(self, R_cw, t_cw, slot: int,
                              st_np=None) -> None:
        """BA -> coarse handoff after each keyframe optimization
        (finishKeyframeOptimization, BAIMULogic.cpp:641). st_np: states
        already fetched by the caller's batched sync (must be None after a
        PGBA adoption, which replaces the device states)."""
        if self.phase != ACTIVE or self.states is None:
            return
        st = st_np if st_np is not None else jax.device_get(self.states)
        bias = np.concatenate([st.bg[slot], st.ba[slot]])
        self.coarse = vio_coarse.init_from_ba(
            np.asarray(R_cw), np.asarray(t_cw), st.v[slot], bias,
            float(st.s_log), np.asarray(st.g2))
        self.s_log = float(st.s_log)
        self.g2 = np.asarray(st.g2)
        self._maybe_fix_scale(st)

    def _maybe_fix_scale(self, st) -> None:
        if getattr(self, "scale_fixed", False):
            return
        hist = getattr(self, "_s_hist", [])
        hist.append(float(np.exp(st.s_log)))
        self._s_hist = hist[-self.SCALE_FIX_WINDOW:]
        if len(self._s_hist) < self.SCALE_FIX_WINDOW:
            return
        lo, hi = min(self._s_hist), max(self._s_hist)
        if hi / max(lo, 1e-9) < self.SCALE_FIX_TH:
            self.scale_fixed = True
            # Move the scale/gravity FEJ to the converged value and pin it
            # with a huge prior (their HM information is negligible, so the
            # FEJ move is consistent).
            sdev = self.states
            self.states = sdev._replace(
                s_log0=sdev.s_log, g20=sdev.g2)
            pr = np.array(self.prior_diag)
            F = self.f_max
            Cg = ba_solve.cdim(F) + 9 * F
            pr[Cg:Cg + 3] = 1e8
            self.prior_diag = pr
