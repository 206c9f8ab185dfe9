"""Coarse-to-fine direct image alignment tracker.

TPU-native re-design of CoarseTracker::trackNewestCoarse
(src/dso/FullSystem/CoarseTracker.cpp:539) and its reference-map builder
makeCoarseDepthL0 (:138-295). Differences from the reference, by design:

- The whole coarse-to-fine LM optimization is ONE jitted program: the
  per-level iteration is a lax.while_loop with on-device accept/reject, so
  tracking a frame costs a single host->device dispatch instead of a host
  sync per LM iteration (reference iterates on the CPU, we must not chat
  with the TPU per iteration).
- The semi-dense reference cloud is the active-point set itself at every
  level (coordinates rescaled, colors re-sampled from the reference
  pyramid), instead of a projected + dilated per-level depth map. Masked
  fixed-capacity arrays keep all shapes static.
- The saturation-cutoff repeat (reference: re-run a level with 2x cutoff if
  >60% of terms saturate, CoarseTracker.cpp:630-640) is folded into the
  while_loop state as a multiplicative cutoff escalation.

The IMU-coupled variant (joint solve with an IMU factor graph per LM
iteration, CoarseIMULogic.cpp:295-367) plugs in by replacing `solve_fn`; see
models/coarse_imu.py.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import align, interp
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib, PYR_LEVELS

# Max LM iterations per level, coarse to fine ordering is reversed at use
# site; index by level (reference uses {10,20,50,50,50} fine->coarse).
MAX_ITERS = (10, 20, 50, 50, 50, 50)
HUBER_TH = 9.0
CUTOFF_TH = 20.0
# Weak priors on the relative brightness parameters, pulling (rho, b) toward
# 0. Without texture the affine pair is unobservable and would otherwise
# collapse the gain to zero to "explain" any constant image (the reference
# bounds affine estimation with setting_affineOptMode* priors similarly).
PRIOR_RHO = 50.0
PRIOR_B = 0.05


class TrackerRef(NamedTuple):
    """Reference keyframe data for tracking: pyramid + per-level clouds."""

    pyr: tuple  # tuple of [3, H_l, W_l] arrays
    clouds: tuple  # tuple of align.PointCloud per level


class TrackResult(NamedTuple):
    R: jnp.ndarray            # ref -> new rotation
    t: jnp.ndarray            # ref -> new translation
    rho: jnp.ndarray          # relative log brightness gain
    b_aff: jnp.ndarray        # relative brightness offset
    v: jnp.ndarray            # [3] velocity (meaningful with an IMU prior)
    bias: jnp.ndarray         # [6] IMU bias [bg, ba]
    H_vis: jnp.ndarray        # [8,8] finest-level photometric Hessian in
                              # Mahalanobis units (for the coarse filter)
    level_energy: jnp.ndarray  # [L] final mean energy per level (fine = idx 0)
    level_terms: jnp.ndarray   # [L] term counts
    flow_t: jnp.ndarray
    flow_rt: jnp.ndarray
    valid: jnp.ndarray         # bool: finite results and enough terms


def make_tracker_ref(
    ref_pyr: Sequence[jnp.ndarray],
    calib0: Calib,
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    idepth: jnp.ndarray,
    mask: jnp.ndarray,
) -> TrackerRef:
    """Build per-level reference clouds from level-0 points.

    Equivalent role to makeCoarseDepthL0 + per-level downsampling
    (CoarseTracker.cpp:138-295): supplies (u, v, idepth, color, mask) per
    pyramid level in the reference keyframe.
    """
    clouds = []
    for l, lvl in enumerate(ref_pyr):
        s = 0.5**l
        ul = (u0 + 0.5) * s - 0.5
        vl = (v0 + 0.5) * s - 0.5
        h, w = lvl.shape[-2:]
        m = mask & interp.in_bounds(ul, vl, h, w, pad=2.0) & (idepth > 0)
        color = interp.bilinear(lvl[0], ul, vl)
        clouds.append(
            align.PointCloud(u=ul, v=vl, idepth=idepth, color=color, mask=m)
        )
    return TrackerRef(pyr=tuple(ref_pyr), clouds=tuple(clouds))


class CoarsePrior(NamedTuple):
    """Gaussian prior fused into the per-level joint solve (the IMU side of
    CoarseIMULogic::computeCoarseUpdate, CoarseIMULogic.cpp:295-367).

    Coordinates [17]: [xi(6) left-inc on the TRACKED pose, aff(2), v(3),
    bias(6)]. `H` is information in the BA/VIO unit system (Mahalanobis);
    centers define the zero-delta point. Pose center is relative to the
    tracking reference (same chart as the tracker state)."""

    H: jnp.ndarray       # [17, 17]
    R0: jnp.ndarray      # [3, 3]
    t0: jnp.ndarray      # [3]
    aff0: jnp.ndarray    # [2]
    v0: jnp.ndarray      # [3]
    b0: jnp.ndarray      # [6]


# Photometric noise weight tying tracker units to the prior's Mahalanobis
# units (see models/vio_ba.W_DSO rationale).
W_PHOTO = 1.0 / 64.0


class _LMState(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    rho: jnp.ndarray
    b_aff: jnp.ndarray
    v: jnp.ndarray
    bias: jnp.ndarray
    lam: jnp.ndarray
    energy: jnp.ndarray     # mean energy at current accepted state
    terms: jnp.ndarray
    H: jnp.ndarray          # [8,8] GN system at the current state
    b: jnp.ndarray          # [8]
    cutoff_mult: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def _prior_delta(pr: CoarsePrior, R, t, rho, b_aff, v, bias):
    Ri, ti = lie.se3_inv(pr.R0, pr.t0)
    xi = lie.se3_log(*lie.se3_mul(R, t, Ri, ti))
    return jnp.concatenate([
        xi, jnp.stack([rho, b_aff]) - pr.aff0, v - pr.v0, bias - pr.b0,
    ])


def _track_level(
    tgt_level, calib_l, pc, R0, t0, rho0, b0, max_it: int,
    prior: CoarsePrior | None = None,
    v0=None, bias0=None,
):
    """LM on one pyramid level, fully on-device; optionally fused with a
    17-dof Gaussian prior (IMU-aided tracking).

    ONE gather pass per LM iteration: the trial evaluation computes the GN
    system alongside the energy, so an accepted step's H/b are reused for
    the next solve instead of re-sampling (the reference re-runs calcRes +
    calcGSSSE separately each iteration, CoarseTracker.cpp:599-664 — on TPU
    the image-sampling pass dominates, so halving the passes nearly halves
    tracker latency)."""
    z3 = jnp.zeros(3) if v0 is None else v0
    z6 = jnp.zeros(6) if bias0 is None else bias0

    def eval_state(R, t, rho, b, v, bias, cmult, terms_hint):
        """One fused pass: GN system + mean energy at (R, t, rho, b)."""
        H, bvec, stats = align.calc_res_and_gs(
            tgt_level, calib_l, pc, R, t, jnp.exp(rho), b,
            HUBER_TH, CUTOFF_TH, cmult,
        )
        n = stats.num_terms
        em = stats.energy / jnp.maximum(n, 1.0)
        if prior is not None:
            # Prior energy rescaled into mean-photometric units (the joint
            # system is solved in mean units; see the solve below).
            d = _prior_delta(prior, R, t, rho, b, v, bias)
            hint = n if terms_hint is None else terms_hint
            scale = 1.0 / (W_PHOTO * jnp.maximum(hint, 1.0))
            em = em + (d @ (prior.H @ d)) * scale
        return H, bvec, em, n

    # Cutoff escalation (reference levelCutoffRepeat): double the cutoff
    # until <60% of terms saturate — all ratios from one sampling pass.
    ratios = align.calc_sat_profile(
        tgt_level, calib_l, pc, R0, t0, jnp.exp(rho0), b0, CUTOFF_TH)
    cmult = jnp.where(ratios[0] <= 0.6, 1.0,
                      jnp.where(ratios[1] <= 0.6, 2.0,
                                jnp.where(ratios[2] <= 0.6, 4.0, 8.0)))

    H0, b0_vec, e0, n0 = eval_state(R0, t0, rho0, b0, z3, z6, cmult, None)
    # A level with almost no valid terms cannot produce a trustworthy step
    # — skip it entirely rather than corrupt a good initialization (the
    # reference repeats a level only when enough terms saturate but always
    # has a dense depth map; our per-level cloud can thin out).
    init = _LMState(
        R=R0, t=t0, rho=rho0, b_aff=b0, v=z3, bias=z6,
        lam=jnp.array(0.01, jnp.float32), energy=e0, terms=n0,
        H=H0, b=b0_vec,
        cutoff_mult=cmult, it=jnp.array(0, jnp.int32),
        done=n0 < 20.0,
    )

    def cond(st: _LMState):
        return (st.it < max_it) & (~st.done)

    def body(st: _LMState):
        nrm = jnp.maximum(st.terms, 1.0)
        Hs = st.H / nrm
        bs = st.b / nrm
        reg = jnp.array([0, 0, 0, 0, 0, 0, PRIOR_RHO, PRIOR_B], Hs.dtype)
        Hs = Hs + jnp.diag(reg)
        bs = bs + reg * jnp.array(
            [0, 0, 0, 0, 0, 0, st.rho, st.b_aff], Hs.dtype
        )
        if prior is None:
            Hl = Hs + st.lam * jnp.diag(jnp.diag(Hs)) \
                + 1e-8 * jnp.eye(8, dtype=Hs.dtype)
            step8 = jnp.linalg.solve(Hl, -bs)
            step8 = jnp.where(jnp.isfinite(step8), step8, 0.0)
            step_v = jnp.zeros(3)
            step_b = jnp.zeros(6)
        else:
            # Joint 17-dof solve in mean-photometric units: the prior H is
            # divided by (W_PHOTO * terms) to match (the reference instead
            # converts the DSO system into GTSAM units — same algebra).
            scale = 1.0 / (W_PHOTO * nrm)
            d = _prior_delta(prior, st.R, st.t, st.rho, st.b_aff,
                             st.v, st.bias)
            H17 = jnp.zeros((17, 17), Hs.dtype).at[:8, :8].set(Hs)
            b17 = jnp.zeros(17, Hs.dtype).at[:8].set(bs)
            H17 = H17 + prior.H * scale
            b17 = b17 + (prior.H @ d) * scale
            Hl = H17 + st.lam * jnp.diag(jnp.diag(H17)) \
                + 1e-8 * jnp.eye(17, dtype=Hs.dtype)
            step = jnp.linalg.solve(Hl, -b17)
            step = jnp.where(jnp.isfinite(step), step, 0.0)
            step8 = step[:8]
            step_v = step[8:11]
            step_b = step[11:17]
        Rn, tn = lie.se3_retract(st.R, st.t, step8[:6])
        # Hard bounds on the brightness pair: under a conflicting prior the
        # affine DOFs are the escape valve and can run away to overflow.
        rhon = jnp.clip(st.rho + step8[6], -2.0, 2.0)
        bn = jnp.clip(st.b_aff + step8[7], -80.0, 80.0)
        vn = st.v + step_v
        biasn = st.bias + step_b
        Hn, bn_vec, en, nn = eval_state(Rn, tn, rhon, bn, vn, biasn,
                                        st.cutoff_mult, st.terms)
        accept = (en < st.energy) & jnp.isfinite(en)
        # Reference termination: break when the step norm drops under 1e-3
        # (trackNewestCoarse, CoarseTracker.cpp:655-663) — i.e. squared
        # norm 1e-6. ALSO break when an ACCEPTED step no longer moves the
        # energy: each LM iteration costs a full image-sampling pass on
        # device, and a converged level otherwise burns its whole iteration
        # budget. (Flat REJECTED steps must NOT break — mid-optimization a
        # barely-worse trial only means lambda is too small; breaking there
        # measurably hurts trajectory accuracy.)
        small = jnp.sum(step8 * step8) < 1e-6
        flat = accept & (jnp.abs(en - st.energy)
                         < 2e-4 * jnp.maximum(st.energy, 1e-12))
        sel = lambda a, o: jnp.where(accept, a, o)
        return _LMState(
            R=sel(Rn, st.R),
            t=sel(tn, st.t),
            rho=sel(rhon, st.rho),
            b_aff=sel(bn, st.b_aff),
            v=sel(vn, st.v),
            bias=sel(biasn, st.bias),
            lam=jnp.where(accept, jnp.maximum(st.lam * 0.25, 1e-6),
                          st.lam * 4.0),
            energy=sel(en, st.energy),
            terms=sel(nn, st.terms),
            H=sel(Hn, st.H),
            b=sel(bn_vec, st.b),
            cutoff_mult=st.cutoff_mult,
            it=st.it + 1,
            done=small | flat | (st.lam > 1e4),
        )

    out = jax.lax.while_loop(cond, body, init)
    return out


def track(
    ref: TrackerRef,
    new_pyr: Sequence[jnp.ndarray],
    calib0: Calib,
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    rho_init: jnp.ndarray,
    b_init: jnp.ndarray,
    levels: int = PYR_LEVELS,
    prior: CoarsePrior | None = None,
    v_init: jnp.ndarray | None = None,
    bias_init: jnp.ndarray | None = None,
):
    """Coarse-to-fine track of a new frame against the reference keyframe.

    One jitted program; returns TrackResult. With `prior`, every level's LM
    is the joint visual+IMU 17-dof solve (trackNewestCoarse +
    computeCoarseUpdate, CoarseTracker.cpp:539 / CoarseIMULogic.cpp:295).
    The caller decides on retries with perturbed initializations (reference
    FullSystem.cpp:371-402) and on keyframe creation from the flow stats.
    """
    R, t = R_init, t_init
    rho, b_aff = rho_init, b_init
    v = jnp.zeros(3) if v_init is None else v_init
    bias = jnp.zeros(6) if bias_init is None else bias_init
    level_energy = []
    level_terms = []
    for lvl in range(levels - 1, -1, -1):
        calib_l = calib0.at_level(lvl)
        st = _track_level(
            new_pyr[lvl], calib_l, ref.clouds[lvl], R, t, rho, b_aff,
            MAX_ITERS[min(lvl, len(MAX_ITERS) - 1)],
            prior=prior, v0=v, bias0=bias,
        )
        R, t, rho, b_aff, v, bias = st.R, st.t, st.rho, st.b_aff, st.v, st.bias
        level_energy.append(st.energy)
        level_terms.append(st.terms)

    level_energy = jnp.stack(level_energy[::-1])  # index 0 = finest
    level_terms = jnp.stack(level_terms[::-1])

    # Flow indicators at the finest level for the KF decision heuristic.
    H_fin, _, stats = align.calc_res_and_gs(
        new_pyr[0], calib0, ref.clouds[0], R, t, jnp.exp(rho), b_aff,
        HUBER_TH, CUTOFF_TH, 1.0,
    )

    finite = (
        jnp.all(jnp.isfinite(level_energy))
        & jnp.all(jnp.isfinite(t))
        & jnp.all(jnp.isfinite(R))
    )
    enough = level_terms[0] > 10.0
    # Pose observability: with a textureless/garbage target the image
    # gradients vanish and the 6x6 pose block of H carries no information —
    # a zero-energy "fit" there must not count as a valid track.
    pose_info = jnp.trace(H_fin[:6, :6]) / jnp.maximum(level_terms[0], 1.0)
    enough = enough & (pose_info > 1e-3)
    valid = finite & enough
    # ONE packed stats array: scalar fetches cost ~400 ms each through the
    # device tunnel while a single small-array fetch is ~milliseconds; the
    # host parses everything it needs from this.
    packed = jnp.concatenate([
        R.reshape(-1), t, rho[None], b_aff[None], v, bias,      # 0:23
        jnp.stack([stats.flow_t, stats.flow_rt]),               # 23:25
        level_energy, level_terms,                              # 25:25+2L
        valid.astype(jnp.float32)[None],                        # 25+2L
        (H_fin * W_PHOTO).reshape(-1),                          # +1 : +65
    ])
    return TrackResult(
        R=R, t=t, rho=rho, b_aff=b_aff, v=v, bias=bias,
        H_vis=H_fin * W_PHOTO,
        level_energy=level_energy, level_terms=level_terms,
        flow_t=stats.flow_t, flow_rt=stats.flow_rt,
        valid=valid,
    ), packed


track_jit = jax.jit(track, static_argnames="levels")


def track_multi(
    ref: TrackerRef,
    new_pyr,
    calib0: Calib,
    R_cands: jnp.ndarray,      # [C, 3, 3] candidate initializations
    t_cands: jnp.ndarray,      # [C, 3]
    cand_mask: jnp.ndarray,    # [C] bool
    rho_init: jnp.ndarray,
    b_init: jnp.ndarray,
    energy_gate: jnp.ndarray,  # scalar: "good enough" mean energy
    levels: int = PYR_LEVELS,
    prior: CoarsePrior | None = None,
    v_init: jnp.ndarray | None = None,
    bias_init: jnp.ndarray | None = None,
):
    """Track EVERY candidate initialization in one program and select the
    winner on device.

    The reference tries candidates sequentially and stops at the first
    good-enough one (trackNewCoarse ladder, FullSystem.cpp:320-430). On TPU
    a sequential ladder costs one tunnel round trip per rung; batching the
    rungs costs almost nothing extra (the per-iteration kernels are
    latency-bound at this point count) and needs ONE sync. Selection
    mirrors the ladder: the first candidate beating `energy_gate` wins,
    else the best valid candidate by finest-level energy.

    Returns (TrackResult sliced at the winner, packed [D+2]) where the two
    extra slots carry (winner index, any-valid flag).
    """

    def one(R0, t0):
        return track(ref, new_pyr, calib0, R0, t0, rho_init, b_init,
                     levels, prior, v_init, bias_init)

    res, packed = jax.vmap(one)(R_cands, t_cands)     # packed [C, D]
    L = levels
    e0 = packed[:, 25]
    validc = (packed[:, 25 + 2 * L] > 0.5) & cand_mask
    e_eff = jnp.where(validc, e0, jnp.inf)
    passes = validc & (e0 < energy_gate)
    sel = jnp.where(jnp.any(passes), jnp.argmax(passes),
                    jnp.argmin(e_eff))
    sel_res = jax.tree_util.tree_map(lambda x: x[sel], res)
    sel_packed = jnp.concatenate([
        packed[sel],
        jnp.asarray(sel, jnp.float32)[None],
        jnp.any(validc).astype(jnp.float32)[None],
    ])
    return sel_res, sel_packed


track_multi_jit = jax.jit(track_multi, static_argnames="levels")


class PackedTrack:
    """Host-side view of the packed tracker stats array."""

    def __init__(self, arr: "np.ndarray", levels: int):
        import numpy as np

        a = np.asarray(arr)
        self.R = a[0:9].reshape(3, 3)
        self.t = a[9:12]
        self.rho = float(a[12])
        self.b_aff = float(a[13])
        self.v = a[14:17]
        self.bias = a[17:23]
        self.flow_t = float(a[23])
        self.flow_rt = float(a[24])
        L = levels
        self.level_energy = a[25:25 + L]
        self.level_terms = a[25 + L:25 + 2 * L]
        self.valid = a[25 + 2 * L] > 0.5
        self.H_vis = a[26 + 2 * L:26 + 2 * L + 64].reshape(8, 8)
        # track_multi appends (winner index, any-valid); absent otherwise.
        if a.shape[0] >= 26 + 2 * L + 64 + 2:
            self.sel = int(a[26 + 2 * L + 64])
            self.any_valid = a[26 + 2 * L + 64 + 1] > 0.5
        else:
            self.sel = 0
            self.any_valid = self.valid
        # A numerically diverged solve (non-finite pose, or a rotation that
        # stopped being orthonormal) must read as LOST, never as a valid
        # track: the pose feeds the host motion model and, via the next
        # keyframe, the marginalization prior — one inf poisons both
        # beyond recovery (observed as eigh() failures on the prior).
        with np.errstate(all="ignore"):
            finite = bool(np.all(np.isfinite(a[0:25])))
            if finite:
                finite = bool(abs(self.R[0] @ self.R[0] - 1.0) < 0.1)
            if finite:
                # Absurd-translation guard: a garbage solve can pass the
                # device gates with a handful of accidentally-in-bounds
                # terms; once its pose enters the motion model, each
                # subsequent candidate compounds it (observed: |t| 1e13
                # after a lost streak). Window-relative translations in a
                # sane DSO world are O(1); 1e3 is a 100x margin, so this
                # never fires on a legitimate track.
                finite = bool(np.linalg.norm(self.t) < 1e3)
        if not finite:
            self.valid = False
            self.any_valid = False
