"""Sliding-window photometric bundle adjustment: the LM driver.

TPU-native re-design of FullSystem::optimize
(src/dso/FullSystem/FullSystemOptimize.cpp:417) + EnergyFunctional::
solveSystemF (src/dso/OptimizationBackend/EnergyFunctional.cpp:841). The
whole multi-iteration LM optimization runs as ONE jitted program with
on-device accept/reject (lax.while_loop), instead of the reference's
host-side iterate/backup/restore choreography (backupState/loadSateBackup,
FullSystemOptimize.cpp:224-388). Point idepth steps are back-substituted on
device; outlier/OOB classification comes back as masks.

Energy convention matches the reference: photometric terms are
sum(hw * w^2 * r^2 * (2 - hw)); the marginalization-prior energy is
delta^T (2 bM0 + HM delta) (calcMEnergyF, EnergyFunctional.cpp:324).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import ba_solve, residuals
from dmvio_tpu.ops.ba_solve import cdim
from dmvio_tpu.ops.residuals import BAFrames, BAPoints, OUTLIER_TH
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib, PATTERN_NUM

# Minimum/maximum inverse depth clamps (reference setting_minIdepth ~ 0 and
# OOB logic in PointHessian::isOOB, HessianBlocks.h:476-506).
MIN_IDEPTH = 1e-4
MAX_IDEPTH = 50.0
MAX_BA_ITERS = 6          # reference setting_maxOptIterations (settings.cpp:102)
MIN_BA_ITERS = 1          # reference setting_minOptIterations


class BAProblem(NamedTuple):
    """Everything the jitted window optimizer consumes."""

    frames: BAFrames
    points: BAPoints
    calib: Calib
    calib0: jnp.ndarray     # [4] linearization point of the intrinsics
    HM: jnp.ndarray         # [C, C] marginalization prior (zero convention)
    bM0: jnp.ndarray        # [C]
    prior_diag: jnp.ndarray  # [C] diagonal priors (first-frame gauge, affine, calib)
    pair_mask: jnp.ndarray  # [F, P] candidate residual incidence


class BAResult(NamedTuple):
    frames: BAFrames
    points: BAPoints
    calib: Calib
    energy: jnp.ndarray          # final photometric energy
    iters: jnp.ndarray
    pair_outlier: jnp.ndarray    # [F, P] pairs to drop (energy/OOB)
    pair_oob: jnp.ndarray        # [F, P]
    pair_energy: jnp.ndarray     # [F, P] final per-pair robust energy
    idepth_new: jnp.ndarray      # [F, P] target-frame inverse depths
    u_new: jnp.ndarray           # [F, P]
    v_new: jnp.ndarray           # [F, P]
    frame_th: jnp.ndarray        # [F] adaptive per-frame energy threshold


# Adaptive frame energy threshold constants (settings.cpp:156-159 and the
# IMU cap, IMUSettings.h:59).
FRAME_TH_QUANTILE = 0.7          # setting_frameEnergyTHN
FRAME_TH_FAC_MEDIAN = 1.5        # setting_frameEnergyTHFacMedian
FRAME_TH_CONST_WEIGHT = 0.5      # setting_frameEnergyTHConstWeight
FRAME_TH_CONST = 26.0            # sqrt-domain constant floor
FRAME_TH_MAX = 5000.0            # maxFrameEnergyThreshold


def frame_energy_th(pair_energy: jnp.ndarray,
                    pair_ok: jnp.ndarray) -> jnp.ndarray:
    """Per-frame adaptive outlier threshold from the residual-energy
    distribution (setNewFrameEnergyTH, FullSystemOptimize.cpp:96-147):
    sqrt of the 0.7-quantile of the frame's active 8-pixel pattern
    energies, blended 50/50 with the constant 26, squared, capped at the
    IMU integration's 5000 (IMUIntegration.cpp:365-373). Frames with no
    active pairs fall back to the fixed 12^2 * patternNum."""
    F, P = pair_energy.shape
    e = jnp.where(pair_ok, pair_energy, jnp.inf)
    order = jnp.sort(e, axis=1)
    n = jnp.sum(pair_ok.astype(jnp.int32), axis=1)
    idx = jnp.clip((FRAME_TH_QUANTILE * n.astype(jnp.float32))
                   .astype(jnp.int32), 0, P - 1)
    nth = jnp.take_along_axis(order, idx[:, None], axis=1)[:, 0]
    s = jnp.sqrt(jnp.maximum(nth, 0.0))
    th = (FRAME_TH_CONST * FRAME_TH_CONST_WEIGHT
          + s * FRAME_TH_FAC_MEDIAN * (1.0 - FRAME_TH_CONST_WEIGHT)) ** 2
    th = jnp.minimum(th, FRAME_TH_MAX)
    return jnp.where(n > 0, th, OUTLIER_TH * PATTERN_NUM)


def _prior_energy(delta, HM, bM0, prior_diag):
    return delta @ (2.0 * bM0 + HM @ delta) + delta @ (prior_diag * delta)


def _apply_step(frames: BAFrames, points: BAPoints, calib: Calib,
                dx: jnp.ndarray, dxd: jnp.ndarray, F: int):
    cal_new = Calib.from_vec(calib.as_vec() + dx[:4])
    fsteps = dx[4:].reshape(F, 8)
    R_new, t_new = lie.se3_retract(frames.R_cw, frames.t_cw, fsteps[:, :6])
    aff_new = frames.aff + jnp.where(frames.mask[:, None], fsteps[:, 6:8], 0.0)
    R_new = jnp.where(frames.mask[:, None, None], R_new, frames.R_cw)
    t_new = jnp.where(frames.mask[:, None], t_new, frames.t_cw)
    frames_new = frames._replace(R_cw=R_new, t_cw=t_new, aff=aff_new)
    id_new = jnp.clip(points.idepth + dxd, MIN_IDEPTH, MAX_IDEPTH)
    id_new = jnp.where(points.mask, id_new, points.idepth)
    points_new = points._replace(idepth=id_new)
    return frames_new, points_new, cal_new


class _LoopState(NamedTuple):
    frames: BAFrames
    points: BAPoints
    calib: Calib
    # The ACCUMULATED system (BASystem, ~0.6 MB) rides the loop carry, not
    # the raw linearization (BAResiduals, [F,P,K,*] Jacobians, ~20 MB):
    # while_loop double-buffers its carry every iteration, and carrying the
    # dense Jacobians cost ~1.6 ms/iteration of pure copy (measured). The
    # final-state linearization for outlier classification is recomputed
    # once after the loop instead.
    sys: ba_solve.BASystem
    energy: jnp.ndarray       # accepted total energy
    photo_energy: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def optimize(problem: BAProblem, images: jnp.ndarray,
             max_iters: int = MAX_BA_ITERS,
             orthogonalize: bool = False) -> BAResult:
    """Run the windowed BA to (approximate) convergence, fully on device.

    Args:
      problem: the window state (see BAProblem).
      images: [F, 3, H, W] level-0 pyramids of all window frames.
      orthogonalize: project gauge directions out of each step (reference
        SOLVER_ORTHOGONALIZE_X_LATER). Leave False when the gauge is pinned
        by priors (the default window setup) — see solve_levenberg.
    """
    F = problem.frames.mask.shape[0]
    N_null = ba_solve.nullspaces(problem.frames, F) if orthogonalize else None

    # FEJ geometry is constant across the LM loop — hoist it.
    geo = residuals.fej_geometry(problem.frames, problem.points,
                                 problem.calib)

    def lin_at(frames, points, calib):
        return residuals.linearize(frames, points, calib, images,
                                   problem.pair_mask, geo=geo)

    def total_energy(frames, points, calib, lin):
        delta = ba_solve.state_delta(frames, calib, problem.calib0)
        return jnp.sum(lin.energy) + _prior_energy(
            delta, problem.HM, problem.bM0, problem.prior_diag
        )

    lin0 = lin_at(problem.frames, problem.points, problem.calib)
    e0 = total_energy(problem.frames, problem.points, problem.calib, lin0)

    init = _LoopState(
        frames=problem.frames, points=problem.points, calib=problem.calib,
        sys=ba_solve.accumulate(lin0, problem.points.host, F),
        energy=e0, photo_energy=jnp.sum(lin0.energy),
        lam=jnp.asarray(1e-4, jnp.float32),
        it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
    )

    def cond(st: _LoopState):
        return (st.it < max_iters) & ~st.done

    def body(st: _LoopState):
        sys = st.sys
        delta = ba_solve.state_delta(st.frames, st.calib, problem.calib0)
        bM_eff = problem.bM0 + problem.HM @ delta
        b_prior = problem.prior_diag * delta
        dx, dxd = ba_solve.solve_levenberg(
            sys, problem.HM, bM_eff, problem.prior_diag, b_prior,
            st.lam, st.frames.mask, st.points.mask, N_null,
        )
        frames_n, points_n, calib_n = _apply_step(
            st.frames, st.points, st.calib, dx, dxd, F
        )
        lin_n = lin_at(frames_n, points_n, calib_n)
        e_n = total_energy(frames_n, points_n, calib_n, lin_n)
        accept = (e_n < st.energy) & jnp.isfinite(e_n)

        step_sq = jnp.sum(dx * dx) + jnp.sum(dxd * dxd) / jnp.maximum(
            jnp.sum(st.points.mask.astype(jnp.float32)), 1.0
        )
        # Converged when the step is tiny OR the trial step moved the
        # energy by <2e-4 relative — in EITHER direction (the reference's
        # canbreak small-step termination, FullSystemOptimize.cpp:550-586).
        # A REJECTED flat step must terminate too: at a converged state
        # e_n == energy ties lose the accept test, and without this the
        # loop burns all max_iters device iterations going nowhere.
        rel_impr = (st.energy - e_n) / jnp.maximum(st.energy, 1e-12)
        converged = (step_sq < 1e-10) | (jnp.abs(rel_impr) < 2e-4)

        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(accept, x, y), a, b
        )
        return _LoopState(
            frames=sel(frames_n, st.frames),
            points=sel(points_n, st.points),
            calib=sel(calib_n, st.calib),
            sys=sel(ba_solve.accumulate(lin_n, points_n.host, F), st.sys),
            energy=jnp.where(accept, e_n, st.energy),
            photo_energy=jnp.where(accept, jnp.sum(lin_n.energy),
                                   st.photo_energy),
            lam=jnp.where(accept, jnp.maximum(st.lam * 0.25, 1e-6),
                          st.lam * 4.0),
            it=st.it + 1,
            # st.it+1 = iterations completed including this body: a
            # converged first iteration may exit (MIN_BA_ITERS=1 matches
            # the reference; the old `st.it >= 1` gate silently forced a
            # second full iteration).
            done=(converged & (st.it + 1 >= MIN_BA_ITERS)) | (st.lam > 1e3),
        )

    out = jax.lax.while_loop(cond, body, init)

    # Outlier classification on the final linearization. Recomputed at
    # the accepted state — cheaper than carrying the [F,P,K] linearization
    # through the loop (see _LoopState). The threshold is ADAPTIVE per
    # frame (setNewFrameEnergyTH, FullSystemOptimize.cpp:96-147): the 0.7
    # quantile of the frame's active pair energies blended with the
    # constant floor, squared; a pair is an outlier above the LOOSER of
    # its host/target thresholds (Residuals.cpp:262). Deviation from the
    # reference: thresholds are recomputed for every window frame each
    # keyframe (the reference freezes each frame's threshold at its own
    # keyframe time) — the batched recompute is free here and adapts old
    # frames to exposure/texture drift.
    lin_f = lin_at(out.frames, out.points, out.calib)
    pair_ok = problem.pair_mask & problem.points.mask[None, :]
    frame_th = frame_energy_th(lin_f.energy, pair_ok)
    th_pair = jnp.maximum(frame_th[:, None],
                          frame_th[problem.points.host][None, :])
    outlier = pair_ok & ((lin_f.energy > th_pair) | lin_f.oob)

    return BAResult(
        frames=out.frames, points=out.points, calib=out.calib,
        energy=out.photo_energy, iters=out.it,
        pair_outlier=outlier, pair_oob=lin_f.oob, pair_energy=lin_f.energy,
        idepth_new=lin_f.idepth_new, u_new=lin_f.u_new, v_new=lin_f.v_new,
        frame_th=frame_th,
    )


optimize_jit = jax.jit(optimize, static_argnames=("max_iters", "orthogonalize"))


def marginalization_update(
    problem: BAProblem,
    images: jnp.ndarray,
    marg_points: jnp.ndarray,   # [P] points to fold into the prior
):
    """Compute the (HM, bM0) increment for points being marginalized.

    Equivalent of EnergyFunctional::marginalizePointsF
    (EnergyFunctional.cpp:678): called before dropping the points.
    """
    F = problem.frames.mask.shape[0]
    lin = residuals.linearize(problem.frames, problem.points, problem.calib,
                              images, problem.pair_mask)
    delta = ba_solve.state_delta(problem.frames, problem.calib, problem.calib0)
    delta_d = jnp.where(problem.points.mask,
                        problem.points.idepth - problem.points.idepth_zero, 0.0)
    return ba_solve.marginalize_points_system(
        lin, problem.points.host, delta, delta_d, marg_points, F
    )


marginalization_update_jit = jax.jit(marginalization_update)


def select_victims(frames: BAFrames, age_rank: jnp.ndarray,
                   n_drop: jnp.ndarray, newest_slot) -> jnp.ndarray:
    """Device-side marginalization victim selection.

    The reference's flagFramesForMarginalization distance heuristic
    (FullSystemMarginalize.cpp:61): drop the n_drop eligible frames with
    the smallest score -sqrt(d_latest) * sum_j 1/(eps + d_j). Eligible =
    occupied and not among the two newest (age_rank, host-provided from
    slot bookkeeping — no fetch). Returns a [F] slot list padded with -1.
    """
    F = frames.mask.shape[0]
    occ = frames.mask
    t = frames.t_cw
    diff = t[:, None, :] - t[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    off_diag = jnp.arange(F)[:, None] != jnp.arange(F)[None, :]
    inv = jnp.where(occ[None, :] & off_diag, 1.0 / (1e-5 + dist), 0.0)
    score = -jnp.sqrt(dist[:, newest_slot]) * jnp.sum(inv, axis=1)
    n_occ = jnp.sum(occ.astype(jnp.int32))
    eligible = occ & (age_rank >= 0) & (age_rank < n_occ - 2)
    order = jnp.argsort(jnp.where(eligible, score, jnp.inf))
    return jnp.where(jnp.arange(F) < n_drop, order, -1)


def marg_fused(problem: BAProblem, images: jnp.ndarray,
               age_rank: jnp.ndarray, n_drop: jnp.ndarray, newest_slot):
    """Victim selection + point-marginalization fold + point drop in ONE
    program, so the whole keyframe pipeline costs a single device fetch
    (each blocking fetch is a full tunnel round trip).

    Returns (vlist [F], HM_add, bM_add, points_new, pair_mask_new,
    n_active_pre, n_active_post). With n_drop == 0 everything degenerates
    to zeros/no-ops — one compilation covers every keyframe.
    """
    from dmvio_tpu.models import window_ops

    F = problem.frames.mask.shape[0]
    vlist = select_victims(problem.frames, age_rank, n_drop, newest_slot)
    hosted, marg_pts, pm_cleared = window_ops.victims_masks(
        problem.points, problem.pair_mask, vlist)
    HM_add, bM_add = marginalization_update(problem, images, marg_pts)
    n_pre = jnp.sum(problem.points.mask.astype(jnp.float32))
    points_new, pm_new = window_ops.drop_points_mask(
        problem.points, pm_cleared, hosted)
    n_post = jnp.sum(points_new.mask.astype(jnp.float32))
    return vlist, HM_add, bM_add, points_new, pm_new, n_pre, n_post


marg_fused_jit = jax.jit(marg_fused)
