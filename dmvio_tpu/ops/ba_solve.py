"""Sliding-window BA linear algebra: H/b assembly, Schur, marginalization.

TPU-native re-design of the reference optimization backend:
  * AccumulatedTopHessian / MatrixAccumulators (SSE shift-register
    accumulation, src/dso/OptimizationBackend/AccumulatedTopHessian.cpp:40,
    MatrixAccumulators.h) -> one dense [N, C] Jacobian row matrix and a
    single J^T W J matmul on the MXU.
  * AccumulatedSCHessian (per-point Schur, AccumulatedSCHessian.cpp:34) ->
    batched einsums over the point axis.
  * EnergyFunctional::marginalizeFrame / marginalizePointsF / orthogonalize
    (EnergyFunctional.cpp:522-838) -> dense Schur complement + explicit
    nullspace projection, all masked/fixed-shape.

State ordering (see ops/residuals.py): x = [calib(4) | 8 per frame x F],
C = 4 + 8 F. The marginalization prior (HM, bM0) is stored in the "zero"
convention: bM0 is the gradient at the frames' FEJ states; at solve time the
effective gradient is bM0 + HM @ delta with delta = state (-) FEJ.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.ops.residuals import BAFrames, BAPoints, BAResiduals
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib

CPART = 4  # calib block size

# Exact-f32 einsum for normal-equation assembly: the contractions are tiny
# (pattern axis K=8, point axis P), so full precision costs nothing, while
# the TPU bf16 matmul default injects ~1e-3 relative noise into H that the
# LM solve then amplifies.
import functools as _functools
_es = _functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def cdim(F: int) -> int:
    return CPART + 8 * F


class BASystem(NamedTuple):
    """Assembled normal equations of the active photometric residuals."""

    H: jnp.ndarray      # [C, C] frame-frame (+calib) block
    b: jnp.ndarray      # [C]    gradient (J^T W r)
    H_fd: jnp.ndarray   # [P, C] frame-point coupling
    H_dd: jnp.ndarray   # [P]    point diagonal
    b_d: jnp.ndarray    # [P]    point gradient
    energy: jnp.ndarray  # scalar robust photometric energy
    num_terms: jnp.ndarray


def state_delta(frames: BAFrames, calib: Calib, calib0: jnp.ndarray) -> jnp.ndarray:
    """delta = current state (-) FEJ state, in the [C] layout.

    Pose delta is the left-increment log(T_cur @ T_fej^-1) (the analogue of
    get_state_minus_stateZero, HessianBlocks.h:150).
    """
    R0inv, t0inv = lie.se3_inv(frames.R0_cw, frames.t0_cw)
    Rd, td = lie.se3_mul(frames.R_cw, frames.t_cw, R0inv, t0inv)
    xi = lie.se3_log(Rd, td)                       # [F, 6]
    aff_d = frames.aff - frames.aff0               # [F, 2]
    fdelta = jnp.concatenate([xi, aff_d], axis=-1)  # [F, 8]
    fdelta = jnp.where(frames.mask[:, None], fdelta, 0.0)
    return jnp.concatenate([calib.as_vec() - calib0, fdelta.reshape(-1)])


def full_jacobian(res: BAResiduals, host: jnp.ndarray, F: int) -> jnp.ndarray:
    """Scatter per-pair Jacobians into full state rows: [F, P, K, C].

    The host/target one-hot contraction replaces the reference's adjoint
    "stitching" (AccumulatedTopHessian::stitchDouble,
    AccumulatedTopHessian.h:85-139).
    """
    P = host.shape[0]
    Jt8 = jnp.concatenate([res.J_pose_t, res.J_aff_t], axis=-1)  # [F,P,K,8]
    Jh8 = jnp.concatenate([res.J_pose_h, res.J_aff_h], axis=-1)
    tgt_oh = jnp.eye(F, dtype=Jt8.dtype)                         # [F, F]
    host_oh = jax.nn.one_hot(host, F, dtype=Jh8.dtype)           # [P, F]
    # Zero the host part when host == target (no self-residuals; pair_mask
    # should exclude them anyway, belt and braces).
    J_frames = (
        jnp.einsum("fj,fpkd->fpjkd", tgt_oh, Jt8)
        + jnp.einsum("pj,fpkd->fpjkd", host_oh, Jh8)
    )  # [F, P, F, K, 8] -> reorder to [F, P, K, F, 8]
    J_frames = jnp.moveaxis(J_frames, 2, 3)
    K = Jt8.shape[2]
    J_frames = J_frames.reshape(F, P, K, F * 8)
    return jnp.concatenate([res.J_calib, J_frames], axis=-1)    # [F,P,K,C]


def accumulate_dense(res: BAResiduals, host: jnp.ndarray, F: int) -> BASystem:
    """Reference assembly via the materialized full Jacobian [F, P, K, C].

    Kept for testing: `accumulate` must produce the same system. This form
    streams ~100 MB of scattered-Jacobian HBM traffic per call, which
    dominated the BA iteration cost (measured ~4-5 ms/iteration)."""
    J = full_jacobian(res, host, F)        # [F, P, K, C]
    C = J.shape[-1]
    wt = res.wt                            # [F, P, K], 0 on inactive lanes
    r = res.r

    N = J.shape[0] * J.shape[1] * J.shape[2]
    Jf = J.reshape(N, C)
    Jw = Jf * wt.reshape(N, 1)
    H = Jw.T @ Jf
    b = Jw.T @ r.reshape(N)

    wJdd = wt * res.J_dd                   # [F, P, K]
    H_fd = jnp.einsum("fpk,fpkc->pc", wJdd, J)
    H_dd = jnp.einsum("fpk,fpk->p", wJdd, res.J_dd)
    b_d = jnp.einsum("fpk,fpk->p", wJdd, r)

    energy = jnp.sum(res.energy)
    num_terms = jnp.sum(res.active.astype(jnp.float32))
    return BASystem(H=H, b=b, H_fd=H_fd, H_dd=H_dd, b_d=b_d,
                    energy=energy, num_terms=num_terms)


def accumulate(res: BAResiduals, host: jnp.ndarray, F: int) -> BASystem:
    """Assemble the normal equations blockwise — no full-Jacobian scatter.

    Each (target f, point p) pair touches exactly three column blocks of
    the state (calib 4, target pose+aff 8, host pose+aff 8), so the normal
    equations decompose into per-pair 8x8 / 8x4 / 4x4 blocks contracted
    over the pattern axis, then placed by target index (aligned) and host
    index (a one-hot [P, F] contraction — the same stitching idea as the
    reference's AccumulatedTopHessian::stitchDouble,
    AccumulatedTopHessian.h:85-139, but as MXU matmuls). Intermediates are
    [F, P, 8, 8] at most (~4 MB) instead of the dense [F, P, K, C]
    Jacobian (~35 MB); HBM traffic per call drops ~20x.
    """
    P = host.shape[0]
    Jt = jnp.concatenate([res.J_pose_t, res.J_aff_t], axis=-1)  # [F,P,K,8]
    Jh = jnp.concatenate([res.J_pose_h, res.J_aff_h], axis=-1)  # [F,P,K,8]
    Jc = res.J_calib                                            # [F,P,K,4]
    w = res.wt
    r = res.r
    O = jax.nn.one_hot(host, F, dtype=Jt.dtype)                 # [P, F]

    wJt = Jt * w[..., None]
    wJh = Jh * w[..., None]
    wJc = Jc * w[..., None]

    # --- frame-frame [F,8,F,8] -----------------------------------------
    h_tt = _es("fpka,fpkb->fab", wJt, Jt)     # target diag blocks
    h_hh = _es("fpka,fpkb->pab", wJh, Jh)     # host (per point)
    h_hh_g = _es("pg,pab->gab", O, h_hh)      # host diag blocks
    h_th = _es("fpka,fpkb->fpab", wJt, Jh)    # target x host
    h_th_g = _es("pg,fpab->fgab", O, h_th)    # [F(t),F(h),8,8]

    eyeF = jnp.eye(F, dtype=Jt.dtype)
    M = (_es("fab,fg->fagb", h_tt + h_hh_g, eyeF)
         + jnp.transpose(h_th_g, (0, 2, 1, 3))       # (f,a,g,b)
         + jnp.transpose(h_th_g, (1, 3, 0, 2)))      # symmetric part
    H_ff = M.reshape(8 * F, 8 * F)

    # --- calib rows ------------------------------------------------------
    H_cc = _es("fpka,fpkb->ab", wJc, Jc)                  # [4,4]
    h_tc = _es("fpka,fpkb->fab", wJt, Jc)                 # [F,8,4]
    h_hc = _es("pg,pab->gab", O,
                      _es("fpka,fpkb->pab", wJh, Jc))     # [F,8,4]
    H_fc = (h_tc + h_hc).reshape(8 * F, CPART)
    H = jnp.concatenate([
        jnp.concatenate([H_cc, H_fc.T], axis=1),
        jnp.concatenate([H_fc, H_ff], axis=1),
    ], axis=0)

    # --- gradient ---------------------------------------------------------
    b_c = _es("fpka,fpk->a", wJc, r)
    b_t = _es("fpka,fpk->fa", wJt, r)
    b_h = _es("pg,pa->ga", O, _es("fpka,fpk->pa", wJh, r))
    b = jnp.concatenate([b_c, (b_t + b_h).reshape(-1)])

    # --- point coupling / Schur pieces -----------------------------------
    wJdd = w * res.J_dd                                          # [F,P,K]
    fd_c = _es("fpk,fpkb->pb", wJdd, Jc)                  # [P,4]
    fd_t = _es("fpk,fpka->pfa", wJdd, Jt)                 # [P,F,8]
    fd_h = _es("pg,pa->pga", O,
                      _es("fpk,fpka->pa", wJdd, Jh))      # [P,F,8]
    H_fd = jnp.concatenate(
        [fd_c, (fd_t + fd_h).reshape(P, 8 * F)], axis=1)
    H_dd = _es("fpk,fpk->p", wJdd, res.J_dd)
    b_d = _es("fpk,fpk->p", wJdd, r)

    energy = jnp.sum(res.energy)
    num_terms = jnp.sum(res.active.astype(jnp.float32))
    return BASystem(H=H, b=b, H_fd=H_fd, H_dd=H_dd, b_d=b_d,
                    energy=energy, num_terms=num_terms)


def nullspaces(frames: BAFrames, F: int) -> jnp.ndarray:
    """Gauge nullspace directions N [C, 7] at the FEJ poses.

    Columns: 3 global translations, 3 global rotations, 1 global scale
    (reference getNullspaces, FullSystem.cpp:704; orthogonalize,
    EnergyFunctional.cpp:784-838). A world gauge motion G=exp(g) changes
    each world-to-cam pose by the left increment -Adj(T_cw) g; global scale
    s changes it by [t_cw, 0].
    """
    adj = lie.se3_adj(frames.R0_cw, frames.t0_cw)          # [F, 6, 6]
    n_se3 = -adj                                            # [F, 6, 6(g)]
    n_scale = jnp.concatenate(
        [frames.t0_cw, jnp.zeros_like(frames.t0_cw)], axis=-1
    )[..., None]                                            # [F, 6, 1]
    n_pose = jnp.concatenate([n_se3, n_scale], axis=-1)     # [F, 6, 7]
    n_pose = jnp.where(frames.mask[:, None, None], n_pose, 0.0)
    # Embed: zeros for calib and affine coords.
    C = cdim(F)
    N = jnp.zeros((C, 7), dtype=n_pose.dtype)
    for j in range(F):
        N = N.at[CPART + 8 * j: CPART + 8 * j + 6, :].set(n_pose[j])
    return N


def orthogonalize_step(dx: jnp.ndarray, N: jnp.ndarray) -> jnp.ndarray:
    """Remove gauge components from a step: dx - N pinv(N) dx.

    (reference EnergyFunctional::orthogonalize, EnergyFunctional.cpp:784.)
    """
    # Least-squares projection via normal equations with strong damping on
    # the tiny 7x7 system (SVD-free, jit-friendly).
    G = N.T @ N + 1e-9 * jnp.eye(N.shape[1], dtype=N.dtype)
    coef = jnp.linalg.solve(G, N.T @ dx)
    return dx - N @ coef


def solve_levenberg(
    sys: BASystem,
    HM: jnp.ndarray,
    bM_eff: jnp.ndarray,
    H_prior_diag: jnp.ndarray,
    b_prior: jnp.ndarray,
    lam: jnp.ndarray,
    frame_mask: jnp.ndarray,   # [F]
    point_mask: jnp.ndarray,   # [P] points contributing idepth DOFs
    N_null: jnp.ndarray | None = None,
):
    """One damped GN solve with point-Schur (EnergyFunctional::solveSystemF).

    Returns (dx_f [C], dx_d [P]). Steps solve H dx = -b. Unoccupied frame
    slots and inactive points receive exact-zero steps.

    N_null: optional gauge directions to project OUT of the step (reference
    SOLVER_ORTHOGONALIZE_X_LATER). Only pass this when the gauge is NOT
    pinned by priors — with a prior-fixed gauge, projection would make the
    prior-determined gauge component of the error uncorrectable.
    """
    F = frame_mask.shape[0]
    C = cdim(F)

    Hdd = sys.H_dd * (1.0 + lam) + 1e-10
    Hdd_inv = jnp.where(point_mask, 1.0 / Hdd, 0.0)

    Hfd_w = sys.H_fd * Hdd_inv[:, None]                      # [P, C]
    H_sc = sys.H_fd.T @ Hfd_w                                # [C, C]
    b_sc = sys.H_fd.T @ (sys.b_d * Hdd_inv)                  # [C]

    H = sys.H + HM + jnp.diag(H_prior_diag) - H_sc
    b = sys.b + bM_eff + b_prior - b_sc

    # LM damping on the frame block.
    H = H + lam * jnp.diag(jnp.diag(sys.H + HM + jnp.diag(H_prior_diag)))

    # Mask out unoccupied slots: identity rows/cols, zero gradient.
    coord_mask = jnp.concatenate(
        [jnp.ones((CPART,), bool),
         jnp.repeat(frame_mask, 8)]
    )
    cm = coord_mask.astype(H.dtype)
    H = H * cm[:, None] * cm[None, :] + jnp.diag(1.0 - cm)
    b = b * cm

    # Jacobi preconditioning for f32 conditioning (the reference solves in
    # double on the host; on TPU we equilibrate instead).
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
    Hp = H / (d[:, None] * d[None, :])
    bp = b / d
    Hp = Hp + 1e-7 * jnp.eye(C, dtype=H.dtype)
    dxp = jnp.linalg.solve(Hp, -bp)
    dx = dxp / d
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0) * cm

    if N_null is not None:
        dx = orthogonalize_step(dx, N_null)

    # Back-substitute point steps (EnergyFunctional::resubstituteF_MT).
    dx_d = -(sys.b_d + sys.H_fd @ dx) * Hdd_inv
    dx_d = jnp.where(point_mask, dx_d, 0.0)
    return dx, dx_d


def marginalize_points_system(
    res: BAResiduals,
    host: jnp.ndarray,
    delta: jnp.ndarray,
    delta_d: jnp.ndarray,
    pmask: jnp.ndarray,
    F: int,
):
    """Fold selected points into a (HM, bM0) prior contribution.

    Equivalent of EnergyFunctional::marginalizePointsF
    (EnergyFunctional.cpp:678-742): per selected point, build its normal
    equations with FEJ Jacobians and the residual shifted to the
    linearization point (r0 = r - J dx, the applyRes res_toZeroF logic,
    Residuals.cpp:306), then Schur-complement the idepth.

    Args:
      delta: current [C] state delta (current (-) FEJ).
      delta_d: current [P] idepth delta (idepth - idepth_zero).
      pmask: [P] points to marginalize.
    Returns (HM_add [C,C], bM0_add [C]).
    """
    # r0 = r - J delta - J_dd delta_d, contracted blockwise (each pair only
    # touches calib + target + host coordinate blocks — no [F,P,K,C]
    # Jacobian materialization; summation order matches `accumulate` so the
    # fold-then-solve Schur identity holds to f32).
    Jt = jnp.concatenate([res.J_pose_t, res.J_aff_t], axis=-1)  # [F,P,K,8]
    Jh = jnp.concatenate([res.J_pose_h, res.J_aff_h], axis=-1)
    d_c = delta[:CPART]
    d_f = delta[CPART:].reshape(F, 8)
    d_h = d_f[host]                                             # [P, 8]
    Jdelta = (_es("fpka,a->fpk", res.J_calib, d_c)
              + _es("fpka,fa->fpk", Jt, d_f)
              + _es("fpka,pa->fpk", Jh, d_h))
    r0 = res.r - Jdelta - res.J_dd * delta_d[None, :, None]

    # Normal equations over ONLY the marginalized points' pairs.
    res_m = res._replace(
        r=r0, wt=res.wt * pmask[None, :, None].astype(res.wt.dtype))
    sys = accumulate(res_m, host, F)

    Hdd_inv = jnp.where(pmask & (sys.H_dd > 1e-8),
                        1.0 / (sys.H_dd + 1e-10), 0.0)
    HM_add = sys.H - sys.H_fd.T @ (sys.H_fd * Hdd_inv[:, None])
    bM_add = sys.b - sys.H_fd.T @ (sys.b_d * Hdd_inv)
    return HM_add, bM_add


def schur_out(HM: jnp.ndarray, bM0: jnp.ndarray, marg: jnp.ndarray):
    """Schur-complement an arbitrary coordinate set out of a dense prior.

    `marg` is a [C] boolean mask of coordinates to eliminate (they need not
    be contiguous — a VIO frame owns 8 visual + 9 IMU coords in different
    blocks). Static shapes: the eliminated block is isolated by masking,
    inverted via an eigen pseudo-inverse (the reference uses a
    preconditioned pseudo-inverse, Marginalization.cpp:140-180), and the
    eliminated rows/cols are zeroed so slots can be reused.
    """
    m = marg.astype(HM.dtype)
    k = 1.0 - m
    # Hbb on the eliminated block, identity elsewhere -> its inverse is
    # block-diagonal with inv(Hbb) on the block and identity off it, and
    # (H M) inv(...) (M H) = H[:,B] inv(Hbb) H[B,:].
    Hbb_f = (m[:, None] * HM * m[None, :]) + jnp.diag(k)
    Hbb_f = 0.5 * (Hbb_f + Hbb_f.T)
    evals, evecs = jnp.linalg.eigh(Hbb_f)
    inv_evals = jnp.where(
        evals > 1e-8 * jnp.maximum(jnp.max(jnp.abs(evals)), 1e-12),
        1.0 / evals, 0.0)
    Hbb_inv = (evecs * inv_evals[None, :]) @ evecs.T
    # Remove the keep-coordinate identity before using as pinv(Hbb).
    Hbb_inv = m[:, None] * Hbb_inv * m[None, :]

    HMm = HM * m[None, :]          # columns of the eliminated block
    HM_new = HM - HMm @ Hbb_inv @ HMm.T
    bM_new = bM0 - HMm @ (Hbb_inv @ (bM0 * m))

    HM_new = HM_new * k[:, None] * k[None, :]
    bM_new = bM_new * k
    return 0.5 * (HM_new + HM_new.T), bM_new


def marginalize_frame_prior(
    HM: jnp.ndarray, bM0: jnp.ndarray, slot: int, F: int
):
    """Schur-complement one frame's 8 visual coords out of the prior
    (EnergyFunctional::marginalizeFrame, EnergyFunctional.cpp:522-673)."""
    i0 = CPART + 8 * slot
    idx = jnp.arange(HM.shape[0])
    return schur_out(HM, bM0, (idx >= i0) & (idx < i0 + 8))
