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


def accumulate(res: BAResiduals, host: jnp.ndarray, F: int) -> BASystem:
    """Assemble the normal equations from a linearization.

    One big [C, N] @ [N, C] matmul for the frame block (MXU), einsums over
    the point axis for the Schur pieces.
    """
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
    J = full_jacobian(res, host, F)                 # [F, P, K, C]
    r0 = (
        res.r
        - jnp.einsum("fpkc,c->fpk", J, delta)
        - res.J_dd * delta_d[None, :, None]
    )
    wt = res.wt * pmask[None, :, None].astype(res.wt.dtype)

    # Per-point blocks.
    Jw = J * wt[..., None]
    H_ff_p = jnp.einsum("fpkc,fpkd->pcd", Jw, J)           # [P, C, C]
    b_f_p = jnp.einsum("fpkc,fpk->pc", Jw, r0)             # [P, C]
    H_fd_p = jnp.einsum("fpk,fpkc->pc", wt * res.J_dd, J)  # [P, C]
    H_dd_p = jnp.einsum("fpk,fpk->p", wt * res.J_dd, res.J_dd)
    b_d_p = jnp.einsum("fpk,fpk->p", wt * res.J_dd, r0)

    Hdd_inv = jnp.where(pmask & (H_dd_p > 1e-8), 1.0 / (H_dd_p + 1e-10), 0.0)
    HM_add = jnp.einsum("pcd->cd", H_ff_p) - jnp.einsum(
        "pc,pd,p->cd", H_fd_p, H_fd_p, Hdd_inv
    )
    bM_add = jnp.einsum("pc->c", b_f_p) - jnp.einsum(
        "pc,p,p->c", H_fd_p, b_d_p, Hdd_inv
    )
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
