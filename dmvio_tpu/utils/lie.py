"""Batched Lie-group operations (SO3 / SE3 / Sim3) in JAX.

TPU-native replacement for the capability of Sophus (reference:
thirdparty/Sophus, used via src/dso/util/NumType.h:25-120). All functions are
pure, broadcast over leading batch dimensions, and are differentiable, so
factor Jacobians can come from jax.jacfwd where closed forms are not
hand-written.

Conventions (chosen ONCE, globally — see SURVEY.md §7 on collapsing the
reference's left/right-increment conversions):
  * Rotations are 3x3 matrices, tangent vectors are [wx, wy, wz].
  * SE3 tangent is [v (3), w (3)]  (translation first, like Sophus).
  * Retraction is LEFT-multiplicative: retract(T, d) = exp(d) @ T.
  * Poses are stored as (R, t) pairs or 4x4 matrices; helpers for both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so3 hat operator: [..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta_sq(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(w * w, axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so3 -> SO3 (Rodrigues), small-angle safe.

    [..., 3] -> [..., 3, 3]
    """
    t2 = _theta_sq(w)
    t = jnp.sqrt(jnp.maximum(t2, 0.0))
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    small = t2 < _EPS
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / jnp.where(small, 1.0, t))
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO3 -> so3. [..., 3, 3] -> [..., 3].

    Formulated to be DIFFERENTIABLE at the identity: the naive
    arccos(trace) route has an infinite derivative at t = 0 which poisons
    even the selected Taylor branch of a jnp.where with NaN tangents (the
    IMU-factor jacfwd hits exactly-consistent rotations all the time). Here
    the small-angle factor is a smooth function of cos(t) only, and the
    angle comes from atan2 on guarded inputs.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    anti = vee(R - jnp.swapaxes(R, -1, -2))   # 2 sin(t) * axis
    sin2 = 0.25 * jnp.sum(anti * anti, axis=-1)
    small = sin2 < 1e-12
    sin_safe = jnp.sqrt(jnp.where(small, 1.0, sin2))
    t = jnp.arctan2(sin_safe, cos_t)
    # t / (2 sin t); near zero: 0.5 + t^2/12 ~ 0.5 + (1 - cos t)/6.
    factor = jnp.where(small, 0.5 + (1.0 - cos_t) / 6.0,
                       0.5 * t / sin_safe)
    w = anti * factor[..., None]
    # Near t = pi the antisymmetric part is poorly conditioned; recover the
    # axis exactly from the symmetric part: R + R^T = 2 cos(t) I + 2(1-cos t) aa^T.
    near_pi = cos_t < -0.97
    S = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    denom = jnp.maximum(1.0 - cos_t, _EPS)
    aaT = (S - cos_t[..., None, None] * jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), S.shape)) / denom[..., None, None]
    diag = jnp.stack([aaT[..., 0, 0], aaT[..., 1, 1], aaT[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(aaT, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    pivot = jnp.sqrt(jnp.maximum(jnp.take_along_axis(diag, k[..., None], axis=-1)[..., 0], _EPS))
    axis = col / pivot[..., None]
    # Fix sign using the antisymmetric part (ambiguous only exactly at pi,
    # where +/- w are equivalent).
    s = jnp.sign(jnp.sum(anti * axis, axis=-1))
    s = jnp.where(s == 0, 1.0, s)
    # Angle near pi from the cosine (t of the main branch is wrong when
    # sin^2 ~ 0 there): with u = sqrt(2(1+cos t)),  pi - t = u (1 + u^2/24
    # + O(u^4)).
    u = jnp.sqrt(jnp.maximum(2.0 * (1.0 + cos_t), 0.0))
    t_pi = jnp.pi - u * (1.0 + u * u / 24.0)
    w_pi = axis * (s * t_pi)[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO3: V such that exp_se3 translation = V @ v."""
    t2 = _theta_sq(w)
    t = jnp.sqrt(jnp.maximum(t2, 0.0))
    small = t2 < _EPS
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.where(small, 1.0, t2))
    c = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0,
        (t - jnp.sin(t)) / jnp.where(small, 1.0, t2 * t),
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    t2 = _theta_sq(w)
    t = jnp.sqrt(jnp.maximum(t2, 0.0))
    small = t2 < _EPS
    half_t = 0.5 * t
    # coefficient for W@W:  (1/t^2)(1 - (t sin t)/(2(1-cos t)))
    cot = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half_t * jnp.cos(half_t) / jnp.where(small, 1.0, jnp.sin(half_t)))
        / jnp.where(small, 1.0, t2),
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exponential map se3 -> SE3. xi = [v, w] ([..., 6]) -> (R, t)."""
    v, w = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SE3 -> se3, returns [..., 6] = [v, w]."""
    w = so3_log(R)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_mul(Ra, ta, Rb, tb):
    """(Ra, ta) @ (Rb, tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, p):
    """Apply transform to points p [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_retract(R, t, xi):
    """Left-multiplicative retraction: exp(xi) @ (R, t)."""
    dR, dt = se3_exp(xi)
    return se3_mul(dR, dt, R, t)


def se3_adj(R, t) -> jnp.ndarray:
    """Adjoint of SE3 under [v, w] tangent ordering: [..., 6, 6].

    Adj(T) = [[R, hat(t) R], [0, R]] so that
    exp(Adj(T) xi) T = T exp(xi).
    """
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, hat(t) @ R], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_matrix(R, t) -> jnp.ndarray:
    """(R, t) -> 4x4 homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion [qx, qy, qz, qw] (TUM trajectory order).

    Shepperd's method, branch-free via selecting the numerically best of the
    four candidate formulations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rot_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [qx, qy, qz, qw] -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.maximum(n, _EPS)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Sim3 (needed for scale-aware transforms, reference Sim3GTSAM.h:33-77)
# ---------------------------------------------------------------------------


def sim3_apply(R, t, s, p):
    """Apply a similarity transform s * R @ p + t."""
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    """Compose similarity transforms."""
    return Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta, sa * sb


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return Rt, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), sinv
