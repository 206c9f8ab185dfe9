"""Unit tests for the Lie-group substrate (dmvio_tpu.utils.lie)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvio_tpu.utils import lie


def rand_w(key, n, scale=1.0):
    """Random rotation vectors with norm < pi (log returns principal values)."""
    w = jax.random.normal(key, (n, 3)) * scale
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.where(norm > 3.0, w * (3.0 / norm), w)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(0), 64, scale=1.2)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)

    def test_exp_small_angle(self):
        w = rand_w(jax.random.PRNGKey(1), 16, scale=1e-6)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(
            np.asarray(R), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-6)

    def test_orthonormal(self):
        w = rand_w(jax.random.PRNGKey(2), 32, scale=2.0)
        R = lie.so3_exp(w)
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(
            np.asarray(RtR), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_log_near_pi(self):
        axis = np.array([1.0, 0.0, 0.0])
        w = jnp.asarray(axis * (np.pi - 1e-4), dtype=jnp.float32)[None]
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(3), (64, 6))
        xi = xi.at[:, 3:].set(rand_w(jax.random.PRNGKey(30), 64, 0.9))
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_mul_inv(self):
        xi = jax.random.normal(jax.random.PRNGKey(4), (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Re, te = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(
            np.asarray(Re), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)

    def test_adjoint_identity(self):
        """exp(Adj(T) xi) T == T exp(xi)."""
        key = jax.random.PRNGKey(5)
        xiT = jax.random.normal(key, (6,))
        xi = jax.random.normal(jax.random.PRNGKey(6), (6,)) * 0.3
        R, t = lie.se3_exp(xiT)
        Adj = lie.se3_adj(R, t)
        lhsR, lhst = lie.se3_mul(*lie.se3_exp(Adj @ xi), R, t)
        eR, et = lie.se3_exp(xi)
        rhsR, rhst = lie.se3_mul(R, t, eR, et)
        np.testing.assert_allclose(np.asarray(lhsR), np.asarray(rhsR), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lhst), np.asarray(rhst), atol=1e-5)

    def test_retract_matches_exp_mul(self):
        xi0 = jax.random.normal(jax.random.PRNGKey(7), (6,))
        d = jax.random.normal(jax.random.PRNGKey(8), (6,)) * 0.1
        R, t = lie.se3_exp(xi0)
        R2, t2 = lie.se3_retract(R, t, d)
        dR, dt = lie.se3_exp(d)
        R3, t3 = lie.se3_mul(dR, dt, R, t)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t3), atol=1e-6)

    def test_apply_matches_matrix(self):
        xi = jax.random.normal(jax.random.PRNGKey(9), (6,))
        R, t = lie.se3_exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(10), (5, 3))
        out = lie.se3_apply(R, t, p)
        T = lie.se3_matrix(R, t)
        ph = jnp.concatenate([p, jnp.ones((5, 1))], axis=-1)
        out2 = (T @ ph.T).T[:, :3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


class TestQuat:
    def test_quat_roundtrip(self):
        w = rand_w(jax.random.PRNGKey(11), 64, scale=2.0)
        R = lie.so3_exp(w)
        q = lie.quat_from_rot(R)
        R2 = lie.rot_from_quat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_quat_identity(self):
        q = lie.quat_from_rot(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-6)


class TestSim3:
    def test_mul_inv(self):
        xi = jax.random.normal(jax.random.PRNGKey(12), (4, 6))
        R, t = lie.se3_exp(xi)
        s = jnp.exp(jax.random.normal(jax.random.PRNGKey(13), (4,)))
        Ri, ti, si = lie.sim3_inv(R, t, s)
        Re, te, se = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(
            np.asarray(Re), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(se), 1.0, atol=1e-5)

    def test_apply(self):
        p = jnp.array([[1.0, 2.0, 3.0]])
        s = jnp.array([2.0])
        out = lie.sim3_apply(jnp.eye(3)[None], jnp.zeros((1, 3)), s, p)
        np.testing.assert_allclose(np.asarray(out), [[2.0, 4.0, 6.0]], atol=1e-6)
