"""Alignment-kernel test: recover a known SE3 + affine warp synthetically.

This is the "speed-of-light alignment kernel" correctness gate from
SURVEY.md §7 S1: render a target image from a reference image of a
fronto-parallel plane (depth 1) under a known camera motion (a homography),
then check Gauss-Newton on calc_res_and_gs recovers the motion.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import align, interp, pyramid
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib


H_IMG, W_IMG = 128, 128


def synth_image(h=H_IMG, w=W_IMG):
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return (
        90.0
        + 45.0 * jnp.sin(0.17 * x)
        + 35.0 * jnp.cos(0.13 * y)
        + 25.0 * jnp.sin(0.07 * (x + 2 * y))
        + 15.0 * jnp.cos(0.23 * (2 * x - y))
    )


def render_warped(ref_img, calib, R, t, aff_a=1.0, aff_b=0.0):
    """Render target = plane at depth 1 seen after camera motion (R, t).

    For each target pixel, invert the homography K (R + t e3^T) K^-1 to find
    the ref pixel and bilinearly sample, then apply the inverse brightness
    transform (so that target = a * ref + b at corresponding pixels).
    """
    K = np.asarray(calib.K())
    Hmat = K @ (np.asarray(R) + np.outer(np.asarray(t), [0, 0, 1])) @ np.linalg.inv(K)
    Hinv = np.linalg.inv(Hmat)
    h, w = ref_img.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    ones = np.ones_like(xx)
    pts = np.stack([xx, yy, ones], axis=-1) @ Hinv.T
    xs = (pts[..., 0] / pts[..., 2]).astype(np.float32)
    ys = (pts[..., 1] / pts[..., 2]).astype(np.float32)
    sampled = interp.bilinear(ref_img, jnp.asarray(xs).ravel(), jnp.asarray(ys).ravel())
    return (aff_a * sampled.reshape(h, w) + aff_b).astype(jnp.float32)


def make_pointcloud(ref_img, stride=2):
    h, w = ref_img.shape
    ys, xs = np.meshgrid(
        np.arange(6, h - 6, stride, dtype=np.float32),
        np.arange(6, w - 6, stride, dtype=np.float32),
        indexing="ij",
    )
    u = jnp.asarray(xs.ravel())
    v = jnp.asarray(ys.ravel())
    color = interp.bilinear(ref_img, u, v)
    return align.PointCloud(
        u=u, v=v,
        idepth=jnp.ones_like(u),
        color=color,
        mask=jnp.ones(u.shape, dtype=bool),
    )


def run_gn(tgt_level, calib, pc, R0, t0, iters=30):
    R, t = R0, t0
    rho = jnp.zeros(())
    b_aff = jnp.zeros(())
    for _ in range(iters):
        Hm, bv, stats = align.calc_res_and_gs(
            tgt_level, calib, pc, R, t, jnp.exp(rho), b_aff,
            huber_th=1e9, cutoff_th=1e9,
        )
        step = jnp.linalg.solve(Hm + 1e-4 * jnp.eye(8), -bv)
        R, t = lie.se3_retract(R, t, step[:6])
        rho = rho + step[6]
        b_aff = b_aff + step[7]
    return R, t, rho, b_aff, stats


class TestAlign:
    def setup_method(self):
        self.calib = Calib.create(120.0, 120.0, (W_IMG - 1) / 2.0, (H_IMG - 1) / 2.0)
        self.ref = synth_image()

    def test_zero_motion_zero_residual(self):
        pc = make_pointcloud(self.ref)
        lvl = pyramid.build_pyramid(self.ref, levels=1)[0]
        Hm, bv, stats = align.calc_res_and_gs(
            lvl, self.calib, pc, jnp.eye(3), jnp.zeros(3), 1.0, 0.0
        )
        assert float(stats.energy) < 1e-3
        assert float(jnp.abs(bv).max()) < 1e-2

    def test_recover_translation(self):
        xi_true = jnp.array([0.02, -0.015, 0.01, 0.0, 0.0, 0.0])
        R_true, t_true = lie.se3_exp(xi_true)
        tgt = render_warped(self.ref, self.calib, R_true, t_true)
        lvl = pyramid.build_pyramid(tgt, levels=1)[0]
        pc = make_pointcloud(self.ref)
        R, t, rho, b_aff, stats = run_gn(lvl, self.calib, pc, jnp.eye(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=2e-3)

    def test_recover_rotation_translation(self):
        xi_true = jnp.array([0.01, 0.02, -0.01, 0.008, -0.012, 0.01])
        R_true, t_true = lie.se3_exp(xi_true)
        tgt = render_warped(self.ref, self.calib, R_true, t_true)
        lvl = pyramid.build_pyramid(tgt, levels=1)[0]
        pc = make_pointcloud(self.ref)
        R, t, rho, b_aff, stats = run_gn(lvl, self.calib, pc, jnp.eye(3), jnp.zeros(3))
        err = lie.se3_log(*lie.se3_mul(R, t, *lie.se3_inv(R_true, t_true)))
        assert float(jnp.abs(err).max()) < 3e-3, np.asarray(err)

    def test_recover_affine(self):
        xi_true = jnp.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0])
        R_true, t_true = lie.se3_exp(xi_true)
        tgt = render_warped(self.ref, self.calib, R_true, t_true, aff_a=1.15, aff_b=-6.0)
        lvl = pyramid.build_pyramid(tgt, levels=1)[0]
        pc = make_pointcloud(self.ref)
        R, t, rho, b_aff, stats = run_gn(lvl, self.calib, pc, jnp.eye(3), jnp.zeros(3))
        assert abs(float(jnp.exp(rho)) - 1.15) < 0.02
        assert abs(float(b_aff) - (-6.0)) < 1.0
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=3e-3)

    def test_masked_points_do_not_contribute(self):
        pc = make_pointcloud(self.ref)
        lvl = pyramid.build_pyramid(self.ref, levels=1)[0]
        # Corrupt colors of masked-out points; result must be unchanged.
        n = pc.u.shape[0]
        mask = jnp.arange(n) % 2 == 0
        pc_masked = pc._replace(mask=mask)
        pc_corrupt = pc_masked._replace(
            color=jnp.where(mask, pc.color, 1e6),
        )
        H1, b1, s1 = align.calc_res_and_gs(
            lvl, self.calib, pc_masked, jnp.eye(3), jnp.zeros(3), 1.0, 0.0
        )
        H2, b2, s2 = align.calc_res_and_gs(
            lvl, self.calib, pc_corrupt, jnp.eye(3), jnp.zeros(3), 1.0, 0.0
        )
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2))
        np.testing.assert_allclose(np.asarray(s1.energy), np.asarray(s2.energy))

    def test_saturation_cutoff(self):
        """Residuals above the cutoff are excluded from the linear system."""
        pc = make_pointcloud(self.ref)
        lvl = pyramid.build_pyramid(self.ref, levels=1)[0]
        # Huge brightness offset makes every residual saturate at cutoff 20.
        Hm, bv, stats = align.calc_res_and_gs(
            lvl, self.calib, pc, jnp.eye(3), jnp.zeros(3), 1.0, 500.0,
            huber_th=9.0, cutoff_th=20.0,
        )
        assert float(stats.num_terms) == 0.0
        assert float(stats.num_saturated) > 0
        np.testing.assert_allclose(np.asarray(Hm), 0.0)
