"""CoarseTracker end-to-end: jitted coarse-to-fine LM on synthetic pairs."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import coarse_tracker
from dmvio_tpu.ops import interp, pyramid
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib

H_IMG, W_IMG = 256, 256
LEVELS = 5


def synth_image(h=H_IMG, w=W_IMG):
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return (
        90.0
        + 45.0 * jnp.sin(0.17 * x)
        + 35.0 * jnp.cos(0.13 * y)
        + 25.0 * jnp.sin(0.07 * (x + 2 * y))
        + 15.0 * jnp.cos(0.23 * (2 * x - y))
        + 10.0 * jnp.sin(0.31 * x) * jnp.cos(0.29 * y)
    )


def render_plane(ref_img, calib, R, t, a=1.0, b=0.0):
    K = np.asarray(calib.K())
    Hmat = K @ (np.asarray(R) + np.outer(np.asarray(t), [0, 0, 1])) @ np.linalg.inv(K)
    Hinv = np.linalg.inv(Hmat)
    h, w = ref_img.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    p = np.stack([xx, yy, np.ones_like(xx)], -1) @ Hinv.T
    xs = jnp.asarray((p[..., 0] / p[..., 2]).astype(np.float32)).ravel()
    ys = jnp.asarray((p[..., 1] / p[..., 2]).astype(np.float32)).ravel()
    return (a * interp.bilinear(ref_img, xs, ys).reshape(h, w) + b).astype(jnp.float32)


def make_ref(ref_img, calib):
    pyr = pyramid.build_pyramid(ref_img, levels=LEVELS)
    ys, xs = np.meshgrid(
        np.arange(4.0, H_IMG - 4, 2, dtype=np.float32),
        np.arange(4.0, W_IMG - 4, 2, dtype=np.float32),
        indexing="ij",
    )
    u0 = jnp.asarray(xs.ravel())
    v0 = jnp.asarray(ys.ravel())
    return coarse_tracker.make_tracker_ref(
        pyr, calib, u0, v0,
        idepth=jnp.ones_like(u0), mask=jnp.ones(u0.shape, dtype=bool),
    )


class TestCoarseTracker:
    def setup_method(self):
        self.calib = Calib.create(200.0, 200.0, (W_IMG - 1) / 2.0, (H_IMG - 1) / 2.0)
        self.ref_img = synth_image()
        self.ref = make_ref(self.ref_img, self.calib)

    def _track(self, tgt_img, R0=None, t0=None):
        pyr = pyramid.build_pyramid(tgt_img, levels=LEVELS)
        return coarse_tracker.track_jit(
            self.ref, pyr, self.calib,
            jnp.eye(3) if R0 is None else R0,
            jnp.zeros(3) if t0 is None else t0,
            jnp.zeros(()), jnp.zeros(()),
            levels=LEVELS,
        )[0]

    def test_large_motion_with_brightness(self):
        xi_true = jnp.array([0.06, -0.04, 0.03, 0.02, -0.03, 0.025])
        R_true, t_true = lie.se3_exp(xi_true)
        tgt = render_plane(self.ref_img, self.calib, R_true, t_true, a=1.1, b=-4.0)
        res = self._track(tgt)
        assert bool(res.valid)
        err = lie.se3_log(*lie.se3_mul(res.R, res.t, *lie.se3_inv(R_true, t_true)))
        assert float(jnp.abs(err).max()) < 1e-3, np.asarray(err)
        assert abs(float(jnp.exp(res.rho)) - 1.1) < 0.05

    def test_identity_motion(self):
        res = self._track(self.ref_img)
        assert bool(res.valid)
        assert float(jnp.linalg.norm(res.t)) < 1e-4
        assert float(res.level_energy[0]) < 0.1
        assert float(res.flow_rt) < 0.1

    def test_imu_style_init_helps(self):
        """Initializing near truth converges for even bigger motion."""
        xi_true = jnp.array([0.12, -0.08, 0.05, 0.04, -0.05, 0.06])
        R_true, t_true = lie.se3_exp(xi_true)
        tgt = render_plane(self.ref_img, self.calib, R_true, t_true)
        R0, t0 = lie.se3_exp(xi_true + 0.01)
        res = self._track(tgt, R0, t0)
        assert bool(res.valid)
        err = lie.se3_log(*lie.se3_mul(res.R, res.t, *lie.se3_inv(R_true, t_true)))
        assert float(jnp.abs(err).max()) < 1e-3

    def test_flow_indicators_scale_with_motion(self):
        small = render_plane(self.ref_img, self.calib, *lie.se3_exp(jnp.array([0.005, 0, 0, 0, 0, 0.0])))
        large = render_plane(self.ref_img, self.calib, *lie.se3_exp(jnp.array([0.05, 0, 0, 0, 0, 0.0])))
        fs = self._track(small).flow_rt
        fl = self._track(large).flow_rt
        assert float(fl) > 3.0 * float(fs)

    def test_garbage_target_flagged(self):
        """A structureless target must not produce a confidently valid track."""
        tgt = jnp.zeros((H_IMG, W_IMG), jnp.float32)
        res = self._track(tgt)
        # Either invalid, or the residual energy stays enormous.
        assert (not bool(res.valid)) or float(res.level_energy[0]) > 50.0
