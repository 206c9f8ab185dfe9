"""Tests for image pyramid and interpolation ops."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import interp, pyramid
from dmvio_tpu.utils.camera import Calib, PYR_LEVELS


def synth_image(h=64, w=64, key=0):
    """Smooth synthetic image: sum of sinusoids (analytic gradients)."""
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    img = (
        80.0
        + 40.0 * jnp.sin(0.20 * x)
        + 30.0 * jnp.cos(0.15 * y)
        + 20.0 * jnp.sin(0.09 * (x + y))
    )
    return img


class TestPyramid:
    def test_shapes(self):
        img = synth_image(64, 64)
        pyr = pyramid.build_pyramid(img, levels=4)
        assert len(pyr) == 4
        for l, lvl in enumerate(pyr):
            assert lvl.shape == (3, 64 >> l, 64 >> l)

    def test_level0_is_input(self):
        img = synth_image()
        pyr = pyramid.build_pyramid(img, levels=2)
        np.testing.assert_allclose(np.asarray(pyr[0][0]), np.asarray(img))

    def test_downsample_mean(self):
        img = jnp.arange(16.0).reshape(4, 4)
        pyr = pyramid.build_pyramid(img, levels=2)
        # 2x2 block means
        expected = np.array([[2.5, 4.5], [10.5, 12.5]])
        np.testing.assert_allclose(np.asarray(pyr[1][0]), expected)

    def test_gradient_accuracy(self):
        """Central differences should match analytic gradients of sinusoids."""
        img = synth_image(64, 64)
        pyr = pyramid.build_pyramid(img, levels=1)
        gx = np.asarray(pyr[0][1])
        y, x = np.meshgrid(np.arange(64.0), np.arange(64.0), indexing="ij")
        gx_true = 40.0 * 0.20 * np.cos(0.20 * x) + 20.0 * 0.09 * np.cos(0.09 * (x + y))
        # interior only
        np.testing.assert_allclose(gx[5:-5, 5:-5], gx_true[5:-5, 5:-5], atol=0.25)


class TestInterp:
    def test_integer_coords_exact(self):
        img = synth_image()
        x = jnp.array([3.0, 10.0, 50.0])
        y = jnp.array([7.0, 20.0, 33.0])
        vals = interp.bilinear(img, x, y)
        expected = np.asarray(img)[np.array([7, 20, 33]), np.array([3, 10, 50])]
        np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-6)

    def test_halfway_mean(self):
        img = jnp.array([[0.0, 2.0], [4.0, 6.0]])
        v = interp.bilinear(img, jnp.array([0.5]), jnp.array([0.5]))
        np.testing.assert_allclose(np.asarray(v), [3.0])

    def test_stack_matches_single(self):
        img = synth_image()
        pyr = pyramid.build_pyramid(img, levels=1)[0]
        x = jnp.array([3.3, 10.8, 41.1])
        y = jnp.array([7.9, 20.2, 33.5])
        out = interp.bilinear_stack(pyr, x, y)
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(out[:, c]), np.asarray(interp.bilinear(pyr[c], x, y)),
                rtol=1e-5, atol=1e-5,
            )

    def test_gradient_channel_consistency(self):
        """Interpolated gx should approximate d/dx of interpolated intensity."""
        img = synth_image()
        pyr = pyramid.build_pyramid(img, levels=1)[0]
        x = jnp.array([20.3])
        y = jnp.array([25.7])
        eps = 0.25
        di = (interp.bilinear(pyr[0], x + eps, y) - interp.bilinear(pyr[0], x - eps, y)) / (
            2 * eps
        )
        gx = interp.bilinear(pyr[1], x, y)
        np.testing.assert_allclose(np.asarray(di), np.asarray(gx), atol=0.5)


class TestCalib:
    def test_level_scaling(self):
        c = Calib.create(400.0, 410.0, 256.0, 240.0)
        c1 = c.at_level(1)
        assert abs(float(c1.fx) - 200.0) < 1e-5
        assert abs(float(c1.cx) - ((256.0 + 0.5) * 0.5 - 0.5)) < 1e-5

    def test_project_backproject(self):
        c = Calib.create(400.0, 400.0, 32.0, 32.0)
        from dmvio_tpu.utils import camera
        uv = jnp.array([[10.0, 20.0], [40.0, 50.0]])
        idepth = jnp.array([0.5, 2.0])
        p = camera.backproject(c, uv, idepth)
        uv2 = camera.project(c, p)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=1e-4)
