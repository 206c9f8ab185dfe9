"""Numeric-vs-analytic Jacobian checks for the BA linearization.

Mirrors the reference's debug-time verification style (assertNumericJac,
src/GTSAMIntegration/PoseTransformation.h:230-238) as real unit tests: an
independent pure residual function is differentiated with jax.jacfwd and
compared against ops/residuals.py's hand-derived Jacobians.

A LINEAR intensity image is used so that bilinear interpolation is exact and
the gradient channels equal the true image derivative — then the analytic
and autodiff Jacobians must agree to float tolerance (for the central
pattern pixel, which is where the reference evaluates geometric Jacobians).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmvio_tpu.ops import pyramid, residuals
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib, PATTERN


H, W = 64, 96
GA, GB, GC = 0.7, -0.4, 120.0  # linear image I = GA*x + GB*y + GC


def linear_image():
    y, x = jnp.mgrid[0:H, 0:W]
    return GA * x + GB * y + GC


def make_scene(seed=0, F=3, P=16):
    rng = np.random.default_rng(seed)
    calib = Calib.create(80.0, 82.0, W / 2, H / 2)
    img = linear_image()
    pyr0 = pyramid.build_pyramid(img, levels=1)[0]
    images = jnp.stack([pyr0] * F)

    R_list, t_list = [], []
    for f in range(F):
        xi = jnp.asarray(
            np.concatenate([rng.normal(0, 0.05, 3), rng.normal(0, 0.02, 3)]),
            jnp.float32,
        )
        R, t = lie.se3_exp(xi)
        R_list.append(R)
        t_list.append(t)
    R_cw = jnp.stack(R_list)
    t_cw = jnp.stack(t_list)
    aff = jnp.asarray(rng.normal(0, 0.05, (F, 2)), jnp.float32)

    frames = BAFrames(
        R_cw=R_cw, t_cw=t_cw, aff=aff,
        R0_cw=R_cw, t0_cw=t_cw, aff0=aff,
        mask=jnp.ones((F,), bool),
    )
    host = jnp.asarray(rng.integers(0, F, P), jnp.int32)
    u = jnp.asarray(rng.uniform(12, W - 12, P), jnp.float32)
    v = jnp.asarray(rng.uniform(12, H - 12, P), jnp.float32)
    idepth = jnp.asarray(rng.uniform(0.3, 1.5, P), jnp.float32)
    pat = jnp.asarray(PATTERN)
    color = jax.vmap(
        lambda uu, vv: GA * (uu + pat[:, 0]) + GB * (vv + pat[:, 1]) + GC
    )(u, v)
    points = BAPoints(
        host=host, u=u, v=v, idepth=idepth, idepth_zero=idepth,
        color=color, weight=jnp.ones((P, 8), jnp.float32),
        mask=jnp.ones((P,), bool),
    )
    pair_mask = host[None, :] != jnp.arange(F)[:, None]
    return calib, images, frames, points, pair_mask


def reference_residual(calib_vec, xi_t, xi_h, aff_t, aff_h, d_idepth,
                       frames, points, p, f):
    """Independent residual at the CENTRAL pattern pixel, as a pure function
    of increments around the current state (for jacfwd)."""
    calib = Calib.from_vec(calib_vec)
    R_t, t_t = lie.se3_retract(frames.R_cw[f], frames.t_cw[f], xi_t)
    R_h, t_h = lie.se3_retract(
        frames.R_cw[points.host[p]], frames.t_cw[points.host[p]], xi_h
    )
    a_t = frames.aff[f] + aff_t
    a_h = frames.aff[points.host[p]] + aff_h
    idep = points.idepth[p] + d_idepth

    Rhi, thi = lie.se3_inv(R_h, t_h)
    R_th, t_th = lie.se3_mul(R_t, t_t, Rhi, thi)
    xr = (points.u[p] - calib.cx) / calib.fx
    yr = (points.v[p] - calib.cy) / calib.fy
    pt = R_th @ jnp.stack([xr, yr, 1.0]) + t_th * idep
    un = pt[0] / pt[2] * calib.fx + calib.cx
    vn = pt[1] / pt[2] * calib.fy + calib.cy
    i_t = GA * un + GB * vn + GC  # exact linear image
    pred = jnp.exp(a_t[0] - a_h[0]) * (points.color[p, 4] - a_h[1]) + a_t[1]
    return i_t - pred


@pytest.fixture(scope="module")
def scene():
    return make_scene()


@pytest.fixture(scope="module")
def lin(scene):
    calib, images, frames, points, pair_mask = scene
    return residuals.linearize(frames, points, calib, images, pair_mask)


def test_residual_values(scene, lin):
    """Raw residual matches the independent evaluation (central pixel)."""
    calib, images, frames, points, pair_mask = scene
    z6 = jnp.zeros(6)
    z2 = jnp.zeros(2)
    for (p, f) in [(0, 1), (3, 2), (7, 0)]:
        if not bool(pair_mask[f, p]):
            continue
        r_ref = reference_residual(
            calib.as_vec(), z6, z6, z2, z2, 0.0, frames, points, p, f
        )
        np.testing.assert_allclose(lin.r[f, p, 4], r_ref, rtol=1e-4, atol=1e-3)


def test_jacobians_match_autodiff(scene, lin):
    calib, images, frames, points, pair_mask = scene
    z6 = jnp.zeros(6)
    z2 = jnp.zeros(2)

    checked = 0
    for (p, f) in [(0, 1), (3, 2), (7, 0), (11, 1)]:
        if not bool(pair_mask[f, p]) or not bool(lin.active[f, p, 4]):
            continue
        checked += 1
        args = (calib.as_vec(), z6, z6, z2, z2, 0.0)
        jac = jax.jacfwd(reference_residual, argnums=(0, 1, 2, 3, 4, 5))(
            *args, frames, points, p, f
        )
        J_cal, J_xt, J_xh, J_at, J_ah, J_dd = jac
        np.testing.assert_allclose(lin.J_pose_t[f, p, 4], J_xt, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(lin.J_pose_h[f, p, 4], J_xh, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(lin.J_aff_t[f, p, 4], J_at, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(lin.J_aff_h[f, p, 4], J_ah, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(lin.J_calib[f, p, 4], J_cal, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(lin.J_dd[f, p, 4], J_dd, rtol=2e-3, atol=2e-3)
    assert checked >= 3


def test_masked_pairs_are_inert(scene, lin):
    calib, images, frames, points, pair_mask = scene
    inactive = ~pair_mask
    assert bool(jnp.all(lin.wt[inactive] == 0.0))
    assert bool(jnp.all(lin.energy[inactive] == 0.0))


def test_self_residual_zero_for_consistent_scene(scene):
    """With identical poses and images, residuals vanish (perfect model)."""
    calib, images, frames, points, pair_mask = scene
    F = images.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    zero_t = jnp.zeros((F, 3))
    zero_aff = jnp.zeros((F, 2))
    frames_id = BAFrames(
        R_cw=eye, t_cw=zero_t, aff=zero_aff,
        R0_cw=eye, t0_cw=zero_t, aff0=zero_aff,
        mask=jnp.ones((F,), bool),
    )
    lin = residuals.linearize(frames_id, points, calib, images, pair_mask)
    act = lin.active
    np.testing.assert_allclose(
        np.where(np.asarray(act), np.asarray(lin.r), 0.0), 0.0, atol=1e-3
    )


def test_patch_sample_matches_bilinear():
    """gather_patches + sample3 == bilinear sampling of (I, gx, gy) images.

    The alternative BA sampling path (ops/patch_sample.py): one 16x16 patch
    per point, with intensity/gradient samples reconstructed by in-patch
    one-hot contractions. gx/gy must match bilinear interpolation of the
    reference's central-difference gradient images
    (FrameHessian::makeImages, src/dso/FullSystem/HessianBlocks.cpp:128).
    """
    from dmvio_tpu.ops import interp, patch_sample

    rng = np.random.default_rng(3)
    H = W = 64
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))

    P, K = 37, 8
    uc = jnp.asarray(rng.uniform(10, W - 10, P).astype(np.float32))
    vc = jnp.asarray(rng.uniform(10, H - 10, P).astype(np.float32))
    # Pattern samples within +-3 px of the centre (in-patch by design).
    u = uc[:, None] + jnp.asarray(rng.uniform(-3, 3, (P, K)), jnp.float32)
    v = vc[:, None] + jnp.asarray(rng.uniform(-3, 3, (P, K)), jnp.float32)

    patches, x0, y0 = patch_sample.gather_patches(img, uc, vc)
    i_s, gx_s, gy_s, ok = patch_sample.sample3(patches, x0, y0, u, v)
    assert bool(jnp.all(ok))

    np.testing.assert_allclose(
        np.asarray(i_s), np.asarray(interp.bilinear(img, u, v)),
        rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(interp.bilinear(gx, u, v)),
        rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gy_s), np.asarray(interp.bilinear(gy, u, v)),
        rtol=1e-5, atol=1e-3)


def test_patch_sample_flags_out_of_patch():
    """Samples outside the 16x16 patch stencil are masked, not garbage."""
    from dmvio_tpu.ops import patch_sample

    img = jnp.zeros((64, 64), jnp.float32)
    uc = jnp.asarray([32.0])
    vc = jnp.asarray([32.0])
    patches, x0, y0 = patch_sample.gather_patches(img, uc, vc)
    u = jnp.asarray([[32.0, 32.0 + 40.0]])
    v = jnp.asarray([[32.0, 32.0]])
    _, _, _, ok = patch_sample.sample3(patches, x0, y0, u, v)
    assert bool(ok[0, 0]) and not bool(ok[0, 1])
