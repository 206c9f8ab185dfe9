"""Tests for pixel selection and immature-point tracing/activation on the
analytic plane scene (exact ground-truth inverse depths)."""

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import immature, interp, pyramid, select
from dmvio_tpu.utils import synthetic
from dmvio_tpu.utils.camera import Calib, PATTERN

H, W = 96, 128
K = 128


def setup_scene(n_frames=4):
    calib = Calib.create(100.0, 100.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)
    R, t = synthetic.orbit_poses(n_frames, radius=0.15, z_step=0.03)
    images = jnp.stack([
        pyramid.build_pyramid(
            synthetic.render(scene, R[f], t[f], calib, H, W), levels=1
        )[0]
        for f in range(n_frames)
    ])
    return calib, scene, R, t, images


def test_select_points_spread_and_gradient():
    calib, scene, R, t, images = setup_scene(1)
    sel = select.select_points_jit(images[0], K, pot=4)
    n = int(jnp.sum(sel.mask))
    assert n > K // 2, n
    gsq = np.asarray(images[0][1] ** 2 + images[0][2] ** 2)
    u = np.asarray(sel.u, int)[np.asarray(sel.mask)]
    v = np.asarray(sel.v, int)[np.asarray(sel.mask)]
    # Selected pixels have above-average gradient.
    assert gsq[v, u].mean() > 2.0 * gsq.mean()
    # Spread: NMS guarantees at most one winner per 4x4 (pot) cell.
    cells = set(zip(u // 4, v // 4))
    assert len(cells) == n


def make_pool(calib, scene, R, t, images, n=K):
    sel = select.select_points_jit(images[0], n, pot=4)
    pool = immature.empty_pool(n)
    pat = jnp.asarray(PATTERN)
    color = jax.vmap(
        lambda uu, vv: interp.bilinear(images[0][0], uu + pat[:, 0], vv + pat[:, 1])
    )(sel.u, sel.v)
    pool = pool._replace(
        u=sel.u, v=sel.v, color=color, mask=sel.mask,
        host=jnp.zeros(n, jnp.int32),
    )
    id_gt = synthetic.gt_idepth(scene, R[0], t[0], calib, sel.u, sel.v)
    return pool, id_gt


def test_trace_converges_to_gt_idepth():
    calib, scene, R, t, images = setup_scene(4)
    pool, id_gt = make_pool(calib, scene, R, t, images)

    F = 4
    aff = jnp.zeros((2,))
    for f in range(1, F):
        Rh = jnp.broadcast_to(R[0], (K, 3, 3))
        th = jnp.broadcast_to(t[0], (K, 3))
        affh = jnp.zeros((K, 2))
        pool = immature.trace(pool, Rh, th, affh, R[f], t[f], aff, images[f], calib)

    good = np.asarray(pool.status) == immature.IPS_GOOD
    assert good.sum() > K * 0.5, good.sum()
    dmin = np.asarray(pool.idepth_min)[good]
    dmax = np.asarray(pool.idepth_max)[good]
    gt = np.asarray(id_gt)[good]
    mid = 0.5 * (dmin + dmax)
    rel_err = np.abs(mid - gt) / gt
    assert np.median(rel_err) < 0.05, np.median(rel_err)
    # Intervals tightened dramatically from [0, inf).
    assert np.median(dmax - dmin) < 0.5


def test_activation_refines_idepth():
    calib, scene, R, t, images = setup_scene(4)
    pool, id_gt = make_pool(calib, scene, R, t, images)
    aff = jnp.zeros((2,))
    for f in range(1, 4):
        Rh = jnp.broadcast_to(R[0], (K, 3, 3))
        th = jnp.broadcast_to(t[0], (K, 3))
        pool = immature.trace(pool, Rh, th, jnp.zeros((K, 2)), R[f], t[f],
                              aff, images[f], calib)

    cand = jnp.asarray(np.asarray(pool.status) == immature.IPS_GOOD)
    frames_mask = jnp.ones(4, bool)
    d, ok, energy = immature.activate(
        pool, cand, R, t, jnp.zeros((4, 2)), frames_mask, images, calib
    )
    ok_np = np.asarray(ok)
    assert ok_np.sum() > K * 0.4, ok_np.sum()
    rel = np.abs(np.asarray(d) - np.asarray(id_gt)) / np.asarray(id_gt)
    assert np.median(rel[ok_np]) < 0.01, np.median(rel[ok_np])
