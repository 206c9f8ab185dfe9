"""Analytic synthetic scene: a textured plane, renderable from any pose.

Test/benchmark infrastructure (the reference has none in-repo — its
correctness relies on external dataset evaluation, SURVEY.md §4). A plane
with a smooth analytic texture gives: exact images from any viewpoint, exact
ground-truth inverse depths, and exact photometric consistency — everything
an end-to-end BA/tracking/VIO test needs, with no files.

World convention: poses are world-to-cam (R_cw, t_cw) as in the BA stack;
cam-to-world is the inverse. The plane is { X : n . X = d } in world coords
with an orthonormal in-plane basis (e1, e2) anchored at X0 for texturing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.utils import lie
from dmvio_tpu.utils.camera import Calib


class PlaneScene(NamedTuple):
    n: jnp.ndarray    # [3] unit plane normal (world)
    d: jnp.ndarray    # scalar: n . X = d on the plane
    X0: jnp.ndarray   # [3] texture anchor on the plane
    e1: jnp.ndarray   # [3] in-plane texture axis
    e2: jnp.ndarray   # [3]


def default_scene(depth: float = 2.0) -> PlaneScene:
    """Fronto-parallel-ish plane at z = depth (world = first cam frame)."""
    n = jnp.array([0.15, -0.1, 1.0])
    n = n / jnp.linalg.norm(n)
    X0 = jnp.array([0.0, 0.0, depth])
    d = n @ X0
    e1 = jnp.array([1.0, 0.0, 0.0])
    e1 = e1 - (e1 @ n) * n
    e1 = e1 / jnp.linalg.norm(e1)
    e2 = jnp.cross(n, e1)
    return PlaneScene(n=n, d=d, X0=X0, e1=e1, e2=e2)


def texture(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Smooth, high-rank analytic texture in plane coordinates (meters)."""
    return (
        120.0
        + 40.0 * jnp.sin(7.3 * a) * jnp.cos(5.1 * b)
        + 25.0 * jnp.sin(17.7 * a + 1.1)
        + 22.0 * jnp.cos(13.3 * b + 2.3)
        + 15.0 * jnp.sin(3.1 * (a + b))
        + 10.0 * jnp.cos(29.0 * a - 23.0 * b)
    )


def ray_depth(scene: PlaneScene, R_cw, t_cw, calib: Calib, u, v):
    """Depth (z in cam frame) of the plane along pixel rays. u, v: [...]"""
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray_c = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    R_wc, t_wc = lie.se3_inv(R_cw, t_cw)
    ray_w = jnp.einsum("ij,...j->...i", R_wc, ray_c)
    denom = jnp.einsum("...i,i->...", ray_w, scene.n)
    lam = (scene.d - scene.n @ t_wc) / denom
    return lam  # depth along the ray; idepth = 1 / lam


def render(scene: PlaneScene, R_cw, t_cw, calib: Calib, h: int, w: int,
           gain: float = 0.0, offset: float = 0.0) -> jnp.ndarray:
    """Render [h, w] image of the plane from a pose; exact, no sampling.

    gain/offset implement the per-frame brightness model
    I = exp(gain) * irradiance + offset (see ops/residuals.py docstring).
    """
    v, u = jnp.mgrid[0:h, 0:w]
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    lam = ray_depth(scene, R_cw, t_cw, calib, u, v)
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray_c = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    R_wc, t_wc = lie.se3_inv(R_cw, t_cw)
    X = jnp.einsum("ij,...j->...i", R_wc, ray_c * lam[..., None]) + t_wc
    rel = X - scene.X0
    a = jnp.einsum("...i,i->...", rel, scene.e1)
    b = jnp.einsum("...i,i->...", rel, scene.e2)
    return jnp.exp(gain) * texture(a, b) + offset


def gt_idepth(scene: PlaneScene, R_cw, t_cw, calib: Calib, u, v):
    """Exact inverse depth of the plane at pixels (u, v) of a frame."""
    return 1.0 / ray_depth(scene, R_cw, t_cw, calib, u, v)


def orbit_poses(num: int, radius: float = 0.08, z_step: float = 0.02,
                yaw_step: float = 0.015):
    """A gentle camera trajectory: lateral arc with small rotations.

    Returns (R_cw [N,3,3], t_cw [N,3]); frame 0 is the identity (world).
    """
    Rs, ts = [], []
    for i in range(num):
        ang = i * 2.0 * jnp.pi / max(num * 4, 1)
        # camera center in world coords
        center = jnp.array(
            [radius * jnp.sin(ang) * i / max(num - 1, 1),
             0.5 * radius * (1 - jnp.cos(ang)),
             -z_step * i]
        )
        w = jnp.array([0.3 * yaw_step * i, yaw_step * i, 0.1 * yaw_step * i])
        R_wc = lie.so3_exp(w)
        # world-to-cam: R_cw = R_wc^T, t_cw = -R_cw @ center
        R_cw = R_wc.T
        t_cw = -R_cw @ center
        Rs.append(R_cw)
        ts.append(t_cw)
    return jnp.stack(Rs), jnp.stack(ts)
