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


class MultiPlaneScene(NamedTuple):
    """Several textured planes; each ray sees the nearest one.

    A single infinite plane makes monocular two-view initialization
    GENUINELY ambiguous (the planar homography has a second valid
    (R, t, depth) decomposition — the initializer can photometrically
    converge to the wrong one, measured 50-degree rotation errors on
    rotation-rich starts). Real indoor scenes are not planes; this scene
    restores unambiguous geometry while keeping exact analytic ground
    truth. Fields are stacked per plane [P, ...]; `phase` decorrelates the
    per-plane textures.
    """

    n: jnp.ndarray      # [P, 3] unit normals
    d: jnp.ndarray      # [P]
    X0: jnp.ndarray     # [P, 3]
    e1: jnp.ndarray     # [P, 3]
    e2: jnp.ndarray     # [P, 3]
    phase: jnp.ndarray  # [P] texture phase offsets


def room_scene(depth: float = 2.0) -> MultiPlaneScene:
    """Back wall + floor + side wall around the origin (camera looks +z,
    +y is down): rich, non-planar geometry for init/odometry tests."""
    def unit(v):
        v = jnp.asarray(v, jnp.float32)
        return v / jnp.linalg.norm(v)

    back_n = unit([0.12, -0.08, 1.0])
    back_X0 = jnp.asarray([0.0, 0.0, depth + 0.8], jnp.float32)
    floor_n = unit([0.0, 1.0, 0.05])
    floor_X0 = jnp.asarray([0.0, 0.9, 0.0], jnp.float32)
    side_n = unit([1.0, 0.0, 0.08])
    side_X0 = jnp.asarray([1.1, 0.0, 0.0], jnp.float32)

    def frame(n):
        e1 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        e1 = e1 - (e1 @ n) * n
        nrm = jnp.linalg.norm(e1)
        e1 = jnp.where(nrm > 1e-3, e1 / jnp.maximum(nrm, 1e-9),
                       jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
        e2 = jnp.cross(n, e1)
        return e1, e2

    ns = jnp.stack([back_n, floor_n, side_n])
    X0s = jnp.stack([back_X0, floor_X0, side_X0])
    ds = jnp.einsum("pi,pi->p", ns, X0s)
    e1s, e2s = zip(*(frame(ns[i]) for i in range(3)))
    return MultiPlaneScene(
        n=ns, d=ds, X0=X0s, e1=jnp.stack(e1s), e2=jnp.stack(e2s),
        phase=jnp.asarray([0.0, 2.1, 4.4], jnp.float32))


def transform_scene(scene, R, t):
    """Rigidly transform a (Multi)PlaneScene in world coords: X' = R X + t."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    if isinstance(scene, MultiPlaneScene):
        n = jnp.einsum("ij,pj->pi", R, scene.n)
        X0 = jnp.einsum("ij,pj->pi", R, scene.X0) + t
        return MultiPlaneScene(
            n=n, d=jnp.einsum("pi,pi->p", n, X0), X0=X0,
            e1=jnp.einsum("ij,pj->pi", R, scene.e1),
            e2=jnp.einsum("ij,pj->pi", R, scene.e2), phase=scene.phase)
    n = R @ scene.n
    X0 = R @ scene.X0 + t
    return PlaneScene(n=n, d=n @ X0, X0=X0, e1=R @ scene.e1,
                      e2=R @ scene.e2)


def texture(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High-rank analytic texture in plane coordinates (meters).

    Includes moderately high-frequency components (40-65 rad/m ~ 0.04-0.1
    cycles/pixel at the test operating points): a too-smooth texture lets
    geometrically WRONG (pose, depth) configurations fit photometrically
    (the two-view init energy barely separates the true solution), which
    synthetic-only evaluation then cannot catch. The high-frequency part
    must be BROADBAND — many incommensurate frequencies/orientations at
    small amplitude each — or it acts as a near-monochromatic grating
    whose ~1-period-off epipolar matches alias (measured: new points
    activating at 3-4x wrong depth under fast motion, collapsing the
    map)."""
    hf = (
        4.0 * jnp.sin(47.0 * a + 0.7) * jnp.cos(31.0 * b)
        + 3.5 * jnp.cos(58.6 * b + 41.3 * a - 1.9)
        + 3.5 * jnp.sin(52.7 * a - 36.1 * b + 2.6)
        + 3.0 * jnp.cos(63.4 * a + 17.2 * b + 0.4)
        + 3.0 * jnp.sin(23.9 * a + 55.8 * b + 1.6)
        + 2.5 * jnp.cos(44.1 * a - 60.7 * b + 3.0)
        + 2.5 * jnp.sin(39.2 * (a + 0.6 * b) + 0.9) * jnp.cos(9.7 * b)
    )
    return (
        120.0
        + 40.0 * jnp.sin(7.3 * a) * jnp.cos(5.1 * b)
        + 25.0 * jnp.sin(17.7 * a + 1.1)
        + 22.0 * jnp.cos(13.3 * b + 2.3)
        + 15.0 * jnp.sin(3.1 * (a + b))
        + 10.0 * jnp.cos(29.0 * a - 23.0 * b)
        + hf
    )


def _ray_hits(scene, R_cw, t_cw, calib: Calib, u, v):
    """Per-plane ray depths [..., P] + winning plane index [...]."""
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray_c = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    R_wc, t_wc = lie.se3_inv(R_cw, t_cw)
    ray_w = jnp.einsum("ij,...j->...i", R_wc, ray_c)
    n = scene.n if scene.n.ndim == 2 else scene.n[None]
    d = jnp.atleast_1d(scene.d)
    denom = jnp.einsum("...i,pi->...p", ray_w, n)
    lam = (d - n @ t_wc) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    # Only intersections in FRONT of the camera count; nearest one wins.
    lam_v = jnp.where(lam > 0.05, lam, jnp.inf)
    k = jnp.argmin(lam_v, axis=-1)
    lam_min = jnp.min(lam_v, axis=-1)
    lam_min = jnp.where(jnp.isfinite(lam_min), lam_min, 1e6)
    return lam_min, k, ray_w, t_wc


def ray_depth(scene, R_cw, t_cw, calib: Calib, u, v):
    """Depth (z in cam frame) of the scene along pixel rays. u, v: [...]

    Works for PlaneScene (single) and MultiPlaneScene (nearest plane)."""
    lam, _, _, _ = _ray_hits(scene, R_cw, t_cw, calib, u, v)
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
    lam, k, ray_w, t_wc = _ray_hits(scene, R_cw, t_cw, calib, u, v)
    X = ray_w * lam[..., None] + t_wc
    multi = scene.n.ndim == 2
    X0 = scene.X0 if multi else scene.X0[None]
    e1 = scene.e1 if multi else scene.e1[None]
    e2 = scene.e2 if multi else scene.e2[None]
    phase = (scene.phase if multi
             else jnp.zeros((1,), jnp.float32))
    rel = X - X0[k]
    a = jnp.einsum("...i,...i->...", rel, e1[k]) + phase[k]
    b = jnp.einsum("...i,...i->...", rel, e2[k]) + 0.7 * phase[k]
    return jnp.exp(gain) * texture(a, b) + offset


def gt_idepth(scene: PlaneScene, R_cw, t_cw, calib: Calib, u, v):
    """Exact inverse depth of the plane at pixels (u, v) of a frame."""
    return 1.0 / ray_depth(scene, R_cw, t_cw, calib, u, v)


def generate_vio_sequence(
    n_frames: int = 60,
    frame_dt: float = 0.05,
    imu_hz: float = 200.0,
    h: int = 256, w: int = 320,
    calib: Calib | None = None,
    scene: PlaneScene | None = None,
    s_dso: float = 1.0,
    g2: tuple = (0.05, -0.03),
    accel_scale: float = 0.6,
    rot_scale: float = 0.5,
    imu_noise: bool = True,
    bias=(0.0,) * 6,
    seed: int = 0,
    excite: float = 0.0,
    excite_until: float = 0.0,
    v0=(0.22, -0.06, 0.1),
    R_cb=None,
    t_cb=None,
):
    """Full synthetic VIO sequence: rendered images + IMU + ground truth.

    The body trajectory integrates analytic world accelerations/body rates
    at IMU rate; camera == body; the DSO-world camera poses are the metric
    poses transformed by (scale s_dso, gravity tangent g2) so every layer
    of the stack (visual, transform, inertial) is exercised. Returns a dict
    with images [N,H,W], imu samples, per-frame GT (metric body pose,
    velocity), timestamps, and the calib.
    """
    import numpy as np

    if calib is None:
        calib = Calib.create(0.6 * w, 0.6 * w, w / 2 - 0.5, h / 2 - 0.5)
    if scene is None:
        # Non-planar geometry: a single plane leaves the two-view init
        # scale/rotation ambiguous (see MultiPlaneScene).
        scene = room_scene(depth=2.0)
    rng = np.random.default_rng(seed)
    dt = 1.0 / imu_hz
    spf = max(int(round(frame_dt * imu_hz)), 1)
    n_steps = spf * (n_frames - 1)
    G = 9.8082
    g_vec = np.array([0.0, 0.0, -G])
    bias = np.asarray(bias, np.float64)

    def a_world(t):
        a = accel_scale * np.array([
            np.sin(2.3 * t), 0.8 * np.cos(1.9 * t) + 0.15,
            0.5 * np.sin(1.3 * t + 0.5)])
        if excite and (excite_until <= 0.0 or t < excite_until):
            # Scale-observability excitation: high-frequency, large-
            # amplitude acceleration (displacement ~ excite/omega^2 stays
            # centimetric while the specific-force signal is ~excite).
            # excite_until > 0 limits it to the sequence start — the
            # actual TUM-VI protocol (wiggle for initialization, then
            # walk); 0 keeps it on for the whole sequence. The amplitude
            # ramps down linearly over the final second before
            # excite_until — a step-change in applied acceleration is
            # unphysical and the resulting jerk was measured to break
            # tracking at the transition.
            amp = excite
            if excite_until > 0.0:
                amp = excite * min(1.0, max(0.0, excite_until - t))
            # Metric scale is observed through the ratio of accelerometer
            # signal to visual parallax; the default smooth trajectories
            # leave a near-flat scale chi^2 valley (docs/ACCURACY.md) —
            # this is the knob that closes it, mirroring the wiggle
            # segments TUM-VI-style sequences start with.
            a = a + amp * np.array([
                np.sin(6.7 * t), np.cos(7.3 * t + 0.7),
                0.8 * np.sin(5.9 * t + 0.3)])
        return a

    def w_body(t):
        return rot_scale * np.array([
            0.5 * np.sin(1.6 * t) + 0.15, 0.45 * np.cos(1.2 * t),
            0.35 * np.sin(0.9 * t) - 0.1])

    R = np.eye(3)
    p = np.zeros(3)
    # Initial velocity: monocular init NEEDS baseline — from rest, the
    # first dozen frames have sub-pixel parallax and the two-view
    # (pose, depth) problem is near-degenerate (real benchmark sequences
    # likewise begin mid-motion).
    v = np.asarray(v0, np.float64).copy()
    accs, gyrs, imu_ts = [], [], []
    states = [(R.copy(), p.copy(), v.copy())]
    # Weak harmonic confinement: the open-loop double-integrated
    # accelerations random-walk out of any finite scene on long sequences
    # (measured: the camera passed THROUGH a room wall at frame ~60 of a
    # 240-frame run, min scene depth 5 cm). The spring bounds excursions
    # to ~accel_scale/k^2 while the IMU stays exactly consistent (the
    # recorded specific force is the TOTAL applied acceleration).
    K_SPRING = 0.9
    C_DAMP = 0.5
    for k in range(n_steps):
        t = k * dt
        aw = a_world(t) - K_SPRING ** 2 * p - C_DAMP * v
        wb = w_body(t)
        na = rng.normal(0, 2.0e-3 / np.sqrt(dt), 3) if imu_noise else 0.0
        nw = rng.normal(0, 1.6968e-4 / np.sqrt(dt), 3) if imu_noise else 0.0
        accs.append(R.T @ (aw - g_vec) + bias[3:6] + na)
        gyrs.append(wb + bias[:3] + nw)
        imu_ts.append(t)
        p = p + v * dt + 0.5 * aw * dt ** 2
        v = v + aw * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(wb * dt)))
        states.append((R.copy(), p.copy(), v.copy()))

    R_g = np.asarray(lie.so3_exp(jnp.asarray([g2[0], g2[1], 0.0])))
    if R_cb is not None:
        # The stock scenes are laid out for the identity-rig camera's t=0
        # view; with extrinsics the camera starts elsewhere (body at
        # identity). Move the scene by T_f = T_wc_rot(0) T_wc_id(0)^-1 in
        # the DSO world so the t=0 view is unchanged.
        R_cb64 = np.asarray(R_cb, np.float64)
        t_cb64 = np.asarray(t_cb, np.float64) if t_cb is not None \
            else np.zeros(3)
        R_f = R_g @ R_cb64.T @ R_g.T
        t_f = -s_dso * (R_g @ (R_cb64.T @ t_cb64))
        scene = transform_scene(scene, R_f, t_f)
        t_cb = t_cb64
    images, R_dso, t_dso, v_gt, p_gt, R_b = [], [], [], [], [], []
    for f in range(n_frames):
        Rb, pb, vb = states[f * spf]
        if R_cb is not None:
            # Camera != body rig: DSO camera pose through the full
            # extrinsic chain (exact inverse of the factors' dso_to_body).
            from dmvio_tpu.models.vio_coarse import body_to_dso_np

            R_cw_np, t_cw_np = body_to_dso_np(
                np.asarray(Rb, np.float64), np.asarray(pb, np.float64),
                s_dso, R_g, np.asarray(R_cb, np.float64),
                np.asarray(t_cb, np.float64))
        else:
            R_wc_d = R_g @ Rb
            t_wc_d = s_dso * (R_g @ pb)
            R_cw_np, t_cw_np = R_wc_d.T, -R_wc_d.T @ t_wc_d
        R_cw = jnp.asarray(R_cw_np, jnp.float32)
        t_cw = jnp.asarray(t_cw_np, jnp.float32)
        images.append(render(scene, R_cw, t_cw, calib, h, w))
        R_dso.append(R_cw)
        t_dso.append(t_cw)
        v_gt.append(vb)
        p_gt.append(pb)
        R_b.append(Rb)
    return {
        "images": images,
        "timestamps": np.arange(n_frames) * frame_dt,
        "acc": np.asarray(accs, np.float32),
        "gyr": np.asarray(gyrs, np.float32),
        "imu_ts": np.asarray(imu_ts),
        "calib": calib,
        "scene": scene,
        "R_dso": R_dso, "t_dso": t_dso,
        "p_gt": np.asarray(p_gt), "v_gt": np.asarray(v_gt), "R_body": R_b,
        "steps_per_frame": spf, "imu_dt": dt,
        "s_dso": s_dso, "g2": np.asarray(g2),
    }


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
