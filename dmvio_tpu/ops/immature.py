"""Immature-point depth tracing and activation, fully batched.

TPU-native re-design of ImmaturePoint::traceOn
(src/dso/FullSystem/ImmaturePoint.cpp:77: discrete epipolar search :227 +
GN subpixel refinement :316) and FullSystem::optimizeImmaturePoint
(src/dso/FullSystem/FullSystemOptPoint.cpp:51: idepth-only GN against all
window frames). The reference traces one point at a time against one frame;
we trace the whole immature pool against the new frame in one program:
every point takes S fixed epipolar samples (masked beyond its search
length), the argmin is refined by a few directional GN steps, and the
inverse-depth interval is re-derived from the matched pixel.

Status codes follow ImmaturePointStatus (ImmaturePoint.h:46-52).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import interp, patch_sample
from dmvio_tpu.utils.camera import Calib, PATTERN

# Status enum (mirrors IPS_* in ImmaturePoint.h:46-52).
IPS_UNINITIALIZED = 0
IPS_GOOD = 1
IPS_OOB = 2
IPS_OUTLIER = 3
IPS_SKIPPED = 4
IPS_BADCONDITION = 5

N_SAMPLES = 32          # discrete epipolar samples (ref: <=100 steps w/ dynamic len)
# Relative search cap (* (w + h)). The reference uses 0.027 at VGA (~30 px);
# since our samples are a fixed batch (no per-step cost), a longer cap costs
# nothing and avoids losing near points whose disparity exceeds the clip.
MAX_PIX_SEARCH = 0.08
TRACE_GN_ITERS = 3      # reference setting_trace_GNIterations
OUTLIER_ENERGY = 12.0 * 12.0 * 8  # pattern SSD outlier threshold (ref energyTH scale)
MIN_TRACE_QUALITY = 3.0  # reference setting_minTraceQuality
IDEPTH_MAX_INIT = 1e8   # stand-in for the reference's NAN "unbounded max"


class ImmaturePoints(NamedTuple):
    """SoA immature-point pool, fixed capacity I."""

    host: jnp.ndarray        # [I] int32 host frame slot
    u: jnp.ndarray           # [I]
    v: jnp.ndarray           # [I]
    idepth_min: jnp.ndarray  # [I]
    idepth_max: jnp.ndarray  # [I]
    color: jnp.ndarray       # [I, 8]
    weight: jnp.ndarray      # [I, 8]
    quality: jnp.ndarray     # [I] 2nd-best/best error ratio (higher = better)
    status: jnp.ndarray      # [I] int32 IPS_*
    mask: jnp.ndarray        # [I] bool slot in use


def empty_pool(capacity: int) -> ImmaturePoints:
    z = jnp.zeros((capacity,), jnp.float32)
    return ImmaturePoints(
        host=jnp.zeros((capacity,), jnp.int32),
        u=z, v=z, idepth_min=z,
        idepth_max=jnp.full((capacity,), IDEPTH_MAX_INIT, jnp.float32),
        color=jnp.zeros((capacity, 8), jnp.float32),
        weight=jnp.ones((capacity, 8), jnp.float32),
        quality=jnp.full((capacity,), 1e4, jnp.float32),
        status=jnp.zeros((capacity,), jnp.int32),
        mask=jnp.zeros((capacity,), bool),
    )


def _idepth_from_pixel(pr, t, x, y, use_x):
    """Host inverse depth that projects onto normalized coords (x, y).

    From pt = pr + t * d and x = pt_x / pt_z:
        d = (pr_x - x pr_z) / (x t_z - t_x)
    using the image axis with the larger epipolar motion (reference
    ImmaturePoint.cpp:356-371).
    """
    dx = (pr[..., 0] - x * pr[..., 2]) / (x * t[..., 2] - t[..., 0])
    dy = (pr[..., 1] - y * pr[..., 2]) / (y * t[..., 2] - t[..., 1])
    return jnp.where(use_x, dx, dy)


def trace(
    pool: ImmaturePoints,
    R_h: jnp.ndarray,      # [I, 3, 3] host world-to-cam (gathered by caller)
    t_h: jnp.ndarray,      # [I, 3]
    aff_h: jnp.ndarray,    # [I, 2]
    R_n: jnp.ndarray,      # [3, 3] new frame world-to-cam
    t_n: jnp.ndarray,      # [3]
    aff_n: jnp.ndarray,    # [2]
    image_n: jnp.ndarray,  # [3, H, W] new frame level-0 (I, gx, gy)
    calib: Calib,
) -> ImmaturePoints:
    """Trace every pooled point against a new frame; returns updated pool."""
    h, w = image_n.shape[-2:]
    max_search = MAX_PIX_SEARCH * (w + h)

    # Relative pose host -> new.
    R_nh = jnp.einsum("ij,pkj->pik", R_n, R_h)
    t_nh = t_n[None] - jnp.einsum("pij,pj->pi", R_nh, t_h)

    xr = (pool.u - calib.cx) / calib.fx
    yr = (pool.v - calib.cy) / calib.fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    pr = jnp.einsum("pij,pj->pi", R_nh, ray)   # rotated ray (no depth term)

    def project_d(d):
        pt = pr + t_nh * d[:, None]
        pz = jnp.where(jnp.abs(pt[..., 2]) > 1e-6, pt[..., 2], 1e-6)
        x = pt[..., 0] / pz
        y = pt[..., 1] / pz
        return (x * calib.fx + calib.cx, y * calib.fy + calib.cy,
                pt[..., 2] > 1e-6)

    u_min, v_min, ok_min = project_d(pool.idepth_min)
    u_max, v_max, ok_max = project_d(
        jnp.minimum(pool.idepth_max, IDEPTH_MAX_INIT)
    )

    dirx = u_max - u_min
    diry = v_max - v_min
    dist = jnp.sqrt(dirx * dirx + diry * diry)
    tiny = dist < 1.5          # interval already tight -> skip
    dist_safe = jnp.maximum(dist, 1e-6)
    scale = jnp.minimum(1.0, max_search / dist_safe)
    dirx_c = dirx * scale
    diry_c = diry * scale
    dist_c = dist_safe * jnp.minimum(scale, 1.0)

    # Rotate the sampling pattern by the in-plane rotation (reference
    # rotatetPattern, ImmaturePoint.cpp:191-198).
    pat = jnp.asarray(PATTERN)                        # [K, 2]
    R2 = R_nh[:, :2, :2]                              # [I, 2, 2]
    pat_rot = jnp.einsum("pij,kj->pki", R2, pat)      # [I, K, 2]

    rel_a = jnp.exp(aff_n[0] - aff_h[:, 0])           # [I]
    pred = rel_a[:, None] * (pool.color - aff_h[:, 1:2]) + aff_n[1]  # [I, K]

    # Discrete search: S samples from (u_min, v_min) along the clipped dir
    # with the full rotated pattern (the reference's scalar per-step loop,
    # ImmaturePoint.cpp:227-310). S=32 keeps the gather — the frontend's
    # single most expensive op on TPU — at half the naive budget; the GN
    # refinement below recovers the coarser step quantization (its step
    # clamp scales with dist_c / (S-1)).
    alphas = jnp.linspace(0.0, 1.0, N_SAMPLES)        # [S]
    su = u_min[:, None] + alphas[None, :] * dirx_c[:, None]   # [I, S]
    sv = v_min[:, None] + alphas[None, :] * diry_c[:, None]
    pu = su[:, :, None] + pat_rot[:, None, :, 0]      # [I, S, K]
    pv = sv[:, :, None] + pat_rot[:, None, :, 1]
    inb = interp.in_bounds(pu, pv, h, w, pad=3.0)
    # MXU-matmul sampling: the search scan is the frontend's biggest
    # gather; as a structured matmul it rides the systolic array instead.
    # Single-pass bf16 (DEFAULT): ~0.4 intensity-unit noise on a 0-255
    # image, well under the SSD separation between match candidates — this
    # pass only SELECTS the discrete best sample (3x fewer MXU passes than
    # HIGH, the kernel is the trace program's entire cost); the GN
    # refinement below re-samples exactly.
    i_s = interp.bilinear_mxu(image_n[0], pu, pv,
                              precision=jax.lax.Precision.DEFAULT)
    err = jnp.where(inb, (i_s - pred[:, None, :]) ** 2, 1e8)
    sample_e = jnp.sum(err, axis=-1)                  # [I, S]
    sample_ok = jnp.all(inb, axis=-1)
    sample_e = jnp.where(sample_ok, sample_e, jnp.inf)

    best = jnp.argmin(sample_e, axis=-1)              # [I]
    best_e = jnp.min(sample_e, axis=-1)
    best_ok = sample_ok[jnp.arange(best.shape[0]), best]
    # Second best at least 2 PIXELS away (setting_minTraceTestRadius).
    step_px = dist_c / (N_SAMPLES - 1)
    sidx = jnp.arange(N_SAMPLES)[None, :]
    far = jnp.abs(sidx - best[:, None]) * step_px[:, None] >= 2.0
    second_e = jnp.min(jnp.where(far, sample_e, jnp.inf), axis=-1)
    quality = second_e / jnp.maximum(best_e, 1e-6)

    bu = jnp.take_along_axis(su, best[:, None], axis=1)[:, 0]
    bv = jnp.take_along_axis(sv, best[:, None], axis=1)[:, 0]

    # GN subpixel refinement along the epipolar direction.
    step_len = dist_c / (N_SAMPLES - 1)
    ndx = dirx_c / jnp.maximum(dist_c, 1e-6)
    ndy = diry_c / jnp.maximum(dist_c, 1e-6)

    def gn_body(_, uv):
        cu, cv = uv
        pu = cu[:, None] + pat_rot[:, :, 0]
        pv = cv[:, None] + pat_rot[:, :, 1]
        samp = interp.bilinear_stack(image_n, pu, pv)  # [I, K, 3]
        r = samp[..., 0] - pred
        gdir = samp[..., 1] * ndx[:, None] + samp[..., 2] * ndy[:, None]
        H = jnp.sum(gdir * gdir, axis=-1) + 1e-6
        b = jnp.sum(gdir * r, axis=-1)
        step = jnp.clip(-b / H, -step_len, step_len)
        return cu + step * ndx, cv + step * ndy

    bu, bv = jax.lax.fori_loop(0, TRACE_GN_ITERS, gn_body, (bu, bv))

    # Final energy at the refined position.
    pu = bu[:, None] + pat_rot[:, :, 0]
    pv = bv[:, None] + pat_rot[:, :, 1]
    inb_f = interp.in_bounds(pu, pv, h, w, pad=3.0)
    i_f = interp.bilinear(image_n[0], pu, pv)
    final_e = jnp.sum(jnp.where(inb_f, (i_f - pred) ** 2, 1e8), axis=-1)

    # Inverse-depth interval from matched pixel +- 1 px along the line.
    use_x = jnp.abs(dirx_c) > jnp.abs(diry_c)
    err_px = 1.0

    def idepth_at(uu, vv):
        x = (uu - calib.cx) / calib.fx
        y = (vv - calib.cy) / calib.fy
        return _idepth_from_pixel(pr, t_nh, x, y, use_x)

    d_a = idepth_at(bu - err_px * ndx, bv - err_px * ndy)
    d_b = idepth_at(bu + err_px * ndx, bv + err_px * ndy)
    new_min = jnp.minimum(d_a, d_b)
    new_max = jnp.maximum(d_a, d_b)

    searched = pool.mask & ~tiny & ok_min & jnp.all(
        jnp.isfinite(jnp.stack([bu, bv])), axis=0
    )
    good = searched & (final_e < OUTLIER_ENERGY) & (new_max > 0) & best_ok
    bad = searched & ~good

    new_min = jnp.where(good, jnp.maximum(new_min, 0.0), pool.idepth_min)
    new_max = jnp.where(good, new_max, pool.idepth_max)
    # Quality is only meaningful when the search segment was long enough to
    # discriminate (a tight interval makes second-best ~ best by
    # construction); keep the previous value on short searches.
    quality_new = jnp.where(good & (dist_c > 4.0), quality, pool.quality)
    status_new = jnp.where(
        good, IPS_GOOD,
        jnp.where(tiny & pool.mask, IPS_SKIPPED,
                  jnp.where(bad, IPS_OUTLIER, pool.status)),
    )
    return pool._replace(
        idepth_min=new_min, idepth_max=new_max,
        quality=quality_new, status=status_new,
    )


def activate(
    pool: ImmaturePoints,
    cand_mask: jnp.ndarray,     # [I] candidates to try activating
    frames_R: jnp.ndarray,      # [F, 3, 3]
    frames_t: jnp.ndarray,      # [F, 3]
    frames_aff: jnp.ndarray,    # [F, 2]
    frames_mask: jnp.ndarray,   # [F]
    images: jnp.ndarray,        # [F, 3, H, W]
    calib: Calib,
    iters: int = 4,
):
    """Idepth-only GN against all window frames (optimizeImmaturePoint,
    FullSystemOptPoint.cpp:51). Returns (idepth [I], ok [I], energy [I]).
    """
    h, w = images.shape[-2:]
    F = frames_mask.shape[0]
    Rh = frames_R[pool.host]
    th = frames_t[pool.host]
    aff_h = frames_aff[pool.host]

    d0 = 0.5 * (pool.idepth_min + jnp.minimum(pool.idepth_max, 1e3))
    d0 = jnp.clip(d0, 1e-3, 50.0)

    pat = jnp.asarray(PATTERN)
    up = pool.u[:, None] + pat[None, :, 0]
    vp = pool.v[:, None] + pat[None, :, 1]

    tgt_mask = (pool.host[None, :] != jnp.arange(F)[:, None]) & \
        frames_mask[:, None] & cand_mask[None, :] & pool.mask[None, :]

    def residuals_at(d):
        def per_target(img_t, R_t, t_t, aff_t, tmask):
            R_th = jnp.einsum("ij,pkj->pik", R_t, Rh)
            t_th = t_t[None] - jnp.einsum("pij,pj->pi", R_th, th)
            xr = (up - calib.cx) / calib.fx
            yr = (vp - calib.cy) / calib.fy
            ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
            pt = jnp.einsum("pij,pkj->pki", R_th, ray) + \
                t_th[:, None, :] * d[:, None, None]
            pz = jnp.where(pt[..., 2] > 1e-6, pt[..., 2], 1e-6)
            x = pt[..., 0] / pz
            y = pt[..., 1] / pz
            un = x * calib.fx + calib.cx
            vn = y * calib.fy + calib.cy
            inb = interp.in_bounds(un, vn, h, w, pad=2.0) & (pt[..., 2] > 1e-6)
            # One 16x16 patch per (target, candidate) pair; pattern
            # intensities + gradients from in-patch contractions (same hot-
            # gather elimination as BA linearize — ops/patch_sample.py;
            # this GN's scattered gathers cost ~1 ms x 4 per iteration).
            CENTER = 4  # PATTERN[4] == (0, 0)
            patches, px0, py0 = patch_sample.gather_patches(
                img_t[0], un[:, CENTER], vn[:, CENTER])
            i_s, gx, gy, okp = patch_sample.sample3(patches, px0, py0,
                                                    un, vn)
            rel_a = jnp.exp(aff_t[0] - aff_h[:, 0])
            pred = rel_a[:, None] * (pool.color - aff_h[:, 1:2]) + aff_t[1]
            r = i_s - pred
            # d(u')/dd along both axes, central-difference-free closed form.
            du_dd = calib.fx * (t_th[:, None, 0] - t_th[:, None, 2] * x) / pz
            dv_dd = calib.fy * (t_th[:, None, 1] - t_th[:, None, 2] * y) / pz
            Jdd = gx * du_dd + gy * dv_dd
            ok = inb & okp & tmask[:, None]
            return r, Jdd, ok

        r, Jdd, ok = jax.vmap(per_target)(
            images, frames_R, frames_t, frames_aff, tgt_mask
        )
        abs_r = jnp.abs(r)
        hw = jnp.where(abs_r < 9.0, 1.0, 9.0 / jnp.maximum(abs_r, 1e-12))
        wt = jnp.where(ok, hw, 0.0)
        return r, Jdd, wt, ok

    def gn_body(_, d):
        r, Jdd, wt, _ = residuals_at(d)
        Hd = jnp.einsum("fpk,fpk->p", wt * Jdd, Jdd) + 1e-4
        bd = jnp.einsum("fpk,fpk->p", wt * Jdd, r)
        step = jnp.clip(-bd / Hd, -0.5, 0.5)
        return jnp.clip(d + step, 1e-3, 50.0)

    d = jax.lax.fori_loop(0, iters, gn_body, d0)

    r, Jdd, wt, ok = residuals_at(d)
    e_pair = jnp.sum(jnp.where(ok, wt * r * r, 0.0), axis=-1)   # [F, I]
    good_pair = jnp.any(ok, axis=-1) & (e_pair < OUTLIER_ENERGY)
    n_good = jnp.sum(good_pair.astype(jnp.int32), axis=0)
    energy = jnp.sum(jnp.where(good_pair, e_pair, 0.0), axis=0)
    ok_point = cand_mask & pool.mask & (n_good >= 2) & (d > 1e-3) & (d < 50.0)
    return d, ok_point, energy
