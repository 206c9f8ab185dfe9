"""Device-side window bookkeeping ops (sync-free).

Through the TPU tunnel a blocking device->host fetch costs hundreds of
milliseconds while dispatches are ~free, so ALL mask/slot logic that the
reference does with pointers and the first Python version did with NumPy
mirrors lives here as jitted array ops: point admission into free slots,
immature respawn with eviction, post-BA outlier pruning, and the
marginalization mask plumbing. The host only makes decisions from small
PACKED stats arrays it fetches asynchronously.

Slot-matching pattern used throughout: argsort puts free slots first and
candidates best-first; rank r candidate goes to rank r free slot; a single
comparison `r < n_admit` gates the scatter. Static shapes, exact masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dmvio_tpu.ops import immature, interp, select
from dmvio_tpu.ops.immature import (IPS_GOOD, IPS_OOB, IPS_OUTLIER,
                                    IPS_SKIPPED, IPS_UNINITIALIZED,
                                    IDEPTH_MAX_INIT, MIN_TRACE_QUALITY,
                                    ImmaturePoints)
from dmvio_tpu.ops.residuals import BAFrames, BAPoints
from dmvio_tpu.utils.camera import PATTERN


@jax.jit
def project_into(frames: BAFrames, host, u, v, idepth, calib, slot):
    """Project per-point host pixels into window frame `slot`.

    Returns (u', v', idepth', valid) — the batched analogue of the
    reference's FrameFramePrecalc + projectPoint pairing."""
    R_h = frames.R_cw[host]
    t_h = frames.t_cw[host]
    R_t = frames.R_cw[slot]
    t_t = frames.t_cw[slot]
    R_th = jnp.einsum("ij,pkj->pik", R_t, R_h)
    t_th = t_t[None] - jnp.einsum("pij,pj->pi", R_th, t_h)
    xr = (u - calib.cx) / calib.fx
    yr = (v - calib.cy) / calib.fy
    ray = jnp.stack([xr, yr, jnp.ones_like(xr)], axis=-1)
    pt = jnp.einsum("pij,pj->pi", R_th, ray) + t_th * idepth[:, None]
    pz = pt[..., 2]
    valid = pz > 1e-6
    pzs = jnp.where(valid, pz, 1.0)
    un = pt[..., 0] / pzs * calib.fx + calib.cx
    vn = pt[..., 1] / pzs * calib.fy + calib.cy
    return un, vn, idepth / pzs, valid


@jax.jit
def pattern_colors(level0, u, v):
    """Host pattern intensities + gradient weights at new point locations
    (the data stored at point birth, ImmaturePoint ctor)."""
    pat = jnp.asarray(PATTERN)
    samp = jax.vmap(
        lambda uu, vv: interp.bilinear_stack(level0, uu + pat[:, 0],
                                             vv + pat[:, 1])
    )(u, v)
    color = samp[..., 0]
    g2 = samp[..., 1] ** 2 + samp[..., 2] ** 2
    weight = jnp.sqrt(2500.0 / (2500.0 + g2))
    return color, weight


@jax.jit
def insert_frame(frames: BAFrames, images, pair_mask, points_mask,
                 slot, pyr0, R_cw, t_cw, aff):
    """Occupy a frame slot; the new frame observes all active points."""
    f = frames._replace(
        R_cw=frames.R_cw.at[slot].set(R_cw),
        t_cw=frames.t_cw.at[slot].set(t_cw),
        aff=frames.aff.at[slot].set(aff),
        R0_cw=frames.R0_cw.at[slot].set(R_cw),
        t0_cw=frames.t0_cw.at[slot].set(t_cw),
        aff0=frames.aff0.at[slot].set(aff),
        mask=frames.mask.at[slot].set(True),
    )
    images = images.at[slot].set(pyr0)
    pair_mask = pair_mask.at[slot].set(points_mask)
    return f, images, pair_mask


@jax.jit
def set_fej_current(frames: BAFrames, slot):
    return frames._replace(
        R0_cw=frames.R0_cw.at[slot].set(frames.R_cw[slot]),
        t0_cw=frames.t0_cw.at[slot].set(frames.t_cw[slot]),
        aff0=frames.aff0.at[slot].set(frames.aff[slot]),
    )


@jax.jit
def admit_points(points: BAPoints, pair_mask, frames_mask,
                 cand_host, cand_u, cand_v, cand_idepth,
                 cand_color, cand_weight, cand_ok, cand_score):
    """Admit candidates into free point slots, best score first.

    Returns (points, pair_mask, admitted [I] bool)."""
    P = points.mask.shape[0]
    I = cand_ok.shape[0]
    F = frames_mask.shape[0]
    K = min(P, I)

    free = ~points.mask
    slot_order = jnp.argsort(~free)          # free slots first (stable)
    score = jnp.where(cand_ok, cand_score, -jnp.inf)
    cand_order = jnp.argsort(-score)
    n_admit = jnp.minimum(jnp.sum(free), jnp.sum(cand_ok))

    r = jnp.arange(K)
    adm = r < n_admit
    dest = slot_order[:K]
    src = cand_order[:K]

    def put(arr, vals):
        return arr.at[dest].set(jnp.where(
            adm.reshape((K,) + (1,) * (vals.ndim - 1)),
            vals[src], arr[dest]))

    pts = points._replace(
        host=put(points.host, cand_host),
        u=put(points.u, cand_u),
        v=put(points.v, cand_v),
        idepth=put(points.idepth, cand_idepth),
        idepth_zero=put(points.idepth_zero, cand_idepth),
        color=put(points.color, cand_color),
        weight=put(points.weight, cand_weight),
        mask=points.mask.at[dest].set(
            jnp.where(adm, True, points.mask[dest])),
    )
    # Pair columns of admitted points: all occupied frames except the host.
    newcols = frames_mask[:, None] & (
        jnp.arange(F)[:, None] != cand_host[None, src])      # [F, K]
    pm = pair_mask.at[:, dest].set(
        jnp.where(adm[None, :], newcols, pair_mask[:, dest]))
    admitted = jnp.zeros((I,), bool).at[src].set(adm)
    return pts, pm, admitted


@functools.partial(jax.jit, static_argnames=("h", "w"))
def respawn_immatures(pool: ImmaturePoints, frames: BAFrames,
                      points: BAPoints, pyr0, calib, slot, h: int, w: int):
    """Select fresh candidates in the new KF and fill pool slots
    (makeNewTraces): free slots first, then evict OOB/OUTLIER slots."""
    I = pool.mask.shape[0]
    sel = select.select_points(pyr0, I, pot=4)
    au, av, _, avalid = project_into(
        frames, points.host, points.u, points.v, points.idepth, calib, slot)
    clear = select.occupancy_spacing(
        au, av, points.mask & avalid, sel.u, sel.v, h, w, radius=0, cell=4)
    ok = sel.mask & clear
    color, weight = pattern_colors(pyr0, sel.u, sel.v)

    # Fill priority: 0 = empty slot, 1 = dead (OOB/outlier), 2 = keep.
    dead = pool.mask & (jnp.isin(pool.status,
                                 jnp.asarray([IPS_OOB, IPS_OUTLIER])))
    key = jnp.where(~pool.mask, 0, jnp.where(dead, 1, 2))
    slot_order = jnp.argsort(key)
    cand_order = jnp.argsort(-jnp.where(ok, sel.score, -jnp.inf))
    n_admit = jnp.minimum(jnp.sum(key < 2), jnp.sum(ok))

    K = I
    r = jnp.arange(K)
    adm = r < n_admit
    dest = slot_order[:K]
    src = cand_order[:K]

    def put(arr, vals):
        return arr.at[dest].set(jnp.where(
            adm.reshape((K,) + (1,) * (vals.ndim - 1)),
            vals[src], arr[dest]))

    zero = jnp.zeros((I,), jnp.float32)
    return pool._replace(
        host=put(pool.host, jnp.full((I,), slot, jnp.int32)),
        u=put(pool.u, sel.u),
        v=put(pool.v, sel.v),
        idepth_min=put(pool.idepth_min, zero),
        idepth_max=put(pool.idepth_max,
                       jnp.full((I,), IDEPTH_MAX_INIT, jnp.float32)),
        color=put(pool.color, color),
        weight=put(pool.weight, weight),
        quality=put(pool.quality, jnp.full((I,), 1e4, jnp.float32)),
        status=put(pool.status,
                   jnp.full((I,), IPS_UNINITIALIZED, jnp.int32)),
        mask=pool.mask.at[dest].set(jnp.where(adm, True, pool.mask[dest])),
    )


@jax.jit
def post_ba_update(points: BAPoints, pair_mask, outlier):
    """Drop outlier pairs, then points left without observations."""
    pm = pair_mask & ~outlier
    pairs_left = jnp.sum(pm, axis=0)
    keep = points.mask & (pairs_left > 0)
    pts = points._replace(mask=keep)
    pm = pm & keep[None, :]
    return pts, pm


@jax.jit
def marg_stats(frames: BAFrames, points: BAPoints, pair_mask):
    """Packed stats for the host's marginalization decision: [t_cw (3F),
    frame_mask (F), hosted active count per frame (F), n_active (1),
    n_pairs_per_point aggregated? -> total pairs (1)]."""
    F = frames.mask.shape[0]
    hosted = jax.nn.one_hot(points.host, F, dtype=jnp.float32) * \
        points.mask[:, None].astype(jnp.float32)
    hosted_count = jnp.sum(hosted, axis=0)
    return jnp.concatenate([
        frames.t_cw.reshape(-1),
        frames.mask.astype(jnp.float32),
        hosted_count,
        jnp.sum(points.mask.astype(jnp.float32))[None],
        jnp.sum(pair_mask.astype(jnp.float32))[None],
    ])


@jax.jit
def victims_masks(points: BAPoints, pair_mask, vlist):
    """Device masks for a (padded, -1-filled) victim slot list: returns
    (hosted [P], marg_pts [P], pair_mask with victim rows cleared)."""
    is_victim_host = jnp.any(
        points.host[None, :] == vlist[:, None], axis=0) & (points.host >= 0)
    hosted = points.mask & is_victim_host
    n_pairs = jnp.sum(pair_mask, axis=0)
    marg_pts = hosted & (n_pairs >= 1)
    F = pair_mask.shape[0]
    row_victim = jnp.any(jnp.arange(F)[None, :] == vlist[:, None], axis=0)
    pm = pair_mask & ~row_victim[:, None]
    return hosted, marg_pts, pm


@jax.jit
def drop_points_mask(points: BAPoints, pair_mask, drop):
    keep = points.mask & ~drop
    pts = points._replace(mask=keep)
    return pts, pair_mask & keep[None, :]


@jax.jit
def drop_frame_slot(frames: BAFrames, pair_mask, slot):
    f = frames._replace(mask=frames.mask.at[slot].set(False))
    return f, pair_mask.at[slot].set(False)


@jax.jit
def kf_pose_pack(frames: BAFrames):
    """All window poses + affine in one fetchable array [F*(9+3+2)]."""
    return jnp.concatenate([
        frames.R_cw.reshape(-1), frames.t_cw.reshape(-1),
        frames.aff.reshape(-1)])


@jax.jit
def compose_abs_pose(R_rel, t_rel, rho, b_aff, frames: BAFrames, slot):
    """T_new_w = T_rel o T_ref and the absolute brightness pair, on device
    (so the trace dispatch never waits for a host fetch)."""
    R_ref = frames.R_cw[slot]
    t_ref = frames.t_cw[slot]
    R = R_rel @ R_ref
    t = R_rel @ t_ref + t_rel
    aff_ref = frames.aff[slot]
    a_new = aff_ref[0] + rho
    b_new = b_aff + jnp.exp(rho) * aff_ref[1]
    return R, t, jnp.stack([a_new, b_new])


@jax.jit
def track_candidates(R_last, t_last, R_prev, t_prev,
                     frames: BAFrames, slot):
    """Per-frame tracking candidate batch computed ON DEVICE from the last
    two frames' (device) absolute poses: [constant-velocity, zero-motion,
    identity-at-ref, pad], relative to window frame `slot`. Replaces the
    host candidate build so dispatch never waits for pose fetches (the
    deferred keyframe's pose may not have reached the host yet)."""
    R_ref = frames.R_cw[slot]
    t_ref = frames.t_cw[slot]
    # Motion in the world frame: T_m = T_last o T_prev^-1.
    R_m = R_last @ R_prev.T
    t_m = t_last - R_m @ t_prev
    # Constant velocity: T_cv = T_m o T_last.
    R_cv = R_m @ R_last
    t_cv = R_m @ t_last + t_m

    def rel(R_a, t_a):
        R_r = R_a @ R_ref.T
        return R_r, t_a - R_r @ t_ref

    R1, t1 = rel(R_cv, t_cv)
    R2, t2 = rel(R_last, t_last)
    eye = jnp.eye(3, dtype=R1.dtype)
    z = jnp.zeros(3, dtype=t1.dtype)
    R_c = jnp.stack([R1, R2, eye, eye])
    t_c = jnp.stack([t1, t2, z, z])
    mask = jnp.array([True, True, True, False])
    return R_c, t_c, mask


@jax.jit
def rel_candidates(R_cw, t_cw, frames: BAFrames, slot):
    """Tracking candidates for an in-flight frame relative to window frame
    `slot`, computed ON DEVICE (used when the reference keyframe was just
    switched and its pose has not reached the host yet): [frame's own
    absolute pose re-expressed, identity(= at the ref)], padded to the
    fixed [4] candidate batch."""
    R_ref = frames.R_cw[slot]
    t_ref = frames.t_cw[slot]
    R_rel = R_cw @ R_ref.T
    t_rel = t_cw - R_rel @ t_ref
    eye = jnp.eye(3, dtype=R_rel.dtype)
    z = jnp.zeros(3, dtype=t_rel.dtype)
    R_c = jnp.stack([R_rel, eye, R_rel, eye])
    t_c = jnp.stack([t_rel, z, t_rel, z])
    mask = jnp.array([True, True, False, False])
    return R_c, t_c, mask


@functools.partial(jax.jit, static_argnames=("h", "w"))
def activate_and_admit(pool: ImmaturePoints, frames: BAFrames,
                       points: BAPoints, pair_mask, images, calib, slot,
                       h: int, w: int, radius, use_spacing):
    """Candidate gating + spacing + idepth GN + admission, one dispatch
    (activatePointsMT + insertion, FullSystem.cpp:604).

    Returns (pool, points, pair_mask)."""
    d_mid = jnp.clip(
        0.5 * (pool.idepth_min + jnp.minimum(pool.idepth_max, 1e3)),
        1e-3, 50.0)
    tight = (pool.idepth_max - pool.idepth_min) < \
        jnp.maximum(0.25 * d_mid, 0.05)
    q_th = MIN_TRACE_QUALITY
    cand = pool.mask & jnp.isin(
        pool.status, jnp.asarray([IPS_GOOD, IPS_SKIPPED])) & \
        (pool.quality > q_th) & tight & (d_mid > 1e-3)
    cu, cv, _, cvalid = project_into(
        frames, pool.host, pool.u, pool.v, d_mid, calib, slot)
    # radius/use_spacing follow the point density and are TRACED (density
    # crossing a threshold mid-sequence must not recompile this program).
    au, av, _, avalid = project_into(
        frames, points.host, points.u, points.v, points.idepth,
        calib, slot)
    clear = select.occupancy_spacing(
        au, av, points.mask & avalid, cu, cv, h, w,
        radius=radius, cell=8)
    cand = cand & (clear | ~jnp.asarray(use_spacing, bool))
    cand = cand & cvalid

    d, ok, energy = immature.activate(
        pool, cand, frames.R_cw, frames.t_cw, frames.aff, frames.mask,
        images, calib)
    pts, pm, admitted = admit_points(
        points, pair_mask, frames.mask,
        pool.host, pool.u, pool.v, d, pool.color, pool.weight,
        ok & cand, pool.quality)
    # Every tried candidate leaves the pool (admitted or failed).
    pool = pool._replace(mask=pool.mask & ~cand)
    return pool, pts, pm