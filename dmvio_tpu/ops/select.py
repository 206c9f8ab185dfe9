"""Candidate pixel selection on gradient maps.

TPU-native re-design of PixelSelector2 (src/dso/FullSystem/
PixelSelector2.cpp:158 makeMaps + region-based select at 3 scales). The
reference walks the image in nested scalar loops with per-32x32-block
gradient-histogram thresholds and a density feedback loop; we compute the
same decisions as array ops:

  1. per-block robust threshold from the gradient magnitude distribution
     (median + add, as setting_minGradHistCut/Add, settings.h:161-163),
  2. non-maximum suppression on a `pot`-cell grid (one winner per cell, like
     the reference's potential grid),
  3. a fixed-capacity top-K over the suppressed scores so downstream shapes
     are static (losers are masked, not absent).

Outputs pixel coordinates at level 0 plus a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Reference defaults (settings.cpp / settings.h:161-163).
MIN_GRAD_HIST_ADD = 7.0
BLOCK = 32


class Selection(NamedTuple):
    u: jnp.ndarray      # [K] float32 pixel x
    v: jnp.ndarray      # [K] float32 pixel y
    score: jnp.ndarray  # [K] gradient magnitude^2 at the pixel
    mask: jnp.ndarray   # [K] bool valid


def _block_thresholds(gsq: jnp.ndarray, block: int) -> jnp.ndarray:
    """Per-block selection threshold, broadcast back to pixels.

    threshold = (median(|grad|) + MIN_GRAD_HIST_ADD)^2 over each
    block x block region (the reference's smoothed histogram median,
    PixelSelector2.cpp:77-155).
    """
    h, w = gsq.shape
    gb = jnp.sqrt(gsq.reshape(h // block, block, w // block, block))
    med = jnp.median(gb.transpose(0, 2, 1, 3).reshape(
        h // block, w // block, block * block), axis=-1)
    th = (med + MIN_GRAD_HIST_ADD) ** 2
    th = jnp.repeat(jnp.repeat(th, block, axis=0), block, axis=1)
    return th


def _cell_nms(score: jnp.ndarray, pot: int) -> jnp.ndarray:
    """Keep only the max-scoring pixel per pot x pot cell (zero the rest)."""
    h, w = score.shape
    cells = score.reshape(h // pot, pot, w // pot, pot)
    cells = cells.transpose(0, 2, 1, 3).reshape(h // pot, w // pot, pot * pot)
    best = jnp.argmax(cells, axis=-1)
    keep = jax.nn.one_hot(best, pot * pot, dtype=score.dtype)
    out = (cells * keep).reshape(h // pot, w // pot, pot, pot)
    return out.transpose(0, 2, 1, 3).reshape(h, w)


def select_points(
    level0: jnp.ndarray,   # [3, H, W] (intensity, gx, gy)
    k: int,
    pot: int = 4,
    border: int = 4,
) -> Selection:
    """Select up to k well-spread high-gradient pixels (static shapes).

    Like the reference's three-scale fallback (select(), PixelSelector2.h:56)
    a second pass at 2*pot with half the threshold fills cells that found
    nothing at full resolution — weights are arranged so pass-1 winners
    always outrank pass-2 winners in the top-k.
    """
    _, h, w = level0.shape
    gsq = level0[1] ** 2 + level0[2] ** 2
    th = _block_thresholds(gsq, BLOCK)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inb = (
        (xx >= border) & (xx < w - border) & (yy >= border) & (yy < h - border)
    )

    s1 = jnp.where((gsq > th) & inb, gsq, 0.0)
    s1 = _cell_nms(s1, pot)
    s2 = jnp.where((gsq > 0.25 * th) & inb, gsq, 0.0)
    s2 = _cell_nms(s2, pot * 2)
    # Pass-2 candidates only where pass 1 found nothing in the 2pot cell;
    # give them a rank penalty so genuine pass-1 picks dominate the top-k.
    p2 = pot * 2
    occ1 = s1.reshape(h // p2, p2, w // p2, p2).max(axis=(1, 3)) > 0
    occ1 = jnp.repeat(jnp.repeat(occ1, p2, axis=0), p2, axis=1)
    score = jnp.where(s1 > 0, s1 + 1e6, jnp.where(occ1, 0.0, s2))

    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k)
    u = (idx % w).astype(jnp.float32)
    v = (idx // w).astype(jnp.float32)
    valid = top > 0.0
    return Selection(u=u, v=v, score=jnp.where(top > 1e5, top - 1e6, top),
                     mask=valid)


select_points_jit = jax.jit(select_points, static_argnames=("k", "pot", "border"))


def occupancy_spacing(
    u_exist: jnp.ndarray, v_exist: jnp.ndarray, exist_mask: jnp.ndarray,
    u_cand: jnp.ndarray, v_cand: jnp.ndarray,
    h: int, w: int, radius: int = 2, cell: int = 8,
) -> jnp.ndarray:
    """Spatial spreading for activation: candidate is clear if no existing
    point lies within `radius` cells of its `cell`-sized grid cell.

    TPU-friendly replacement of CoarseDistanceMap's BFS distance transform
    (src/dso/FullSystem/CoarseTracker.h:132-175): build an occupancy grid of
    existing points and dilate it `radius` times with 3x3 max pooling.
    """
    gh, gw = h // cell, w // cell
    gx = jnp.clip((u_exist / cell).astype(jnp.int32), 0, gw - 1)
    gy = jnp.clip((v_exist / cell).astype(jnp.int32), 0, gh - 1)
    occ = jnp.zeros((gh, gw), jnp.float32)
    occ = occ.at[gy, gx].add(exist_mask.astype(jnp.float32))
    occ = (occ > 0).astype(jnp.float32)
    # `radius` may be TRACED (it follows the point density, which must not
    # trigger a recompile mid-sequence): dilate to the max radius, keep all
    # stages, select dynamically. The grid is tiny (h/cell x w/cell), so
    # the extra stages cost nothing next to a recompile through the tunnel.
    MAX_R = 2
    stages = [occ]
    for _ in range(MAX_R):
        occ = jax.lax.reduce_window(
            occ, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        stages.append(occ)
    r = jnp.clip(jnp.asarray(radius, jnp.int32), 0, MAX_R)
    occ_sel = jnp.stack(stages)[r]
    cx = jnp.clip((u_cand / cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((v_cand / cell).astype(jnp.int32), 0, gh - 1)
    return occ_sel[cy, cx] <= 0
