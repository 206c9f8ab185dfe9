"""Monocular visual initializer.

TPU-native re-design of CoarseInitializer (src/dso/FullSystem/
CoarseInitializer.{h,cpp}): joint pose + per-point inverse-depth GN over
the pyramid (ops/init_gn.py) against the first frame, warm-started across
incoming frames, with the reference's "snapped" criterion (enough
translation) and its wait-after-snap before handing the window its first
two keyframes (setFirst :804, trackFrame :85; snapped logic :439-461,
FullSystem::initializeFromInitializer rescaling FullSystem.cpp:1543).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.ops import init_gn, interp, select
from dmvio_tpu.utils.camera import Calib, PATTERN


class InitResult(NamedTuple):
    R: jnp.ndarray        # world-to-cam of the second keyframe (first = id)
    t: jnp.ndarray
    rho: jnp.ndarray      # relative brightness gain (log) first -> second
    b_aff: jnp.ndarray
    u: jnp.ndarray        # [N] point pixels in the first frame
    v: jnp.ndarray
    idepth: jnp.ndarray   # [N] normalized so median == 1
    color: jnp.ndarray    # [N, 8]
    weight: jnp.ndarray   # [N, 8]
    mask: jnp.ndarray     # [N]


class VisualInitializer:
    """Stateful two-frame initializer (host control, jitted GN core)."""

    # Frames to keep optimizing after the baseline first suffices
    # (reference snappedAt + 5, CoarseInitializer.cpp:153).
    WAIT_AFTER_SNAP = 5

    def __init__(self, calib: Calib, h: int, w: int, n_points: int = 1024,
                 levels: int = 6, min_parallax: float = 0.008,
                 rounds: int = 2):
        self.calib = calib
        self.h, self.w = h, w
        self.n = n_points
        self.levels = levels
        self.first_pyr = None
        self.sel = None
        self.colors = None
        self.weights = None
        self.last_R = jnp.eye(3)
        self.last_t = jnp.zeros(3)
        self.rho = jnp.asarray(0.0)
        self.b_aff = jnp.asarray(0.0)
        self.idepth = jnp.ones((n_points,), jnp.float32)
        self.frames_since_first = 0
        self.snapped_at = -1

    def set_first(self, pyr) -> None:
        self.first_pyr = pyr
        self.sel = select.select_points_jit(pyr[0], self.n, pot=4)
        pat = jnp.asarray(PATTERN)
        samp = jax.vmap(
            lambda uu, vv: interp.bilinear_stack(pyr[0], uu + pat[:, 0],
                                                 vv + pat[:, 1])
        )(self.sel.u, self.sel.v)
        self.colors = samp[..., 0]
        g2 = samp[..., 1] ** 2 + samp[..., 2] ** 2
        self.weights = jnp.sqrt(2500.0 / (2500.0 + g2))
        self.last_R = jnp.eye(3)
        self.last_t = jnp.zeros(3)
        self.rho = jnp.asarray(0.0)
        self.b_aff = jnp.asarray(0.0)
        self.idepth = jnp.ones((self.n,), jnp.float32)
        self.frames_since_first = 0
        self.snapped_at = -1

    def try_init(self, new_pyr) -> Optional[InitResult]:
        """Joint-GN track of this frame; returns InitResult once snapped
        long enough."""
        self.frames_since_first += 1
        R, t, rho, b_aff, idepth, packed = init_gn.init_track_jit(
            self.first_pyr, new_pyr, self.calib,
            self.sel.u, self.sel.v, self.sel.mask,
            self.last_R, self.last_t, self.rho, self.b_aff, self.idepth,
            levels=self.levels)
        pk = np.asarray(packed)
        snapped = pk[14] > 0.5
        finite = pk[15] > 0.5
        if not finite:
            # Restart the optimization state, keep the first frame.
            self.last_R = jnp.eye(3)
            self.last_t = jnp.zeros(3)
            self.rho = jnp.asarray(0.0)
            self.b_aff = jnp.asarray(0.0)
            self.idepth = jnp.ones((self.n,), jnp.float32)
            self.snapped_at = -1
            return None
        # Warm-start the next frame from this solution (the reference
        # carries points + pose across frames the same way).
        self.last_R, self.last_t = R, t
        self.rho, self.b_aff = rho, b_aff
        self.idepth = idepth

        if not snapped:
            self.snapped_at = -1
            return None
        if self.snapped_at < 0:
            self.snapped_at = self.frames_since_first
        if self.frames_since_first - self.snapped_at < self.WAIT_AFTER_SNAP:
            return None

        d = np.asarray(idepth)
        m = np.asarray(self.sel.mask) & np.isfinite(d) & (d > 1e-3) & \
            (d < 50.0)
        if m.sum() < 0.2 * self.n:
            return None
        med = float(np.median(d[m]))
        if not np.isfinite(med) or med <= 1e-4:
            return None
        # Normalize scale: median idepth -> 1 (idepth /= med, t *= med
        # keeps projections pt = R ray + t d identical; the reference
        # rescales identically at initializeFromInitializer).
        return InitResult(
            R=R, t=t * med, rho=rho, b_aff=b_aff,
            u=self.sel.u, v=self.sel.v,
            idepth=jnp.asarray(d / med),
            color=self.colors, weight=self.weights,
            mask=jnp.asarray(m),
        )
