"""Monocular visual initializer.

Fills the role of CoarseInitializer (src/dso/FullSystem/
CoarseInitializer.cpp:85 trackFrame / :804 setFirst): estimate the relative
pose of an early frame against the first frame plus per-point inverse
depths, and decide when the baseline is large enough ("snapped") to seed the
window.

TPU-first re-design instead of the reference's joint pyramid GN with
neighbour regularization (KD-tree + Schur on per-point idepth): we reuse the
two batched programs that already exist —
  1. coarse-to-fine photometric alignment with a flat (idepth = 1) cloud,
  2. batched epipolar tracing (ops/immature.py) to measure idepths given a
     pose — and alternate them a fixed number of rounds. The scene scale is
then normalized so the median inverse depth is 1 (the reference rescales
identically, CoarseInitializer::trackFrame end / FullSystem::
initializeFromInitializer, FullSystem.cpp:1543).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dmvio_tpu.models import coarse_tracker
from dmvio_tpu.ops import immature, interp, select
from dmvio_tpu.utils.camera import Calib, PATTERN

_make_ref_jit = jax.jit(coarse_tracker.make_tracker_ref)


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
    """Stateful two-frame initializer (host-side control flow)."""

    def __init__(self, calib: Calib, h: int, w: int, n_points: int = 1024,
                 levels: int = 6, min_parallax: float = 0.008,
                 rounds: int = 2):
        self.calib = calib
        self.h, self.w = h, w
        self.n = n_points
        self.levels = levels
        self.min_parallax = min_parallax * (w + h)   # RMS px
        self.rounds = rounds
        self.first_pyr = None
        self.sel = None
        self.colors = None
        self.weights = None
        self.last_R = jnp.eye(3)
        self.last_t = jnp.zeros(3)
        self.frames_since_first = 0

    def set_first(self, pyr) -> None:
        self.first_pyr = pyr
        self.sel = select.select_points_jit(pyr[0], self.n, pot=4)
        pat = jnp.asarray(PATTERN)
        self.colors = jax.vmap(
            lambda uu, vv: interp.bilinear(pyr[0][0], uu + pat[:, 0],
                                           vv + pat[:, 1])
        )(self.sel.u, self.sel.v)
        gsq = jax.vmap(
            lambda uu, vv: interp.bilinear_stack(pyr[0], uu + pat[:, 0],
                                                 vv + pat[:, 1])
        )(self.sel.u, self.sel.v)
        g2 = gsq[..., 1] ** 2 + gsq[..., 2] ** 2
        self.weights = jnp.sqrt(2500.0 / (2500.0 + g2))
        self.frames_since_first = 0

    def _track(self, new_pyr, idepth, mask, R0, t0):
        ref = _make_ref_jit(
            self.first_pyr, self.calib, self.sel.u, self.sel.v, idepth, mask
        )
        return coarse_tracker.track_jit(
            ref, new_pyr, self.calib, R0, t0,
            jnp.asarray(0.0), jnp.asarray(0.0), levels=self.levels,
        )

    def try_init(self, new_pyr) -> Optional[InitResult]:
        """Process one frame; returns an InitResult once snapped."""
        self.frames_since_first += 1
        flat_d = jnp.ones((self.n,), jnp.float32)
        # Track from IDENTITY first: warm-starting the flat-cloud (all
        # idepth = 1) alignment settles into a rotation-biased valley that
        # underestimates translation and corrupts the epipolar directions
        # for depth tracing; the cold coarse-to-fine solve finds the
        # translation-rich minimum. Fall back to the warm start if cold
        # fails (large accumulated motion).
        res = self._track(new_pyr, flat_d, self.sel.mask,
                          jnp.eye(3), jnp.zeros(3))
        if not bool(res.valid):
            res = self._track(new_pyr, flat_d, self.sel.mask, self.last_R,
                              self.last_t)
        if not bool(res.valid):
            self.last_R = jnp.eye(3)
            self.last_t = jnp.zeros(3)
            return None
        self.last_R, self.last_t = res.R, res.t

        if float(res.flow_t) < self.min_parallax:
            return None   # not enough translation yet

        # Alternate epipolar depth measurement and re-tracking.
        pool = immature.empty_pool(self.n)
        pool = pool._replace(
            u=self.sel.u, v=self.sel.v, color=self.colors,
            weight=self.weights, mask=self.sel.mask,
        )
        R, t = res.R, res.t
        rho, b_aff = res.rho, res.b_aff
        eyeI = jnp.broadcast_to(jnp.eye(3), (self.n, 3, 3))
        zeroI = jnp.zeros((self.n, 3))
        affI = jnp.zeros((self.n, 2))
        aff_n = jnp.stack([rho, b_aff])
        for rnd in range(self.rounds):
            pool = pool._replace(
                idepth_min=jnp.zeros(self.n),
                idepth_max=jnp.full((self.n,), immature.IDEPTH_MAX_INIT),
                status=jnp.zeros(self.n, jnp.int32),
            )
            pool = immature.trace(pool, eyeI, zeroI, affI, R, t, aff_n,
                                  new_pyr[0], self.calib)
            good = np.asarray(pool.status) == immature.IPS_GOOD
            # The first round tolerates a thin harvest (the pose from flat
            # tracking is biased; the re-track with measured depths fixes
            # it and the next round re-traces much better).
            if good.sum() < (0.15 if rnd == 0 else 0.3) * self.n:
                return None
            d_mid = 0.5 * (pool.idepth_min + jnp.minimum(pool.idepth_max, 1e3))
            d_mid = jnp.clip(d_mid, 1e-3, 50.0)
            mask = self.sel.mask & jnp.asarray(good)
            res = self._track(new_pyr, d_mid, mask, R, t)
            if not bool(res.valid):
                return None
            R, t = res.R, res.t
            rho, b_aff = res.rho, res.b_aff
            aff_n = jnp.stack([rho, b_aff])

        good = np.asarray(pool.status) == immature.IPS_GOOD
        d_mid = np.asarray(jnp.clip(
            0.5 * (pool.idepth_min + jnp.minimum(pool.idepth_max, 1e3)),
            1e-3, 50.0,
        ))
        med = float(np.median(d_mid[good]))
        if not np.isfinite(med) or med <= 1e-4:
            return None
        # Normalize scale: median idepth -> 1 (idepth /= med, t *= med keeps
        # the projections pt = R ray + t * d identical).
        d_norm = jnp.asarray(d_mid / med)
        t_norm = t * med
        return InitResult(
            R=R, t=t_norm, rho=rho, b_aff=b_aff,
            u=self.sel.u, v=self.sel.v, idepth=d_norm,
            color=self.colors, weight=self.weights,
            mask=jnp.asarray(good) & self.sel.mask,
        )
