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
    scale: float          # median-idepth normalization applied (t *= scale):
                          # pre-init frame poses live at the UNSCALED scale
                          # and must be multiplied by this at handoff


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
        self.frames_since_first = 0
        self._reset_candidates()

    # Hypothesis seeds: the joint GN is non-convex; several translation-
    # direction seeds run as ONE vmapped program and the photometric
    # energy picks the basin (see ops/init_gn.init_track_multi_jit).
    N_CAND = 7
    SEED_T = 0.05   # in idepth~1-normalized units (~5% of scene depth)

    def _seed_t(self):
        dirs = np.array([
            [0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
            [0, 0, 1], [0, 0, -1]], np.float32)
        return jnp.asarray(self.SEED_T * dirs)

    def _reset_candidates(self):
        C, n = self.N_CAND, self.n
        self.c_R = jnp.broadcast_to(jnp.eye(3), (C, 3, 3)).astype(jnp.float32)
        self.c_t = self._seed_t()
        self.c_rho = jnp.zeros((C,), jnp.float32)
        self.c_b = jnp.zeros((C,), jnp.float32)
        self.c_idepth = jnp.ones((C, n), jnp.float32)
        self.snap_streak = np.zeros(C, np.int32)

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
        self.frames_since_first = 0
        self._reset_candidates()

    def shift_rho(self, dlog: float) -> None:
        """Shift every hypothesis' log-gain warm start by a KNOWN
        log-exposure ratio (exposure-relative brightness seeding; the
        reference's init tracker works on exposure-normalized affines,
        AffLight::fromToVecExposure, NumType.h:174). rho here is
        first-frame-relative, so per-frame ratios accumulate."""
        self.c_rho = self.c_rho + jnp.asarray(dlog, jnp.float32)

    def try_init(self, new_pyr) -> Optional[InitResult]:
        """Joint-GN track of this frame (all hypotheses in one vmapped
        program); returns InitResult once the best hypothesis has been
        snapped long enough."""
        self.frames_since_first += 1
        R, t, rho, b_aff, idepth, packed = init_gn.init_track_multi_jit(
            self.first_pyr, new_pyr, self.calib,
            self.sel.u, self.sel.v, self.sel.mask,
            self.c_R, self.c_t, self.c_rho, self.c_b, self.c_idepth,
            levels=self.levels)
        pk = np.asarray(packed)              # [C, 17]
        snapped = pk[:, 14] > 0.5
        finite = pk[:, 15] > 0.5
        energy = pk[:, 16]

        e_eff = np.where(finite, energy, np.inf)
        best = int(np.argmin(np.where(snapped, e_eff, np.inf)
                             if snapped.any() else e_eff))
        self.last_R = R[best]
        self.last_t = t[best]

        # Only the WINNER continues to the next frame; every other
        # hypothesis RESTARTS from its seed (with the winner's rotation —
        # rotation is the well-conditioned subspace). Continuing all
        # hypotheses through the low-baseline phase collapses them into
        # one basin: measured, a frame-by-frame-continued solve ends 55
        # degrees off in translation direction while a fresh solve at the
        # same (sufficient) baseline is exact — diversity must be re-seeded
        # every frame so the fresh hypothesis wins as soon as the data
        # supports it.
        C = self.N_CAND
        seeds_t = self._seed_t()
        if finite[best]:
            Rw = jnp.broadcast_to(R[best], (C, 3, 3))
            self.c_R = Rw
            self.c_t = jnp.concatenate([t[best][None], seeds_t[1:]])
            self.c_rho = jnp.full((C,), rho[best])
            self.c_b = jnp.full((C,), b_aff[best])
            self.c_idepth = jnp.concatenate(
                [idepth[best][None],
                 jnp.ones((C - 1, self.n), jnp.float32)])
        else:
            self._reset_candidates()
        self.snap_streak = np.where(snapped & finite,
                                    self.snap_streak + 1, 0)

        # The wait-after-snap gates WHEN the handoff happens (the
        # reference's snappedAt+5 refinement window); the candidate handed
        # over is the best SNAPPED one at that moment — fresh hypotheses
        # re-seeded every frame usually win once the baseline is real.
        ready = (snapped & finite
                 & (self.snap_streak >= self.WAIT_AFTER_SNAP))
        if not ready.any():
            return None
        c = int(np.argmin(np.where(snapped & finite, e_eff, np.inf)))

        d = np.asarray(idepth[c])
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
            R=R[c], t=t[c] * med, rho=rho[c], b_aff=b_aff[c],
            u=self.sel.u, v=self.sel.v,
            idepth=jnp.asarray(d / med),
            color=self.colors, weight=self.weights,
            mask=jnp.asarray(m),
            scale=med,
        )
