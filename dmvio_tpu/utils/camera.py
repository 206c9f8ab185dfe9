"""Camera calibration and global geometry constants.

TPU-native equivalent of the reference's global calibration layer
(src/dso/util/globalCalib.h:32-44: per-pyramid-level image sizes and
intrinsics) and the residual pattern constant
(src/dso/util/settings.h:227-229: 8-point spread pattern, patternNum=8).

Calibration is a pytree so it can flow through jit; intrinsics are also
optimizable in bundle adjustment (CalibHessian, HessianBlocks.h:309-409).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Number of pyramid levels (reference settings.h:52 PYR_LEVELS=6).
PYR_LEVELS = 6

# 8-point residual pattern (dx, dy) offsets around the central pixel —
# the "spread" pattern from the DSO paper (settings.h staticPattern[8]).
PATTERN = np.array(
    [[0, -2], [-1, -1], [1, -1], [-2, 0], [0, 0], [2, 0], [-1, 1], [0, 2]],
    dtype=np.float32,
)
PATTERN_NUM = 8
# Padding needed so the whole pattern stays in-bounds.
PATTERN_PAD = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Calib:
    """Pinhole intrinsics at pyramid level 0. fx, fy, cx, cy are scalars."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def create(fx, fy, cx, cy) -> "Calib":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return Calib(f32(fx), f32(fy), f32(cx), f32(cy))

    def at_level(self, level: int) -> "Calib":
        """Intrinsics at pyramid level `level` (2x downsampling per level).

        Follows the half-pixel-centre convention: a pixel at (x, y) on level
        l corresponds to (2x + 0.5, 2y + 0.5) on level l-1.
        """
        s = 0.5**level
        return Calib(
            self.fx * s,
            self.fy * s,
            (self.cx + 0.5) * s - 0.5,
            (self.cy + 0.5) * s - 0.5,
        )

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def as_vec(self) -> jnp.ndarray:
        return jnp.stack([self.fx, self.fy, self.cx, self.cy])

    @staticmethod
    def from_vec(v: jnp.ndarray) -> "Calib":
        return Calib(v[0], v[1], v[2], v[3])


def level_shapes(h: int, w: int, levels: int = PYR_LEVELS) -> Tuple[Tuple[int, int], ...]:
    """Image (h, w) per pyramid level; dimensions must divide 2**(levels-1)."""
    shapes = []
    for l in range(levels):
        shapes.append((h >> l, w >> l))
    return tuple(shapes)


def project(calib: Calib, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (u, v)."""
    z = p_cam[..., 2]
    u = p_cam[..., 0] / z * calib.fx + calib.cx
    v = p_cam[..., 1] / z * calib.fy + calib.cy
    return jnp.stack([u, v], axis=-1)


def backproject(calib: Calib, uv: jnp.ndarray, idepth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] with inverse depth [...] -> camera-frame points [..., 3].

    Returns the point scaled so that the result times idepth is a unit-depth
    ray: p = [ (u-cx)/fx, (v-cy)/fy, 1 ] / idepth.
    """
    x = (uv[..., 0] - calib.cx) / calib.fx
    y = (uv[..., 1] - calib.cy) / calib.fy
    ones = jnp.ones_like(x)
    ray = jnp.stack([x, y, ones], axis=-1)
    return ray / idepth[..., None]
