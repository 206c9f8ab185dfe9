"""Image pyramid with gradients ("makeImages").

TPU-native equivalent of FrameHessian::makeImages
(src/dso/FullSystem/HessianBlocks.cpp:128): per frame, build a
PYR_LEVELS-deep pyramid where each level stores (intensity, gx, gy) and the
squared gradient magnitude used by the pixel selector.

Design: each level is one [3, H, W] array (channel-planar so the
interpolation gather in ops/interp.py fetches all three channels in one
fused gather). Downsampling is 2x2 averaging, gradients are central
differences — both pure elementwise/reduce ops that XLA fuses into a single
pass over HBM.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from dmvio_tpu.utils.camera import PYR_LEVELS


def _gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients; one-sided at borders."""
    gx = 0.5 * (jnp.roll(img, -1, axis=-1) - jnp.roll(img, 1, axis=-1))
    gy = 0.5 * (jnp.roll(img, -1, axis=-2) - jnp.roll(img, 1, axis=-2))
    # Zero the wrapped-around border columns/rows (callers never sample the
    # outermost pixels, but keep them finite and harmless).
    gx = gx.at[..., :, 0].set(0.0).at[..., :, -1].set(0.0)
    gy = gy.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    return gx, gy


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling."""
    h, w = img.shape[-2], img.shape[-1]
    return img.reshape(img.shape[:-2] + (h // 2, 2, w // 2, 2)).mean(axis=(-3, -1))


def build_pyramid(img: jnp.ndarray, levels: int = PYR_LEVELS) -> List[jnp.ndarray]:
    """Build the per-frame pyramid.

    Args:
      img: [H, W] float32 irradiance image (photometrically corrected).
      levels: number of pyramid levels.

    Returns:
      List of `levels` arrays, level l shaped [3, H>>l, W>>l] with channels
      (intensity, gx, gy).
    """
    out = []
    cur = img
    for _ in range(levels):
        gx, gy = _gradients(cur)
        out.append(jnp.stack([cur, gx, gy]))
        cur = _downsample2(cur)
    return out


def abs_squared_grad(level: jnp.ndarray) -> jnp.ndarray:
    """Squared gradient magnitude map for one pyramid level [3, H, W]."""
    return level[1] ** 2 + level[2] ** 2


build_pyramid_jit = jax.jit(build_pyramid, static_argnames="levels")
