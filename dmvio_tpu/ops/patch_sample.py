"""Pallas patch gather + in-patch bilinear sampling for BA linearization.

The BA linearize step needs, for every (target frame, point) pair, the
target intensity and image gradient at the 8 warped pattern positions
(reference PointFrameResidual::linearize, src/dso/FullSystem/Residuals.cpp:
78-274, sampling via getInterpolatedElement33 from the (I, gx, gy) image,
src/dso/util/globalFuncs.h). XLA lowers those scattered bilinear gathers to
scalar-unit loads — the single most expensive op of the whole BA on TPU
(measured ~6.4 ms per linearization at F=8, P=2048).

TPU-native re-design: the 8 warped pattern pixels of one point are within a
few pixels of the warped central pixel, so ONE 16x16 intensity patch per
(target, point) — extracted by a Pallas kernel with the image resident in
VMEM, using sublane-aligned slab loads + dynamic rotates (Mosaic forbids
unaligned dynamic vector slices) — contains every sample the pair needs.
All downstream sampling becomes dense in-patch math: separable one-hot
bilinear contractions, and gradients as central differences OF the bilinear
samples. Because the reference's gx/gy images are central differences of I
(FrameHessian::makeImages, src/dso/FullSystem/HessianBlocks.cpp:128),
bilinear(gx)(p) == 0.5*(bilinear(I)(p+ex) - bilinear(I)(p-ex)) exactly in
real arithmetic — the reconstruction is semantics-preserving.

On non-TPU backends (CPU tests, virtual multi-chip dry runs) an XLA
block-gather computes identical patches.

Status: NOT wired into the BA hot path. Measured head-to-head at the
operating point (F=8, P=2048, K=8, 512x512): XLA's native bilinear gather
(`interp.bilinear_stack`) runs in ~0.1 ms while this patch pipeline costs
~1.2 ms (0.2 ms Pallas gather + ~1 ms one-hot sampling contractions) — the
hypothesis that scattered gathers dominate BA linearization was wrong on
this TPU generation. Kept as a verified-correct alternative sampling path
(exercised by tests/test_residuals.py::test_patch_sample*) for image sizes
/ backends where gather is slow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

PATCH = 16      # patch side
MARGIN = 7      # patch anchor = floor(center) - MARGIN
_SLAB = 24      # PATCH + 8 (sublane alignment slack)
_BLK = 128      # points per Pallas grid step


def _anchors(uc, vc, h: int, w: int):
    """Top-left patch corners for central warp coords, clipped to image."""
    x0 = jnp.clip(jnp.floor(uc).astype(jnp.int32) - MARGIN, 0, w - PATCH)
    y0 = jnp.clip(jnp.floor(vc).astype(jnp.int32) - MARGIN, 0, h - PATCH)
    return x0, y0


def _kernel(y0_ref, x0_ref, img_ref, out_ref, *, h: int, w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)

    def body(k, _):
        p = g * _BLK + k
        y0 = y0_ref[p]
        x0 = x0_ref[p]
        # Sublane-aligned 24-row slab; rotate rows/lanes so the patch sits
        # at the origin, then slice statically (arbitrary dynamic vector
        # slices are rejected by Mosaic; rotates are not).
        y0a = pl.multiple_of(jnp.minimum((y0 // 8) * 8, h - _SLAB), 8)
        slab = img_ref[pl.ds(y0a, _SLAB), :]
        # Mosaic mis-lowers NEGATIVE dynamic row shifts (treated unsigned);
        # express the up-roll as the equivalent positive shift.
        slab = pltpu.roll(slab, (_SLAB - (y0 - y0a)) % _SLAB, axis=0)
        s16 = pltpu.roll(slab[:PATCH, :], (w - x0) % w, axis=1)
        out_ref[k] = s16[:, :PATCH]
        return 0

    lax.fori_loop(0, _BLK, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _gather_tpu(img, y0, x0, *, h: int, w: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = y0.shape[0]
    n_pad = -(-n // _BLK) * _BLK
    y0p = jnp.pad(y0, (0, n_pad - n))
    x0p = jnp.pad(x0, (0, n_pad - n))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLK, PATCH, PATCH), lambda i, a, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n_pad, PATCH, PATCH), jnp.float32),
        grid_spec=grid_spec,
    )(y0p, x0p, img)
    return out[:n]


def _gather_xla(img, y0, x0):
    """Identical patches via one XLA block gather (CPU tests, dry runs)."""
    starts = jnp.stack([y0, x0], -1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return lax.gather(img, starts, dn, slice_sizes=(PATCH, PATCH),
                      mode=lax.GatherScatterMode.CLIP)


def gather_patches(img: jnp.ndarray, uc: jnp.ndarray, vc: jnp.ndarray):
    """[H, W] intensity image + central warp coords [N] -> patches.

    Returns (patches [N, 16, 16], x0 [N], y0 [N]) with the patch covering
    image rows y0..y0+15 / cols x0..x0+15 and the warped centre near the
    patch middle.
    """
    h, w = img.shape
    x0, y0 = _anchors(uc, vc, h, w)
    # The kernel's aligned-slab trick asserts h - _SLAB ≡ 0 (mod 8), and
    # Mosaic's lane-dimension dynamic_rotate requires the row width to be a
    # whole number of 128-lane tiles (w=320 fails to compile). Off-size
    # images take the XLA block-gather path.
    if jax.default_backend() == "tpu" and h % 8 == 0 and w % 128 == 0:
        patches = _gather_tpu(img, y0, x0, h=h, w=w)
    else:
        patches = _gather_xla(img, y0, x0)
    return patches, x0, y0


def _axis_weights(frac_idx, off: int):
    """One-hot bilinear weights along one 16-wide patch axis.

    frac_idx: [..., 1] float in-patch coordinate; off: integer sample
    offset (for central-difference gradients). Returns [..., 16].
    """
    i0 = jnp.floor(frac_idx).astype(jnp.int32) + off
    d = frac_idx - jnp.floor(frac_idx)
    r = jnp.arange(PATCH)
    shape = frac_idx.shape + (PATCH,)
    rr = jnp.broadcast_to(r, shape)
    return (
        jnp.where(rr == i0[..., None], 1.0 - d[..., None], 0.0)
        + jnp.where(rr == i0[..., None] + 1, d[..., None], 0.0)
    )


def sample3(patches: jnp.ndarray, x0: jnp.ndarray, y0: jnp.ndarray,
            u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear (I, gx, gy) at absolute coords (u, v) [N, K] from patches.

    gx/gy match sampling the reference's central-difference gradient
    images. Returns (i, gx, gy, ok) with ok marking samples whose full
    stencil (bilinear + gradient neighbours) lies inside the patch.
    """
    pu = u - x0[:, None].astype(u.dtype)
    pv = v - y0[:, None].astype(v.dtype)
    ok = (pu >= 1.0) & (pu <= PATCH - 2.001) & \
        (pv >= 1.0) & (pv <= PATCH - 2.001)
    pu = jnp.clip(pu, 1.0, PATCH - 2.001)
    pv = jnp.clip(pv, 1.0, PATCH - 2.001)

    wy0 = _axis_weights(pv, 0)                  # [N, K, 16]
    wym = _axis_weights(pv, -1)
    wyp = _axis_weights(pv, +1)
    wx0 = _axis_weights(pu, 0)
    wxm = _axis_weights(pu, -1)
    wxp = _axis_weights(pu, +1)

    # Separable contraction: rows first, then cols — batched into TWO
    # einsums by stacking the (center / +y / -y) row passes and the five
    # (i, gx+, gx-, gy+, gy-) column reductions along the pattern axis
    # (one kernel each instead of six). f32 precision is mandatory: the
    # TPU default (bf16 operands) injects ~0.3% noise into sampled
    # intensities, which dominates the small photometric residuals BA
    # differentiates.
    es = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)
    K = pu.shape[-1]
    wy_all = jnp.concatenate([wy0, wyp, wym], axis=1)    # [N, 3K, 16]
    rows = es("nyx,nky->nkx", patches, wy_all)           # [N, 3K, 16]
    s0 = rows[:, :K]
    sp = rows[:, K:2 * K]
    sm = rows[:, 2 * K:]
    cols_s = jnp.concatenate([s0, s0, s0, sp, sm], axis=1)   # [N, 5K, 16]
    cols_w = jnp.concatenate([wx0, wxp, wxm, wx0, wx0], axis=1)
    v = es("nkx,nkx->nk", cols_s, cols_w)                # [N, 5K]
    i_t = v[:, :K]
    gx = 0.5 * (v[:, K:2 * K] - v[:, 2 * K:3 * K])
    gy = 0.5 * (v[:, 3 * K:4 * K] - v[:, 4 * K:])
    return i_t, gx, gy, ok
