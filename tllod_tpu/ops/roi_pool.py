"""RoIPool: max pooling over quantized RoI bins.

TPU-native equivalent of the reference CUDA kernel
(``lib/model/roi_pooling/src/roi_pooling_kernel.cu:24-87``): integer-quantized
RoI, P×P bins via floor/ceil partitioning, max over each bin, empty bins → 0.
The reference saves an argmax buffer for its hand-written backward; here JAX
autodiff through the masked max handles that.

Used by PA-ATF's multi-scale GT-RoI alignment at strides 4/8/16
(``lib/PA_ATF/faster_rcnn.py:178-180``) and by ``POOLING_MODE='pool'``.

Implementation: dynamic per-bin slicing would need dynamic shapes, so instead
each bin is a *masked reduction* over the full feature extent, done separably
(H first, then W) so XLA fuses the broadcast+select into the reduce and never
materializes the (R, P, H, W, C) product. The batch dimension is a static
Python loop with a final select — batch sizes here are 1-2 images.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -1e30


def _bin_ranges(lo, extent, p, limit):
    """Per-bin [start, end) along one axis (reference kernel :46-61):
    floor(i*bin)+lo .. ceil((i+1)*bin)+lo, clipped to [0, limit].

    Computed in exact int32 rational arithmetic (extents are small integers
    after RoI quantization), which provably equals the CUDA kernel's
    single-rounded f32 floor/ceil for extents < 2^11 — and is immune to XLA's
    divide→reciprocal-multiply rewrite, which otherwise flips ceil at exact
    bin boundaries."""
    lo_i = lo.astype(jnp.int32)
    ext_i = extent.astype(jnp.int32)
    i = jnp.arange(p, dtype=jnp.int32)
    start = (i[None, :] * ext_i[:, None]) // p + lo_i[:, None]
    end = -((-(i[None, :] + 1) * ext_i[:, None]) // p) + lo_i[:, None]
    return (jnp.clip(start, 0, limit).astype(jnp.float32),
            jnp.clip(end, 0, limit).astype(jnp.float32))


def roi_pool(feats: jnp.ndarray, rois: jnp.ndarray, *, out_size: int,
             spatial_scale: float) -> jnp.ndarray:
    """feats: (B, H, W, C) NHWC; rois: (R, 5) ``(batch_idx, x1, y1, x2, y2)``.
    Returns (R, P, P, C) max-pooled features."""
    b, h, w, c = feats.shape
    p = out_size

    batch_idx = rois[:, 0].astype(jnp.int32)
    # Quantized RoI (reference roi_pooling_kernel.cu:37-44). C round() is
    # half-away-from-zero; coords are non-negative here so floor(x + 0.5).
    x1 = jnp.floor(rois[:, 1] * spatial_scale + 0.5)
    y1 = jnp.floor(rois[:, 2] * spatial_scale + 0.5)
    x2 = jnp.floor(rois[:, 3] * spatial_scale + 0.5)
    y2 = jnp.floor(rois[:, 4] * spatial_scale + 0.5)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)

    hstart, hend = _bin_ranges(y1, roi_h, p, h)                  # (R, P)
    wstart, wend = _bin_ranges(x1, roi_w, p, w)

    ys = jnp.arange(h, dtype=feats.dtype)
    xs = jnp.arange(w, dtype=feats.dtype)
    in_h = (ys[None, None, :] >= hstart[:, :, None]) & \
           (ys[None, None, :] < hend[:, :, None])                # (R, P, H)
    in_w = (xs[None, None, :] >= wstart[:, :, None]) & \
           (xs[None, None, :] < wend[:, :, None])                # (R, P, W)

    out = None
    for bi in range(b):
        img = feats[bi]                                          # (H, W, C)
        # (R, P, W, C): reduce H under the membership mask (fused by XLA).
        tmp = jnp.max(jnp.where(in_h[:, :, :, None, None],
                                img[None, None, :, :, :], _NEG), axis=2)
        # (R, P, P, C): reduce W.
        cur = jnp.max(jnp.where(in_w[:, None, :, :, None],
                                tmp[:, :, None, :, :], _NEG), axis=3)
        sel = (batch_idx == bi)[:, None, None, None]
        out = cur if out is None else jnp.where(sel, cur, out)

    empty = (hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :]
    return jnp.where(empty[..., None], 0.0, out)
