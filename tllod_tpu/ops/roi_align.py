"""RoIAlign with the reference's exact (nonstandard) sampling semantics.

The reference CUDA kernel (``lib/model/roi_align/src/roi_align_kernel.cu:
15-70``) differs from torchvision/Detectron RoIAlign:

  * ONE bilinear sample per output bin (not 4 averaged sample points);
  * bin size = roi_extent / (P - 1) with the "+1" extent convention, so the
    P sample points span the RoI inclusively (fence-post grid);
  * sample points outside [0, H) × [0, W) produce exactly 0;
  * the bilinear neighborhood is anchored at ``min(floor(h), H-2)`` — points
    in the last row/column extrapolate with weights outside [0, 1].

``RoIAlignAvg`` (reference ``lib/model/roi_align/modules/roi_align.py:18-29``)
samples a (P+1) × (P+1) grid and then average-pools 2×2 / stride 1 down to
P × P. The published mAPs depend on these details, so they are reproduced
bit-for-bit here — but as a gather + elementwise XLA program in NHWC layout
(TPU-native: the channel dim rides the 128-lane axis, the 4-point gather is a
single take along the flattened batch*spatial axis, and JAX autodiff derives
the scatter-add backward that the reference hand-writes with ``atomicAdd``
(``roi_align_kernel.cu:94-143``)).
"""

from __future__ import annotations

import jax.numpy as jnp


def _grid_coords(rois: jnp.ndarray, p: int, spatial_scale: float):
    """Sample-point grid for each RoI: (R, P*P) fractional ys and xs.

    Implements the fence-post grid of the reference kernel
    (``roi_align_kernel.cu:33-46``): bin = max(extent+1, 0) / (P-1), point k
    at ``start + k * bin``.
    """
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1 + 1.0, 0.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 0.0)
    bin_w = roi_w / (p - 1.0)
    bin_h = roi_h / (p - 1.0)

    grid = jnp.arange(p, dtype=rois.dtype)
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]            # (R, P)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]            # (R, P)
    r = rois.shape[0]
    yy = jnp.broadcast_to(ys[:, :, None], (r, p, p)).reshape(r, p * p)
    xx = jnp.broadcast_to(xs[:, None, :], (r, p, p)).reshape(r, p * p)
    return yy, xx


def _bilinear_gather(feats: jnp.ndarray, batch_idx: jnp.ndarray,
                     ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (B, H, W, C) feature maps at per-RoI points.

    batch_idx: (R,) image index per RoI; ys/xs: (R, G). Returns (R, G, C).
    One flattened gather per corner — no per-image replication.
    """
    b, h, w, c = feats.shape
    inside = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)

    y0 = jnp.minimum(jnp.floor(ys), h - 2.0)
    x0 = jnp.minimum(jnp.floor(xs), w - 2.0)
    hr = (ys - y0)[..., None]
    wr = (xs - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)

    flat = feats.reshape(b * h * w, c)
    base = batch_idx[:, None] * (h * w) + y0i * w + x0i          # (R, G)
    ul = jnp.take(flat, base, axis=0)
    ur = jnp.take(flat, base + 1, axis=0)
    dl = jnp.take(flat, base + w, axis=0)
    dr = jnp.take(flat, base + w + 1, axis=0)

    val = (ul * (1.0 - hr) * (1.0 - wr) + ur * (1.0 - hr) * wr
           + dl * hr * (1.0 - wr) + dr * hr * wr)
    return jnp.where(inside[..., None], val, 0.0)


def roi_align(feats: jnp.ndarray, rois: jnp.ndarray, *, out_size: int,
              spatial_scale: float) -> jnp.ndarray:
    """Plain RoIAlign (reference kernel semantics, one sample per bin).

    feats: (B, H, W, C) NHWC; rois: (R, 5) rows ``(batch_idx, x1, y1, x2, y2)``
    in input-image coordinates. Returns (R, P, P, C).
    """
    p = out_size
    batch_idx = rois[:, 0].astype(jnp.int32)
    ys, xs = _grid_coords(rois[:, 1:5], p, spatial_scale)
    out = _bilinear_gather(feats, batch_idx, ys, xs)
    return out.reshape(rois.shape[0], p, p, feats.shape[-1])


def roi_align_avg(feats: jnp.ndarray, rois: jnp.ndarray, *, out_size: int,
                  spatial_scale: float) -> jnp.ndarray:
    """RoIAlignAvg: align at (P+1)×(P+1), then 2×2 stride-1 average pool down
    to P×P (reference ``lib/model/roi_align/modules/roi_align.py:18-29``).

    Same argument format as :func:`roi_align`. Returns (R, P, P, C).
    """
    a = roi_align(feats, rois, out_size=out_size + 1,
                  spatial_scale=spatial_scale)
    return (a[:, :-1, :-1, :] + a[:, :-1, 1:, :]
            + a[:, 1:, :-1, :] + a[:, 1:, 1:, :]) * 0.25
