"""Box math: encode / decode / clip / IoU.

Pure JAX reimplementation of the reference's torch box utilities
(``lib/model/rpn/bbox_transform.py``) and the Cython IoU matrix
(``lib/model/utils/bbox.pyx:15-55``). Everything is written unbatched and
``vmap``-ed by callers, keeping shapes static and letting XLA fuse the
elementwise chains into surrounding ops.

All functions use the reference's legacy "+1" box convention
(width = x2 - x1 + 1), which the published mAP numbers depend on.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example boxes → (dx, dy, dw, dh).

    Matches ``bbox_transform_batch`` (reference ``bbox_transform.py:36-75``)
    for the unbatched (N, 4) × (N, 4) case; callers vmap over the batch.
    """
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h

    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack((dx, dy, dw, dh), axis=1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on anchor/RoI boxes.

    Matches ``bbox_transform_inv`` (reference ``bbox_transform.py:77-103``).
    ``boxes`` is (N, 4); ``deltas`` is (N, 4*K) with K sets of deltas
    interleaved every 4 columns (class-specific regression heads).
    Returns (N, 4*K) decoded xyxy boxes.
    """
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    n, four_k = deltas.shape
    d = deltas.reshape(n, four_k // 4, 4)
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]

    pred_cx = dx * widths[:, None] + ctr_x[:, None]
    pred_cy = dy * heights[:, None] + ctr_y[:, None]
    pred_w = jnp.exp(dw) * widths[:, None]
    pred_h = jnp.exp(dh) * heights[:, None]

    out = jnp.stack((pred_cx - 0.5 * pred_w,
                     pred_cy - 0.5 * pred_h,
                     pred_cx + 0.5 * pred_w,
                     pred_cy + 0.5 * pred_h), axis=-1)
    return out.reshape(n, four_k)


def clip_boxes(boxes: jnp.ndarray, im_h: jnp.ndarray,
               im_w: jnp.ndarray) -> jnp.ndarray:
    """Clamp xyxy boxes (..., 4*K) into [0, W-1] × [0, H-1]
    (reference ``clip_boxes``, ``bbox_transform.py:125-133``)."""
    shape = boxes.shape
    b = boxes.reshape(shape[:-1] + (shape[-1] // 4, 4))
    x1 = jnp.clip(b[..., 0], 0.0, im_w - 1.0)
    y1 = jnp.clip(b[..., 1], 0.0, im_h - 1.0)
    x2 = jnp.clip(b[..., 2], 0.0, im_w - 1.0)
    y2 = jnp.clip(b[..., 3], 0.0, im_h - 1.0)
    return jnp.stack((x1, y1, x2, y2), axis=-1).reshape(shape)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray,
                  mask_zero_area: bool = False) -> jnp.ndarray:
    """Pairwise IoU matrix between (N, 4) and (K, 4) xyxy boxes ("+1" areas).

    With ``mask_zero_area=True``, reproduces the padding-aware semantics of
    ``bbox_overlaps_batch`` (reference ``bbox_transform.py:168-257``): rows of
    all-zero *query* boxes (padded gt slots) give overlap 0, and all-zero
    *candidate* boxes (padded RoI slots) give overlap -1 — which downstream
    samplers use to exclude padding.
    """
    bx = boxes[:, 2] - boxes[:, 0] + 1.0
    by = boxes[:, 3] - boxes[:, 1] + 1.0
    qx = query_boxes[:, 2] - query_boxes[:, 0] + 1.0
    qy = query_boxes[:, 3] - query_boxes[:, 1] + 1.0
    areas = (bx * by)[:, None]
    query_areas = (qx * qy)[None, :]

    iw = (jnp.minimum(boxes[:, 2][:, None], query_boxes[:, 2][None, :])
          - jnp.maximum(boxes[:, 0][:, None], query_boxes[:, 0][None, :]) + 1.0)
    ih = (jnp.minimum(boxes[:, 3][:, None], query_boxes[:, 3][None, :])
          - jnp.maximum(boxes[:, 1][:, None], query_boxes[:, 1][None, :]) + 1.0)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    overlaps = inter / (areas + query_areas - inter)

    if mask_zero_area:
        query_zero = ((qx == 1.0) & (qy == 1.0))[None, :]
        box_zero = ((bx == 1.0) & (by == 1.0))[:, None]
        overlaps = jnp.where(query_zero, 0.0, overlaps)
        overlaps = jnp.where(box_zero, -1.0, overlaps)
    return overlaps
