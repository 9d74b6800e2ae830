"""RoICrop: affine-grid bilinear sampler (``POOLING_MODE='crop'``).

TPU-native equivalent of the reference's STN stack — ``_affine_grid_gen``
(``lib/model/utils/net_utils.py:88-164``) + the BHWD bilinear sampler CUDA
kernel (``lib/model/roi_crop/src/roi_crop_cuda_kernel.cu``, ~330 LoC) +
grid generators (``lib/model/roi_crop/modules/gridgen.py``). No shipped
config uses it (all set ``POOLING_MODE: align`` — ``cfgs/vgg16.yml:13``),
so this exists for capability completeness: a normalized affine grid per RoI
evaluated with the shared batched bilinear gather.

Semantics (reference ``net_utils.py:102-121``): for RoI (x1,y1,x2,y2) on a
feature map of size (H, W), the affine theta maps the output grid's
normalized coords [-1, 1] to input normalized coords; sampling follows
``F.grid_sample``'s align_corners=True convention of torch 0.4
(x_in = (gx + 1) / 2 * (W - 1)).
"""

from __future__ import annotations

import jax.numpy as jnp

from tllod_tpu.ops.roi_align import _bilinear_gather


def affine_grid_points(rois: jnp.ndarray, feat_h: int, feat_w: int,
                       grid_size: int):
    """Per-RoI sample points ys/xs of shape (R, G*G) in feature-map pixel
    coords, following _affine_grid_gen + grid_sample align_corners=True."""
    x1 = rois[:, 1] / 16.0
    y1 = rois[:, 2] / 16.0
    x2 = rois[:, 3] / 16.0
    y2 = rois[:, 4] / 16.0

    w = feat_w
    h = feat_h
    # theta (reference net_utils.py:102-113)
    t11 = (x2 - x1) / (w - 1)
    t13 = (x1 + x2 - w + 1) / (w - 1)
    t22 = (y2 - y1) / (h - 1)
    t23 = (y1 + y2 - h + 1) / (h - 1)

    lin = jnp.linspace(-1.0, 1.0, grid_size)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")       # (G, G)
    gx = gx.reshape(-1)[None, :]
    gy = gy.reshape(-1)[None, :]
    # normalized input coords per roi
    nx = t11[:, None] * gx + t13[:, None]
    ny = t22[:, None] * gy + t23[:, None]
    xs = (nx + 1.0) * 0.5 * (feat_w - 1)
    ys = (ny + 1.0) * 0.5 * (feat_h - 1)
    return ys, xs


def dense_grid_sample(feats: jnp.ndarray, offsets: jnp.ndarray,
                      batch_idx: jnp.ndarray) -> jnp.ndarray:
    """Dense (per-pixel) grid sampler — the ``DenseAffineGridGen`` path of
    ``lib/model/roi_crop/modules/gridgen.py:108-140``: the network predicts
    a per-output-pixel OFFSET field that is added to the identity grid in
    normalized [-1, 1] coords, then bilinearly sampled (grid_sample
    align_corners=True, matching the affine path above).

    Note the variant zoo in ``gridgen.py`` (Cylinder/Depth/Elastic/...) is
    DEAD CODE in the reference — nothing outside the module imports it and
    every shipped cfg uses ``POOLING_MODE: align``; only the dense-affine
    semantics generalize the crop op, so only they are ported
    (COMPONENTS.md records the exclusion evidence).

    feats: (B, H, W, C) NHWC; offsets: (R, G, G, 2) normalized (dy, dx)
    offsets added to the identity grid; batch_idx: (R,) int32.
    Returns (R, G, G, C).
    """
    b, h, w, c = feats.shape
    r, gh, gw, _ = offsets.shape
    lin_y = jnp.linspace(-1.0, 1.0, gh)
    lin_x = jnp.linspace(-1.0, 1.0, gw)
    gy, gx = jnp.meshgrid(lin_y, lin_x, indexing="ij")   # (G, G)
    ny = gy[None] + offsets[..., 0]
    nx = gx[None] + offsets[..., 1]
    ys = jnp.clip((ny + 1.0) * 0.5 * (h - 1), 0.0, h - 1.0).reshape(r, -1)
    xs = jnp.clip((nx + 1.0) * 0.5 * (w - 1), 0.0, w - 1.0).reshape(r, -1)
    out = _bilinear_gather(feats, batch_idx.astype(jnp.int32), ys, xs)
    return out.reshape(r, gh, gw, c)


def roi_crop(feats: jnp.ndarray, rois: jnp.ndarray, *, grid_size: int,
             max_pool: bool = True) -> jnp.ndarray:
    """feats (B, H, W, C) NHWC; rois (R, 5). Samples a grid_size² bilinear
    crop per RoI; with ``max_pool`` (cfg.CROP_RESIZE_WITH_MAX_POOL) a 2×2
    stride-2 max pool halves it (reference ``faster_rcnn.py:76-80``)."""
    b, h, w, c = feats.shape
    batch_idx = rois[:, 0].astype(jnp.int32)
    ys, xs = affine_grid_points(rois, h, w, grid_size)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    out = _bilinear_gather(feats, batch_idx, ys, xs)
    out = out.reshape(rois.shape[0], grid_size, grid_size, c)
    if max_pool:
        g = grid_size // 2
        out = out[:, :2 * g, :2 * g, :].reshape(
            rois.shape[0], g, 2, g, 2, c).max(axis=(2, 4))
    return out
