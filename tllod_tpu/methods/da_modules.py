"""Shared domain-adaptation building blocks.

The image-level and instance-level domain classifiers used (with variations)
by every UDAOD method. The reference's ``LabelResizeLayer``s — a per-step
device→host→cv2 round trip to broadcast a scalar domain label to feature-map
shape (``lib/DAF/LabelResizeLayer.py:18-59``) — disappear entirely: the label
is a compile-time-shaped broadcast inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.ops.grl import grad_reverse
from tllod_tpu.ops.losses import binary_cross_entropy


class ImageDA(nn.Module):
    """Pixel-wise 2-class domain head: GRL → 1×1 conv (512) → ReLU → 1×1 conv
    (2), both bias-free (reference ``lib/DAF/DA.py:36-50``)."""

    alpha: float = 0.1
    hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = grad_reverse(feat, self.alpha)
        x = nn.Conv(self.hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return x  # (B, H, W, 2) logits


def image_da_loss(logits: jnp.ndarray, domain: jnp.ndarray) -> jnp.ndarray:
    """Mean 2-class NLL against the broadcast domain label (reference
    ``lib/DAF/faster_rcnn.py:181-185``). logits: (B, H, W, 2); domain: (B,)
    in {0, 1}."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    is_src = (domain > 0)[:, None, None]
    picked = jnp.where(is_src, logp[..., 1], logp[..., 0])
    return -picked.mean()


class InstanceDA(nn.Module):
    """Per-RoI domain head: GRL → fc(in→1024) → ReLU → Drop(.5) → fc(1024)
    → ReLU → Drop(.5) → fc(1) → sigmoid (reference ``lib/DAF/DA.py:53-73``)."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, *, deterministic: bool = True):
        x = grad_reverse(feat, self.alpha)
        x = nn.Dense(1024, dtype=self.dtype, name="dc_ip1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.Dense(1024, dtype=self.dtype, name="dc_ip2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.Dense(1, dtype=self.dtype, name="classifier")(x)
        return jax.nn.sigmoid(x)  # (R, 1) probs


def instance_da_loss(probs: jnp.ndarray, domain: jnp.ndarray,
                     rois_per_image: int) -> jnp.ndarray:
    """Mean BCE against the per-RoI domain label (reference ``lib/DAF/
    faster_rcnn.py:187-189`` + InstanceLabelResizeLayer). probs: (B*R, 1)."""
    labels = jnp.repeat(domain.astype(jnp.float32), rois_per_image)[:, None]
    return binary_cross_entropy(probs, labels)


def blocked_instance_labels(domain: jnp.ndarray, total_rows: int,
                            block: int = 256) -> jnp.ndarray:
    """The reference ``InstanceLabelResizeLayer``'s EXACT label layout
    (``lib/ATF/LabelResizeLayer.py:43-60``): a zeros(R_total) vector where
    image i's label fills rows ``[i·256, (i+1)·256)`` — the 256 is
    hard-coded upstream regardless of the true RoI count. For DAF-style
    heads R == 256 and this equals a plain repeat; for ATF, which feeds the
    FULL 2000-proposal set, only the first 256 source rows carry label 1
    and the remaining 1744 are labeled 0. Faithfully reproduced (it shapes
    the published ATF mAP); returns (R_total, 1) float labels."""
    rows = jnp.arange(total_rows, dtype=jnp.int32) // block
    d = domain.astype(jnp.float32).reshape(-1)
    in_range = rows < d.shape[0]
    picked = jnp.take(d, jnp.clip(rows, 0, d.shape[0] - 1))
    return jnp.where(in_range, picked, 0.0)[:, None]



def features_pair(det, src_im, tgt_im, *, return_taps: bool = False,
                  fuse: bool = True):
    """Backbone features for a (source, target) image pair.

    When ``fuse`` and the bucket shapes match, runs ONE batched conv pass
    over ``[src; tgt]`` and splits — exactly equivalent to two passes (every
    backbone op — conv/relu/pool/frozen-BN — is per-image; only XLA's batch
    tiling differs, measured ~4% faster on a v5e at 600×1200), parity-pinned
    by ``tests/test_methods_structure.py::test_daf_fused_pair_parity``.
    Distinct buckets fall back to two passes at trace time.
    """
    if fuse and src_im.shape == tgt_im.shape:
        b = src_im.shape[0]
        both = det.features(jnp.concatenate([src_im, tgt_im], axis=0),
                            return_taps=return_taps)
        return (jax.tree_util.tree_map(lambda x: x[:b], both),
                jax.tree_util.tree_map(lambda x: x[b:], both))
    return (det.features(src_im, return_taps=return_taps),
            det.features(tgt_im, return_taps=return_taps))
