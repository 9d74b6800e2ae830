"""Detection losses.

Mask-based, static-shape equivalents of the reference loss helpers:
``_smooth_l1_loss`` with inside/outside weights
(``lib/model/utils/net_utils.py:72-86``) and the ``nonzero``-gathered
cross-entropies used by the RPN and RCNN heads (``lib/model/rpn/rpn.py:90-97``,
``lib/model/faster_rcnn/faster_rcnn.py:106``). Dynamic index-selects become
weighted means over masks — identical values, fixed shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(pred: jnp.ndarray, targets: jnp.ndarray,
                   inside_weights: jnp.ndarray, outside_weights: jnp.ndarray,
                   *, sigma: float = 1.0, reduce_dims=(1,)) -> jnp.ndarray:
    """Smooth-L1 with inside/outside weights (reference ``net_utils.py:72-86``).

    loss = outside * SmoothL1(inside * (pred - target)); summed over
    ``reduce_dims`` then meaned over the remaining dims — exactly the
    reference's ``sum(dim)`` + ``.mean()``.
    """
    sigma2 = sigma ** 2
    diff = inside_weights * (pred - targets)
    abs_diff = jnp.abs(diff)
    flag = (abs_diff < 1.0 / sigma2).astype(pred.dtype)
    per_elem = (flag * 0.5 * sigma2 * diff * diff
                + (1.0 - flag) * (abs_diff - 0.5 / sigma2))
    out = outside_weights * per_elem
    for d in sorted(reduce_dims, reverse=True):
        out = out.sum(axis=d)
    return out.mean()


def _logsumexp(x: jnp.ndarray) -> jnp.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return jnp.log(jnp.exp(x - m).sum(axis=-1)) + m[..., 0]


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean softmax cross-entropy over (N, C) logits and (N,) int labels,
    optionally masked by (N,) ``weights`` (mean over the weighted entries —
    the static-shape form of the reference's ``index_select`` + CE on the
    kept RPN anchors, ``rpn.py:93-97``). Always computed in f32."""
    logits = logits.astype(jnp.float32)
    nll = _logsumexp(logits) - jnp.take_along_axis(
        logits, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if weights is None:
        return nll.mean()
    wsum = jnp.maximum(weights.sum(), 1.0)
    return (nll * weights).sum() / wsum


def binary_cross_entropy(probs: jnp.ndarray, labels: jnp.ndarray,
                         weights: jnp.ndarray | None = None,
                         eps: float = 1e-7) -> jnp.ndarray:
    """Mean BCE on probabilities (reference uses ``nn.BCELoss`` on sigmoid
    outputs for the instance-level domain classifiers, ``lib/DAF/
    faster_rcnn.py:188-189``)."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    loss = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    if weights is None:
        return loss.mean()
    wsum = jnp.maximum(weights.sum(), 1.0)
    return (loss * weights).sum() / wsum
