"""Optimizer factory reproducing the reference SGD semantics.

Every reference train script builds per-parameter SGD groups
(``methods/DAF/DAF_train.py:311-325``): lr doubled for biases
(``TRAIN.DOUBLE_BIAS``), no weight decay on biases (``TRAIN.BIAS_DECAY``
False), momentum 0.9, and — for VGG16 — a global-norm gradient clip at 10
(``clip_gradient``, ``lib/model/utils/net_utils.py:38-49``). Frozen
parameters (``requires_grad=False`` in the reference) are excluded via an
update mask; combined with the forward-side ``stop_gradient`` boundaries this
matches "not in the optimizer" exactly (no decay drift).

torch.optim.SGD update (matched here):
    v   ← momentum * v + (g + wd * w)
    w   ← w - lr_param * v
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def is_bias(path, leaf) -> bool:
    p = _path_str(path).lower()
    return p.endswith("bias") or p.endswith("/b")


def default_trainable(path, leaf) -> bool:
    """Frozen-parameter predicate for the stock backbones: VGG conv1/conv2
    (reference ``vgg16.py:46-47``), ResNet conv1/bn1/layer1 and every
    FrozenBN buffer (``resnet.py:249-267``)."""
    p = _path_str(path).lower()
    frozen_prefixes = ("conv1_", "conv2_")
    if any(f"backbone/{fp}" in p for fp in frozen_prefixes):
        return False
    if "backbone/conv1/" in p or p.endswith("backbone/conv1"):
        return False
    if "backbone/bn1" in p or "backbone/layer1_" in p:
        return False
    # FrozenBN buffers anywhere (mean/var/scale/bias under a bn module)
    if "/bn" in p and (p.endswith("mean") or p.endswith("var")):
        return False
    if ("/bn" in p or "downsample_bn" in p) and (
            p.endswith("scale") or p.endswith("bias")):
        return False
    return True


def mask_updates(mask_fn: Callable) -> optax.GradientTransformation:
    """Zero updates where mask_fn(path, leaf) is False."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        masked = jax.tree_util.tree_map_with_path(
            lambda path, u: u if mask_fn(path, u) else jnp.zeros_like(u),
            updates)
        return masked, state

    return optax.GradientTransformation(init, update)


def make_sgd(learning_rate: Callable[[int], float] | float, *,
             momentum: float = 0.9, weight_decay: float = 5e-4,
             double_bias: bool = True, bias_decay: bool = False,
             clip_norm: Optional[float] = None,
             trainable: Callable = default_trainable
             ) -> optax.GradientTransformation:
    """Build the reference-equivalent SGD chain."""
    parts = [mask_updates(trainable)]
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        def decay_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, v: (trainable(p, v)
                              and (bias_decay or not is_bias(p, v))),
                params)
        parts.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(learning_rate))  # gives -lr*v
    if double_bias:
        def bias_mask(params):
            return jax.tree_util.tree_map_with_path(is_bias, params)
        parts.append(optax.masked(optax.scale(2.0), bias_mask))
    # Final safety: frozen params receive exactly zero update.
    parts.append(mask_updates(trainable))
    return optax.chain(*parts)


def step_decay_schedule(base_lr: float, decay_step: int,
                        gamma: float = 0.1) -> Callable[[Any], Any]:
    """lr × gamma once at ``decay_step`` (reference decays once at
    --lr_decay_step epochs, ``DAF_train.py:362-365``)."""

    def schedule(count):
        return base_lr * jnp.where(count >= decay_step, gamma, 1.0)

    return schedule
