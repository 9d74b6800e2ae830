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
             trainable: Callable = default_trainable,
             momentum_dtype: Optional[Any] = None
             ) -> optax.GradientTransformation:
    """Build the reference-equivalent SGD chain.

    ``momentum_dtype=jnp.bfloat16`` stores the momentum accumulator in
    bf16 (the ``--bf16_momentum`` train flag): halves the optimizer's
    largest HBM stream (142M-param velocity read+write per step). The
    accumulation ``m ← 0.9·m + g`` is computed in the update's working
    precision and only STORED rounded, so the trajectory tracks f32
    momentum to ~1e-2 relative per step (regression:
    ``tests/test_optim.py``); off by default — the reference semantics
    (torch f32) remain the default everywhere.
    """
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
        parts.append(optax.trace(decay=momentum, nesterov=False,
                                 accumulator_dtype=momentum_dtype))
    parts.append(optax.scale_by_learning_rate(learning_rate))  # gives -lr*v
    if double_bias:
        def bias_mask(params):
            return jax.tree_util.tree_map_with_path(is_bias, params)
        parts.append(optax.masked(optax.scale(2.0), bias_mask))
    # Final safety: frozen params receive exactly zero update.
    parts.append(mask_updates(trainable))
    return optax.chain(*parts)


def make_adam(learning_rate: Callable[[int], float] | float, *,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              weight_decay: float = 5e-4,
              double_bias: bool = True, bias_decay: bool = False,
              clip_norm: Optional[float] = None,
              trainable: Callable = default_trainable
              ) -> optax.GradientTransformation:
    """Reference ``--o adam`` branch (``methods/DAF/DAF_train.py:320-322``):
    ``torch.optim.Adam(params)`` over the same per-parameter groups as SGD —
    per-group lr (bias ×2 under DOUBLE_BIAS), L2 weight decay folded into the
    gradient *before* the moment estimates (torch-Adam semantics, so
    ``add_decayed_weights`` precedes ``scale_by_adam`` here), decay skipped
    on biases unless BIAS_DECAY."""
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
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    if double_bias:
        def bias_mask(params):
            return jax.tree_util.tree_map_with_path(is_bias, params)
        parts.append(optax.masked(optax.scale(2.0), bias_mask))
    parts.append(mask_updates(trainable))
    return optax.chain(*parts)


def step_decay_schedule(base_lr: float, decay_step: int,
                        gamma: float = 0.1) -> Callable[[Any], Any]:
    """lr × gamma once at ``decay_step`` (single-decay form; see
    ``epoch_decay_schedule`` for the reference's repeating cadence)."""

    def schedule(count):
        return base_lr * jnp.where(count >= decay_step, gamma, 1.0)

    return schedule


def epoch_decay_schedule(base_lr: float, steps_per_epoch: int,
                         lr_decay_step: int, gamma: float = 0.1
                         ) -> Callable[[Any], Any]:
    """The reference's repeating decay cadence: at the top of every epoch
    with ``epoch % (lr_decay_step + 1) == 0`` the lr is multiplied by gamma
    (``methods/DAF/DAF_train.py:362-365``, epochs numbered from 1) — i.e.
    first decay entering epoch ``lr_decay_step + 1``, again at
    ``2·(lr_decay_step+1)``, and so on. Driven by the optimizer step count
    so resume reconstructs the position exactly."""
    period = max(int(lr_decay_step) + 1, 1)
    spe = max(int(steps_per_epoch), 1)

    def schedule(count):
        epoch = count // spe + 1          # 0-based step → 1-based epoch
        n_decays = epoch // period
        return base_lr * gamma ** n_decays

    return schedule


def build_optimizer(args, cfg, steps_per_epoch: int,
                    trainable: Callable = default_trainable):
    """One factory for every train CLI: honors ``--o sgd|adam`` (reference
    ``DAF_train.py:320-325``), the repeating LR-decay cadence, and the
    vgg16-only gradient clip. Returns ``(schedule, tx)``."""
    schedule = epoch_decay_schedule(args.lr, steps_per_epoch,
                                    args.lr_decay_step, args.lr_decay_gamma)
    clip = 10.0 if args.net == "vgg16" else None
    opt = getattr(args, "optimizer", "sgd")
    common = dict(weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                  double_bias=cfg.TRAIN.DOUBLE_BIAS,
                  bias_decay=cfg.TRAIN.BIAS_DECAY,
                  clip_norm=clip, trainable=trainable)
    if opt == "adam":
        tx = make_adam(schedule, **common)
    elif opt == "sgd":
        import jax.numpy as _jnp
        mdt = (_jnp.bfloat16
               if getattr(args, "bf16_momentum", False) else None)
        tx = make_sgd(schedule, momentum=cfg.TRAIN.MOMENTUM,
                      momentum_dtype=mdt, **common)
    else:
        raise ValueError(f"unknown optimizer {opt!r} (expected sgd|adam)")
    return schedule, tx
