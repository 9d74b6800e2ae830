"""Train-step and eval-step factories: everything jitted, batch sharded over
the mesh, params replicated.

The reference hot loop (``methods/DAF/DAF_train.py:353-446``) does per step:
host dataloader → H2D copies into preallocated holders → forward (with CUDA
NMS sync + LabelResizeLayer CPU round trip) → backward → clip → SGD. Here one
``jax.jit`` program does forward+backward+update on device; the host only
feeds the next (prefetched) batch. Donating the train state keeps parameter
memory stable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tllod_tpu.config import Config
from tllod_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from tllod_tpu.ops.nms import nms_fixed


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, tx: optax.GradientTransformation
                       ) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _step_body(apply_fn: Callable, loss_fn: Callable,
               tx: optax.GradientTransformation,
               state: TrainState, rng: jax.Array, batch_args):
    """One SGD step: forward + backward + update (traced, not jitted)."""
    rng = jax.random.fold_in(rng, state.step)
    sampling, dropout = jax.random.split(rng)

    def compute(params):
        out = apply_fn(params,
                       {"sampling": sampling, "dropout": dropout},
                       *batch_args)
        loss = loss_fn(out)
        metrics = {k: v for k, v in out.items()
                   if k.endswith("loss") or k.endswith("loss_cls")
                   or k.endswith("loss_box") or k.startswith("dist")}
        metrics["loss"] = loss
        # fg count like the reference's display (DAF_train.py:425-428)
        if out.get("rois_label") is not None:
            metrics["fg_cnt"] = (out["rois_label"] > 0).sum()
        return loss, metrics

    (_, metrics), grads = jax.value_and_grad(
        compute, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    tx: optax.GradientTransformation,
                    *, donate: bool = True) -> Callable:
    """Build a jitted train step.

    apply_fn(params, rngs, *batch_args) → output dict;
    loss_fn(out) → scalar loss. Returns step(state, rng, *batch_args) →
    (state, metrics).
    """

    def step(state: TrainState, rng: jax.Array, *batch_args):
        return _step_body(apply_fn, loss_fn, tx, state, rng, batch_args)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step_multi(apply_fn: Callable, loss_fn: Callable,
                          tx: optax.GradientTransformation,
                          *, donate: bool = True,
                          n_invariant: int = 0) -> Callable:
    """Build a fused K-step train program: ``lax.scan`` over K stacked
    batches inside ONE jitted dispatch.

    The reference dispatches one CUDA graph per step from Python
    (``methods/DAF/DAF_train.py:367-408``); on this TPU the per-dispatch
    host+tunnel cost is ~10 ms — comparable to the device step itself — so
    a Python-loop trainer is host-bound and hides on-device wins (this is
    why bf16 looked like a 9-17% gain in round 2). Scanning K steps on
    device amortizes the dispatch to ~1/K and lets the device run
    back-to-back.

    Returns ``multi_step(state, rng, *stacked_batch_args) →
    (state, metrics)`` where every batch arg carries a leading K axis and
    each returned metric is stacked over K (metrics[k][i] = step i's value,
    so displays/logging can show every step, matching the per-step loop).
    The per-step RNG folds in the global ``state.step`` exactly like
    :func:`make_train_step` — a K-fused run reproduces the per-step
    trajectory (same fold_in sequence; numerics equal up to XLA
    reassociation between the two compiled programs, ~1e-9 —
    ``tests/test_fused_steps.py``).
    """

    def multi_step(state: TrainState, rng: jax.Array, *args):
        # the last n_invariant args are scan-INVARIANT (e.g. PT-MAF's frozen
        # teacher params): passed once per dispatch, closed over by the scan
        # body rather than stacked K times
        if n_invariant:
            stacked, inv = args[:-n_invariant], args[-n_invariant:]
        else:
            stacked, inv = args, ()

        def body(state, batch_args):
            return _step_body(apply_fn, loss_fn, tx, state, rng,
                              tuple(batch_args) + tuple(inv))

        return jax.lax.scan(body, state, stacked)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Inference post-processing (reference methods/DAF/DAF_test.py:264-332)
# ---------------------------------------------------------------------------


def _postprocess_single(rois, cls_prob, bbox_pred, im_info, *,
                        num_classes: int, stds, means,
                        nms_thresh: float, max_dets: int,
                        class_agnostic: bool):
    """Unbatched core of :func:`postprocess_detections`: rois (N, 5),
    cls_prob (N, C), bbox_pred (N, 4C or 4), im_info (3,). vmap-safe —
    the sharded eval path maps it over a device-sharded image batch."""
    n = rois.shape[0]
    scores = cls_prob                          # (N, C)
    boxes = rois[:, 1:5]                       # (N, 4)

    deltas = bbox_pred
    if class_agnostic:
        deltas = deltas * stds[None, :] + means[None, :]
        deltas = jnp.tile(deltas, (1, num_classes))
    else:
        deltas = (deltas.reshape(n, num_classes, 4) * stds[None, None, :]
                  + means[None, None, :]).reshape(n, num_classes * 4)
    pred = bbox_transform_inv(boxes, deltas)             # (N, 4C)
    pred = clip_boxes(pred, im_info[0], im_info[1])
    pred = pred / im_info[2]                             # back to raw coords
    pred = pred.reshape(n, num_classes, 4)

    def per_class(c_boxes, c_scores):
        idx, num = nms_fixed(c_boxes, c_scores, iou_threshold=nms_thresh,
                             max_output=max_dets)
        valid = jnp.arange(max_dets) < num
        return (jnp.take(c_boxes, idx, axis=0),
                jnp.take(c_scores, idx), valid)

    out_boxes, out_scores, out_valid = jax.vmap(per_class, in_axes=(1, 1))(
        pred, scores)
    return out_boxes, out_scores, out_valid


@functools.partial(jax.jit, static_argnames=("num_classes", "max_dets",
                                             "nms_thresh", "class_agnostic"))
def postprocess_detections(rois, cls_prob, bbox_pred, im_info, *,
                           num_classes: int, stds, means,
                           nms_thresh: float = 0.3, max_dets: int = 100,
                           class_agnostic: bool = False):
    """Decode + per-class NMS for one image, fixed shapes.

    rois (1, N, 5); cls_prob (1, N, C); bbox_pred (1, N, 4C or 4).
    Returns (boxes (C, max_dets, 4) in ORIGINAL image coords, scores
    (C, max_dets), valid (C, max_dets)) with class 0 (background) rows unused.

    Matches the reference eval loop: un-normalize deltas with
    BBOX_NORMALIZE_STDS/MEANS (``DAF_test.py:272-283``), decode, clip to the
    network input, divide by im_scale, then per-class NMS at TEST.NMS=0.3.
    Score thresholding (reference ``thresh=0.0``) and the cross-class
    max_per_image cap happen on host in the eval driver.
    """
    return _postprocess_single(
        rois[0], cls_prob[0], bbox_pred[0], im_info[0],
        num_classes=num_classes, stds=stds, means=means,
        nms_thresh=nms_thresh, max_dets=max_dets,
        class_agnostic=class_agnostic)


def postprocess_detections_batch(rois, cls_prob, bbox_pred, im_info, *,
                                 num_classes: int, stds, means,
                                 nms_thresh: float = 0.3,
                                 max_dets: int = 100,
                                 class_agnostic: bool = False):
    """Batched :func:`postprocess_detections`: leading dim B on every input,
    outputs (B, C, max_dets, …). Used by the sharded eval path, where B is
    the device count and the batch dim is sharded over the mesh."""
    return jax.vmap(functools.partial(
        _postprocess_single, num_classes=num_classes, stds=stds, means=means,
        nms_thresh=nms_thresh, max_dets=max_dets,
        class_agnostic=class_agnostic))(rois, cls_prob, bbox_pred, im_info)


def collect_detections(out_boxes, out_scores, out_valid, *,
                       num_classes: int, max_per_image: int = 100,
                       score_thresh: float = 0.0):
    """Host-side assembly of the per-image ``all_boxes`` row (reference
    ``DAF_test.py:300-332``): threshold, per-class arrays, global top-100 cap.
    """
    out_boxes = np.asarray(out_boxes)
    out_scores = np.asarray(out_scores)
    out_valid = np.asarray(out_valid)
    per_class = []
    for c in range(num_classes):
        keep = out_valid[c] & (out_scores[c] > score_thresh)
        dets = np.concatenate([out_boxes[c][keep],
                               out_scores[c][keep, None]], axis=1)
        per_class.append(dets.astype(np.float32))
    all_scores = np.concatenate([d[:, 4] for d in per_class[1:]]) \
        if num_classes > 1 else np.zeros(0)
    if all_scores.size > max_per_image:
        thresh = np.sort(all_scores)[-max_per_image]
        per_class = [d[d[:, 4] >= thresh] if c > 0 else d
                     for c, d in enumerate(per_class)]
    return per_class
