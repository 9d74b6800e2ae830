"""Region Proposal Network: head, proposal layer, target assignment.

Static-shape JAX rebuild of the reference RPN stack:

  * :class:`RPNHead` — 3×3 conv + 1×1 objectness/box convs
    (``lib/model/rpn/rpn.py:17-72``), NHWC.
  * :func:`proposal_layer` — decode → clip → top-K → NMS → fixed (B, postN, 5)
    zero-padded RoIs (``lib/model/rpn/proposal_layer.py:49-161``). The
    reference's per-image python loop + CUDA NMS round trip becomes a vmapped
    on-device :func:`~tllod_tpu.ops.nms.nms_fixed`.
  * :func:`anchor_target` — IoU assignment + random fg/bg subsampling to
    RPN_BATCHSIZE (``lib/model/rpn/anchor_target_layer.py:48-193``). The
    data-dependent ``nonzero``/permutation host loops become masked rank
    selection with ``jax.random`` keys: identical marginal distribution,
    fully on device.
  * :func:`proposal_target` — RoI sampling for the detection head
    (``lib/model/rpn/proposal_target_layer_cascade.py:116-212``), same
    three-case fg/bg logic (both / fg-only / bg-only) expressed as masked
    selects instead of python branches.

All "random permutation → take first k" reference idioms are realized as
"i.i.d. uniform priority → top-k by rank", which samples the same
distribution (a uniform random k-subset).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.ops.boxes import (bbox_overlaps, bbox_transform,
                                 bbox_transform_inv, clip_boxes)
from tllod_tpu.ops.nms import nms_fixed

_NEG_INF = jnp.float32(jnp.finfo(jnp.float32).min)


class RPNHead(nn.Module):
    """3×3 conv (512) + ReLU, then 1×1 convs for 2A scores and 4A deltas
    (reference ``rpn.py:28-36``). Weights init normal(0, 0.01) like
    ``normal_init`` (``faster_rcnn.py:129-131``)."""

    num_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, base_feat):
        init = nn.initializers.normal(0.01)
        x = nn.Conv(512, (3, 3), padding=1, kernel_init=init,
                    dtype=self.dtype, name="conv")(base_feat)
        x = nn.relu(x)
        cls_score = nn.Conv(2 * self.num_anchors, (1, 1), kernel_init=init,
                            dtype=self.dtype, name="cls_score")(x)
        bbox_pred = nn.Conv(4 * self.num_anchors, (1, 1), kernel_init=init,
                            dtype=self.dtype, name="bbox_pred")(x)
        return cls_score, bbox_pred


def rpn_probs(cls_score: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise (bg, fg) softmax over the 2A channel layout
    (reference ``rpn.py:47-69`` reshape-softmax-reshape trick).

    Returns (fg_prob (B, H, W, A), logits (B, H, W, A, 2))."""
    a = cls_score.shape[-1] // 2
    logits = jnp.stack((cls_score[..., :a], cls_score[..., a:]), axis=-1)
    fg = jax.nn.softmax(logits, axis=-1)[..., 1]
    return fg, logits


class Proposals(NamedTuple):
    rois: jnp.ndarray    # (B, postN, 5) rows (batch_idx, x1, y1, x2, y2)
    valid: jnp.ndarray   # (B, postN) bool — padding mask


def proposal_layer(fg_prob: jnp.ndarray, bbox_deltas: jnp.ndarray,
                   im_info: jnp.ndarray, anchors: jnp.ndarray, *,
                   pre_nms_top_n: int, post_nms_top_n: int,
                   nms_thresh: float,
                   sample_rng: "jax.Array | None" = None,
                   nms_block_size: int = 1024) -> Proposals:
    """Anchors + deltas → clipped, NMS-ed, fixed-count RoIs.

    fg_prob: (B, H, W, A); bbox_deltas: (B, H, W, 4A); im_info: (B, 3) rows
    (height, width, scale); anchors: (K*A, 4) matching the (h, w, a) flatten
    order. Output rois are zero-padded past ``valid`` with batch index kept
    (reference pads the same way, ``proposal_layer.py:156-159``).

    ``nms_block_size`` only trades serial sweep depth for per-block VPU
    work — selections are exact at any value (tests/test_nms.py); 1024
    measured fastest on a v5e for the 12000→2000 train shape (1.63 ms vs
    1.77 ms at 512).
    """
    b = fg_prob.shape[0]
    ka = anchors.shape[0]
    scores = fg_prob.reshape(b, ka)
    deltas = bbox_deltas.reshape(b, ka, 4)

    proposals = jax.vmap(lambda d: bbox_transform_inv(anchors, d))(deltas)
    proposals = jax.vmap(
        lambda p, info: clip_boxes(p, info[0], info[1]))(proposals, im_info)

    k = min(pre_nms_top_n, ka) if pre_nms_top_n > 0 else ka
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(proposals, order[..., None], axis=1)

    def per_image(boxes, sc, key):
        # scores come straight from lax.top_k → already descending
        idx, num = nms_fixed(boxes, sc, iou_threshold=nms_thresh,
                             max_output=post_nms_top_n, presorted=True,
                             block_size=nms_block_size)
        if sample_rng is not None:
            # PA-ATF's modified selection (lib/PA_ATF/proposal_layer1.py:
            # 153-161): keep the top 25% of NMS survivors by rank, fill the
            # remaining 75% with a random (without-replacement) subset of
            # the rest of the keep list.
            q = int(post_nms_top_n * 0.25)
            slot = jnp.arange(post_nms_top_n)
            avail = (slot >= q) & (slot < num)
            pr = jnp.where(avail, jax.random.uniform(key,
                                                     (post_nms_top_n,)),
                           -jnp.inf)
            perm = jnp.argsort(-pr)[:post_nms_top_n - q]
            idx = jnp.concatenate([idx[:q], jnp.take(idx, perm)])
            n_head = jnp.minimum(num, q)
            n_tail = jnp.maximum(num - q, 0)
            valid = jnp.where(slot < q, slot < n_head, slot - q < n_tail)
            num = n_head + jnp.minimum(n_tail, post_nms_top_n - q)
        else:
            valid = jnp.arange(post_nms_top_n) < num
        sel = jnp.take(boxes, idx, axis=0)
        return jnp.where(valid[:, None], sel, 0.0), valid

    keys = (jax.random.split(sample_rng, b) if sample_rng is not None
            else jnp.zeros((b, 2), jnp.uint32))
    boxes, valid = jax.vmap(per_image)(top_boxes, top_scores, keys)
    batch_col = jnp.broadcast_to(
        jnp.arange(b, dtype=boxes.dtype)[:, None, None],
        (b, post_nms_top_n, 1))
    rois = jnp.concatenate([batch_col, boxes], axis=-1)
    # Proposals are training CONSTANTS (the reference feeds `.data` tensors
    # through the proposal layer, rpn.py:77): no gradient may flow from the
    # box head back into the RPN deltas through the decoded coordinates.
    # This also prunes an expensive NMS/top-k backward from the train graph.
    return Proposals(jax.lax.stop_gradient(rois), valid)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray        # (B, K*A) in {-1 ignore, 0 bg, 1 fg}
    bbox_targets: jnp.ndarray  # (B, K*A, 4)
    in_weights: jnp.ndarray    # (B, K*A)
    out_weights: jnp.ndarray   # (B, K*A)


def anchor_target(gt_boxes: jnp.ndarray, im_info: jnp.ndarray,
                  anchors: jnp.ndarray, cfg: Config,
                  rng: jax.Array) -> AnchorTargets:
    """Assign anchors to gt and subsample (reference
    ``anchor_target_layer.py:48-193``); gt_boxes (B, G, 5) zero-padded."""
    t = cfg.TRAIN
    num_fg = int(t.RPN_FG_FRACTION * t.RPN_BATCHSIZE)

    def per_image(gt, info, key):
        inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
                  & (anchors[:, 2] < jnp.floor(info[1]))
                  & (anchors[:, 3] < jnp.floor(info[0])))
        ov = bbox_overlaps(anchors, gt[:, :4], mask_zero_area=True)
        ov = jnp.where(inside[:, None], ov, -1.0)

        max_ov = ov.max(axis=1)
        argmax_ov = ov.argmax(axis=1)

        labels = jnp.full(anchors.shape[0], -1, jnp.int32)
        labels = jnp.where(inside & (max_ov < t.RPN_NEGATIVE_OVERLAP),
                           0, labels)
        # Best anchor per gt is positive (ties included; zero-overlap gts
        # masked out by the 1e-5 substitution — reference :106-110).
        gt_max = ov.max(axis=0)
        gt_max = jnp.where(gt_max == 0, 1e-5, gt_max)
        is_best = (ov == gt_max[None, :]).any(axis=1)
        labels = jnp.where(is_best, 1, labels)
        labels = jnp.where(inside & (max_ov >= t.RPN_POSITIVE_OVERLAP),
                           1, labels)

        # Subsample: disable excess fg, then excess bg (reference :118-145).
        # "rank(pr) < k" == "pr >= k-th largest" for i.i.d. uniform
        # priorities, so a top_k of k ≤ RPN_BATCHSIZE replaces two full
        # argsorts over all K*A anchors (~2.5× faster anchor_target on a
        # v5e at 600×1200). Float32 uniforms DO collide at ~20k draws
        # (birthday bound), and a tie exactly at the top_k threshold keeps
        # a few more than the quota — benign, since the loss normalizers
        # below use the actual selected counts, not the nominal quota.
        n = anchors.shape[0]
        k_fg, k_bg = jax.random.split(key)
        fg = labels == 1
        pr = jnp.where(fg, jax.random.uniform(k_fg, fg.shape), -jnp.inf)
        fg_thr = jax.lax.top_k(pr, min(num_fg, n))[0][-1]
        labels = jnp.where(fg & (pr < fg_thr), -1, labels)
        num_bg = t.RPN_BATCHSIZE - (labels == 1).sum()
        bg = labels == 0
        pr = jnp.where(bg, jax.random.uniform(k_bg, bg.shape), -jnp.inf)
        k_cap = min(t.RPN_BATCHSIZE, n)
        bg_vals = jax.lax.top_k(pr, k_cap)[0]
        bg_thr = bg_vals[jnp.clip(num_bg - 1, 0, k_cap - 1)]
        # num_bg ≥ RPN_BATCHSIZE − num_fg > 0; if fewer bg candidates than
        # num_bg the threshold is −inf and nothing is disabled (reference
        # keeps all in that case too).
        labels = jnp.where(bg & (pr < bg_thr), -1, labels)

        targets = bbox_transform(anchors, gt[argmax_ov, :4])
        targets = jnp.where(inside[:, None], targets, 0.0)

        in_w = jnp.where(labels == 1,
                         jnp.float32(t.RPN_BBOX_INSIDE_WEIGHTS[0]), 0.0)
        # Uniform example weighting (RPN_POSITIVE_WEIGHT=-1, reference
        # :155-164): every sampled example weighs 1/num_examples.
        num_ex = jnp.maximum((labels >= 0).sum(), 1)
        out_w = jnp.where(labels >= 0, 1.0 / num_ex.astype(jnp.float32), 0.0)
        return labels, targets, in_w, out_w

    keys = jax.random.split(rng, gt_boxes.shape[0])
    labels, targets, in_w, out_w = jax.vmap(per_image)(
        gt_boxes, im_info, keys)
    return AnchorTargets(labels, targets, in_w, out_w)


class RoiSamples(NamedTuple):
    rois: jnp.ndarray          # (B, S, 5)
    labels: jnp.ndarray        # (B, S) int32 class ids (0 = bg)
    bbox_targets: jnp.ndarray  # (B, S, 4) normalized, for the labeled class
    in_weights: jnp.ndarray    # (B, S, 4)
    out_weights: jnp.ndarray   # (B, S, 4)


def proposal_target(rois: jnp.ndarray, gt_boxes: jnp.ndarray, cfg: Config,
                    rng: jax.Array) -> RoiSamples:
    """Sample S = cfg.TRAIN.BATCH_SIZE RoIs per image with fg fraction
    cfg.TRAIN.FG_FRACTION (reference ``proposal_target_layer_cascade.py``).

    rois: (B, N, 5) proposal-layer output; gt_boxes: (B, G, 5) zero-padded.
    """
    t = cfg.TRAIN
    s = t.BATCH_SIZE
    fg_per_image = int(round(t.FG_FRACTION * s)) or 1
    means = jnp.asarray(t.BBOX_NORMALIZE_MEANS, jnp.float32)
    stds = jnp.asarray(t.BBOX_NORMALIZE_STDS, jnp.float32)
    inside_w = jnp.asarray(t.BBOX_INSIDE_WEIGHTS, jnp.float32)

    def per_image(img_idx, img_rois, gt, key):
        # Candidates = proposals + gt boxes (reference :39-43).
        gt_as_rois = jnp.concatenate(
            [jnp.zeros((gt.shape[0], 1), gt.dtype), gt[:, :4]], axis=1)
        cand = jnp.concatenate([img_rois, gt_as_rois], axis=0)
        n = cand.shape[0]

        ov = bbox_overlaps(cand[:, 1:5], gt[:, :4], mask_zero_area=True)
        max_ov = ov.max(axis=1)
        gt_assign = ov.argmax(axis=1)
        cand_labels = gt[gt_assign, 4].astype(jnp.int32)

        fg = max_ov >= t.FG_THRESH
        bg = (max_ov < t.BG_THRESH_HI) & (max_ov >= t.BG_THRESH_LO)
        n_fg_avail = fg.sum()
        n_bg_avail = bg.sum()

        k1, k2, k3, k4 = jax.random.split(key, 4)
        # Random-priority orders put fg (resp. bg) candidates first, in
        # uniformly random order — the reference's np.random.permutation.
        fg_order = jnp.argsort(-jnp.where(fg, jax.random.uniform(k1, (n,)),
                                          -jnp.inf))
        bg_order = jnp.argsort(-jnp.where(bg, jax.random.uniform(k2, (n,)),
                                          -jnp.inf))

        # With-replacement draws (reference floor(rand * count) — :167, :174).
        u_fg = jax.random.uniform(k3, (s,))
        u_bg = jax.random.uniform(k4, (s,))
        fg_repl = jnp.take(fg_order, jnp.floor(
            u_fg * jnp.maximum(n_fg_avail, 1)).astype(jnp.int32))
        bg_repl = jnp.take(bg_order, jnp.floor(
            u_bg * jnp.maximum(n_bg_avail, 1)).astype(jnp.int32))

        # Three cases (reference :150-189): both present / fg only / bg only.
        n_fg = jnp.where(n_bg_avail > 0,
                         jnp.minimum(fg_per_image, n_fg_avail), s)
        n_fg = jnp.where(n_fg_avail > 0, n_fg, 0)

        slot = jnp.arange(s)
        fg_pick = jnp.where(n_bg_avail > 0, jnp.take(fg_order, slot), fg_repl)
        bg_pick = jnp.take(bg_repl, jnp.clip(slot - n_fg, 0, s - 1))
        keep = jnp.where(slot < n_fg, fg_pick, bg_pick)

        labels = jnp.take(cand_labels, keep)
        labels = jnp.where(slot < n_fg, labels, 0)  # bg slots → class 0

        out_rois = jnp.take(cand, keep, axis=0)
        out_rois = out_rois.at[:, 0].set(img_idx.astype(out_rois.dtype))

        gt_rois = jnp.take(gt, jnp.take(gt_assign, keep), axis=0)
        targets = bbox_transform(out_rois[:, 1:5], gt_rois[:, :4])
        if t.BBOX_NORMALIZE_TARGETS_PRECOMPUTED:
            targets = (targets - means[None, :]) / stds[None, :]
        # Only fg rois regress (reference :83-93); zero targets elsewhere.
        fg_slot = (labels > 0)[:, None]
        targets = jnp.where(fg_slot, targets, 0.0)
        in_w = jnp.where(fg_slot, inside_w[None, :], 0.0)
        out_w = (in_w > 0).astype(jnp.float32)
        return out_rois, labels, targets, in_w, out_w

    b = rois.shape[0]
    keys = jax.random.split(rng, b)
    out = jax.vmap(per_image)(jnp.arange(b), rois, gt_boxes, keys)
    return RoiSamples(*out)
