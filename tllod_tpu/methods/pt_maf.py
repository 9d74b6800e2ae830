"""PT-MAF — Paradigm-Teacher MAF.

Rebuild of ``lib/PT_MAF/`` (SURVEY §2.4): MAF's hierarchical image DA split
into **foreground / background pairs** gated by the RPN objectness map —
pixels whose max anchor fg-prob exceeds ``high``·max are "foreground", below
``low``·max "background"; each group has its own discriminator bank and its
DA loss is a masked NLL (ignore elsewhere), with the GRL strength scaled by
the group's pixel fraction (``lib/PT_MAF/faster_rcnn.py:132-148, 290-331``,
GRL α = ratio·0.1, ``:24-37``) — plus **knowledge distillation** from a
frozen source-only teacher: masked temperature-T KL on the RPN objectness
map (gt-box footprint mask) and positive-RoI KL on the box-head class
distribution (``methods/PT_MAF/PT_MAF_train.py:440-456``,
``lib/PT_MAF/faster_rcnn_kd.py:43-108``).

Defaults (reference ``PT_MAF_train.py:109-131``): α=β=γ=1, T=3, high=0.7,
low=0.1; instance DA = MAF's confidence-weighted discriminator on
fc7 ⊕ cls_prob.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import features_pair
from tllod_tpu.methods.maf import (ImageDADRM, ImageDAPlain,
                                   InstanceDAWeighted)
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.ops.losses import softmax_cross_entropy


def masked_image_nll(logits: jnp.ndarray, domain: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """NLL against the broadcast domain label, averaged over ``mask`` pixels
    only (the reference's label=-1 + ignore_index trick,
    ``lib/PT_MAF/faster_rcnn.py:318-327``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    is_src = (domain > 0)[:, None, None]
    picked = jnp.where(is_src, logp[..., 1], logp[..., 0])
    denom = jnp.maximum(mask.sum(), 1.0)
    return -(picked * mask).sum() / denom


def fg_bg_maps(fg_prob: jnp.ndarray, high: float, low: float):
    """Foreground/background gating maps from the RPN objectness map
    (``lib/PT_MAF/faster_rcnn.py:131-148``): per-pixel max over anchors,
    thresholded at high/low fractions of the global max. Returns
    (fg (B,H,W), bg (B,H,W), ratio_f, ratio_b) with the ratios detached in
    the denominator exactly like the reference."""
    per_pixel = fg_prob.max(axis=-1)                      # (B, H, W)
    max_prob = per_pixel.max()
    f = (per_pixel > max_prob * high).astype(jnp.float32)
    b = (per_pixel < max_prob * low).astype(jnp.float32)
    total = jax.lax.stop_gradient(f.sum() + b.sum())
    total = jnp.maximum(total, 1.0)
    return f, b, f.sum() / total, b.sum() / total


class PTMAFModel(nn.Module):
    """Param subtrees: detector, img_da{3,4,5}_{f,b}, ins_da. The frozen
    teacher's params are passed as an APPLY-TIME argument (not part of this
    module), matching the reference's separate ``fasterRCNN_ori`` model."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    temperature: float = 3.0
    high: float = 0.7
    low: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        for group in ("f", "b"):
            setattr(self, f"img_da3_{group}",
                    ImageDADRM(64, 4, dtype=self.dtype,
                               name=f"img_da3_{group}"))
            setattr(self, f"img_da4_{group}",
                    ImageDADRM(256, 2, dtype=self.dtype,
                               name=f"img_da4_{group}"))
            setattr(self, f"img_da5_{group}",
                    ImageDAPlain(dtype=self.dtype, name=f"img_da5_{group}"))
        self.ins_da = InstanceDAWeighted(dtype=self.dtype, name="ins_da")

    def _grouped_image_losses(self, taps, domain, fg_prob, weights):
        """Σ level-weighted (fg-masked f-head NLL + bg-masked b-head NLL)."""
        alpha, beta, gamma = weights
        fmap, bmap, ratio_f, ratio_b = fg_bg_maps(fg_prob, self.high,
                                                  self.low)
        c3, c4, c5 = taps
        heads = {
            "3": (self.img_da3_f, self.img_da3_b, c3, alpha),
            "4": (self.img_da4_f, self.img_da4_b, c4, beta),
            "5": (self.img_da5_f, self.img_da5_b, c5, gamma),
        }
        total = jnp.float32(0.0)
        for _, (head_f, head_b, feat, w) in heads.items():
            # GRL α scaled by the group's (traced) pixel ratio
            # (reference :27-28: ctx.alpha = ratio * 0.1).
            lf = head_f(feat, grl_scale=ratio_f)
            lb = head_b(feat, grl_scale=ratio_b)
            # DRM'd maps can be ±1 pixel off the stride-16 RPN map; crop to
            # the common extent before masking.
            h = min(lf.shape[1], fmap.shape[1])
            w_ = min(lf.shape[2], fmap.shape[2])
            total = total + w * (
                masked_image_nll(lf[:, :h, :w_], domain, fmap[:, :h, :w_])
                + masked_image_nll(lb[:, :h, :w_], domain,
                                   bmap[:, :h, :w_]))
        return total

    def _instance_loss(self, fc7, cls_prob, domain):
        feat = jnp.concatenate([fc7, cls_prob], axis=1)
        logits = self.ins_da(feat, domain)
        labels = jnp.full((logits.shape[0],),
                          domain.reshape(-1)[0].astype(jnp.int32))
        return softmax_cross_entropy(logits, labels)

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True,
                 teacher_outputs: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> Dict[str, Any]:
        det = self.detector
        weights = (1.0, 1.0, 1.0)

        # one batched conv pass over [src; tgt] when bucket shapes match
        s_taps, t_taps = features_pair(det, src["im_data"], tgt["im_data"],
                                       return_taps=True)
        out = det.forward_from_features(
            s_taps[-1], src["im_info"], src["gt_boxes"],
            training=training, supervised=training)
        out["da_img_loss"] = self._grouped_image_losses(
            s_taps, src["domain"], out["rpn_cls_prob"], weights)
        out["da_ins_loss"] = self._instance_loss(
            out["pooled_feat"],
            out["cls_prob"].reshape(-1, self.num_classes), src["domain"])

        t_out = det.forward_from_features(
            t_taps[-1], tgt["im_info"], tgt["gt_boxes"],
            training=training, supervised=False)
        out["tgt_da_img_loss"] = self._grouped_image_losses(
            t_taps, tgt["domain"], t_out["rpn_cls_prob"], weights)
        out["tgt_da_ins_loss"] = self._instance_loss(
            t_out["pooled_feat"],
            t_out["cls_prob"].reshape(-1, self.num_classes), tgt["domain"])

        # KD distributions for the distillation loss computed outside against
        # the frozen teacher (the train step owns the teacher apply).
        if training:
            out["kd_cls_prob"] = self.kd_cls_prob(out["pooled_feat"])
            out["kd_rpn_prob"] = self.kd_rpn_prob(s_taps[-1])
        return out

    def kd_cls_prob(self, fc7):
        """Temperature-T class distribution of the box head
        (``faster_rcnn_kd.py:199``-analogue on the student)."""
        cls_score, _ = self.detector.box_outputs(fc7)
        return jax.nn.softmax(cls_score / self.temperature, axis=1)

    def kd_rpn_prob(self, base_feat):
        """Temperature-T RPN objectness distribution (B, H, W, A, 2)."""
        from tllod_tpu.models.rpn import rpn_probs
        cls_score, _ = self.detector.rpn(base_feat)
        a = cls_score.shape[-1] // 2
        logits = jnp.stack((cls_score[..., :a], cls_score[..., a:]), axis=-1)
        return jax.nn.softmax(logits / self.temperature, axis=-1)


def gt_footprint_mask(gt_boxes: jnp.ndarray, feat_h: int, feat_w: int,
                      stride: int = 16) -> jnp.ndarray:
    """Binary stride-16 map of gt-box interiors (teacher ``mask``,
    ``faster_rcnn_kd.py:58-68``: int-truncated box coords, [x1, x2) × ...).
    gt_boxes: (G, 5) zero-padded."""
    ys = jnp.arange(feat_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(feat_w, dtype=jnp.float32)[None, :]
    bb = jnp.floor(gt_boxes[:, :4] / stride)
    valid = (gt_boxes[:, 2] > gt_boxes[:, 0])[:, None, None]
    inside = ((xs[None] >= bb[:, 0, None, None])
              & (xs[None] < bb[:, 2, None, None])
              & (ys[None] >= bb[:, 1, None, None])
              & (ys[None] < bb[:, 3, None, None])) & valid
    return inside.any(axis=0).astype(jnp.float32)


def pt_maf_kd_loss(student_rpn, teacher_rpn, student_cls, teacher_cls,
                   rois_label, mask) -> jnp.ndarray:
    """Masked KL terms (reference ``PT_MAF_train.py:448-451``):
    (1/(pos+1))·Σ_pos student·log(student/teacher) on RoI class dists +
    (1/(mask+1))·Σ_mask student·log(student/teacher) on RPN dists."""
    eps = 1e-8
    pos = (rois_label > 0).astype(jnp.float32)
    cls_kl = (pos[:, None] * student_cls
              * jnp.log((student_cls + eps) / (teacher_cls + eps))).sum()
    cls_kl = cls_kl / (pos.sum() + 1.0)
    # mask: (B, H, W) per-image gt footprints (batched form of the
    # reference's single-image mask, faster_rcnn_kd.py:58-68)
    m = mask[:, :, :, None, None]
    rpn_kl = (m * student_rpn
              * jnp.log((student_rpn + eps) / (teacher_rpn + eps))).sum()
    rpn_kl = rpn_kl / (mask.sum() + 1.0)
    return cls_kl + rpn_kl


def pt_maf_loss(out: Dict[str, Any], lamda: float = 0.1,
                kd_loss: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """det + λ·(img + ins + tgt_img + tgt_ins) + kd
    (reference ``PT_MAF_train.py:453-456``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    return det + lamda * (out["da_img_loss"] + out["da_ins_loss"]
                          + out["tgt_da_img_loss"]
                          + out["tgt_da_ins_loss"]) + kd_loss
