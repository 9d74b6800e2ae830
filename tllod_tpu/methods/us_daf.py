"""US-DAF — Universal Scale-Aware Domain Adaptive Faster R-CNN (UniDAOD).

Rebuild of ``lib/US_DAF/`` (SURVEY §2.4): source and target class sets
differ (VOC 15 = 5 private + 10 common vs Clipart 15 = 10 common + 5
private — ``lib/US_DAF/pascal_voc.py:49-52``, ``pascal_voc_clipart.py:
55-59``). Alignment machinery:

  * 1-channel sigmoid image discriminator, plain BCE to 1 (source) / 0
    (target), no label-resize (``lib/US_DAF/DA.py:36-51``,
    ``faster_rcnn.py:264-277``);
  * scale-aware **multi-label** instance discriminator: 4 sigmoids
    [domain, small, middle, large] with RoI-area buckets ≤400 / (400,1e4) /
    ≥1e4 px² using the un-"+1" area (``faster_rcnn.py:103-126, 206-231``,
    ``DA.py:69-89``);
  * **margin BCE filtering**: the domain column only contributes where its
    own BCE exceeds 0.5 — suppressing confidently-classified (private-class)
    instances from alignment (``BCEloss_margin``, ``faster_rcnn.py:25-33``).

The reference also constructs class-probability-weighted image label maps
(``faster_rcnn.py:151-177, 242-262``) but never uses them in any returned
loss (dead code); they are intentionally not reproduced.

Total loss (``methods/US_DAF/US_DAF_train.py:428-431``):
    det + λ·(img + ins + tgt_img + tgt_ins).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import features_pair
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.ops.grl import grad_reverse


class ImageDASigmoid(nn.Module):
    """GRL → 1×1 conv 512 → ReLU → 1×1 conv 1 → sigmoid
    (``lib/US_DAF/DA.py:36-51``)."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = grad_reverse(feat, self.alpha)
        x = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return jax.nn.sigmoid(x)


class InstanceDAScale(nn.Module):
    """GRL → fc(in→1024) → ReLU → Drop → fc(1024) → ReLU → Drop → fc(4) →
    sigmoid (``lib/US_DAF/DA.py:69-89``)."""

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
        x = nn.Dense(4, dtype=self.dtype, name="classifier")(x)
        return jax.nn.sigmoid(x)


def scale_labels(rois: jnp.ndarray) -> jnp.ndarray:
    """(R, 3) one-hot [small, middle, large] from RoI areas
    (``faster_rcnn.py:103-126``: area = (x2-x1)·(y2-y1), buckets at 400 and
    10000 px²)."""
    area = (rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2])
    small = (area <= 400).astype(jnp.float32)
    large = (area >= 10000).astype(jnp.float32)
    middle = ((area > 400) & (area < 10000)).astype(jnp.float32)
    return jnp.stack([small, middle, large], axis=1)


def bce_margin_loss(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Margin-filtered multi-label BCE (``BCEloss_margin``,
    ``lib/US_DAF/faster_rcnn.py:25-33``): the domain column (0) is zeroed
    unless its own BCE exceeds 0.5; scale columns always count; mean over
    all R×4 entries.

    The clip is load-bearing on TPU: XLA's logistic approximation can exit
    [0, 1] by ~1 ulp when saturated, and the reference's bare ``+1e-10``
    then feeds ``log`` a NEGATIVE argument → NaN in both instance terms
    from step 1 (the round-3 ``us_daf_res101`` failure; CPU's exactly-
    bounded libm sigmoid masks it). Values in the unsaturated regime are
    unchanged.
    """
    eps = 1e-10
    probs = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    bce = -(labels * jnp.log(probs + eps)
            + (1.0 - labels) * jnp.log(1.0 - probs + eps))
    domain_w = (bce[:, 0] > 0.5).astype(jnp.float32)[:, None]
    weight = jnp.concatenate(
        [domain_w, jnp.ones((bce.shape[0], 3), jnp.float32)], axis=1)
    return (bce * weight).mean()


class USDAFModel(nn.Module):
    """Param subtrees: detector, img_da, ins_da."""

    num_classes: int
    cfg: Config
    net: str = "res101"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # One batched conv pass over [src; tgt] when bucket shapes match (exact:
    # every backbone op is per-image; see DAFModel.fuse_pair).
    fuse_pair: bool = True
    # One batched box-head pass over [src RoIs; tgt RoIs] — head weights and
    # their gradient accumulation stream HBM once per step instead of twice
    # (exact: head rows are independent; see DAFModel.fuse_head).
    fuse_head: bool = True

    def setup(self):
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.img_da = ImageDASigmoid(alpha=self.grl_alpha, dtype=self.dtype,
                                     name="img_da")
        self.ins_da = InstanceDAScale(alpha=self.grl_alpha, dtype=self.dtype,
                                      name="ins_da")

    def _terms(self, base_feat, fc7, rois, domain_value: float,
               deterministic: bool):
        img_prob = self.img_da(base_feat)
        eps = 1e-7
        p = jnp.clip(img_prob, eps, 1.0 - eps)
        img_loss = -(jnp.log(p) if domain_value > 0.5
                     else jnp.log(1.0 - p)).mean()

        ins_prob = self.ins_da(fc7, deterministic=deterministic)
        flat_rois = rois.reshape(-1, 5)
        labels = jnp.concatenate(
            [jnp.full((flat_rois.shape[0], 1), domain_value, jnp.float32),
             scale_labels(flat_rois)], axis=1)
        ins_loss = bce_margin_loss(ins_prob, labels)
        return img_loss, ins_loss

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector
        deterministic = not training

        s_feat, t_feat = features_pair(det, src["im_data"], tgt["im_data"],
                                       fuse=self.fuse_pair)

        if self.fuse_head:
            out, s_samples, s_pooled = det.forward_pre_head(
                s_feat, src["im_info"], src["gt_boxes"], training=training)
            t_out, _, t_pooled = det.forward_pre_head(
                t_feat, tgt["im_info"], tgt["gt_boxes"],
                training=training, supervised=False)
            ns = s_pooled.shape[0]
            fc7 = det.box_head(jnp.concatenate([s_pooled, t_pooled], axis=0),
                               deterministic=deterministic)
            fc7_s, fc7_t = fc7[:ns], fc7[ns:]
            out = det.finish_head(out, s_samples, fc7_s)
        else:
            out = det.forward_from_features(
                s_feat, src["im_info"], src["gt_boxes"], training=training)
            fc7_s = out["pooled_feat"]
            t_out = det.forward_from_features(
                t_feat, tgt["im_info"], tgt["gt_boxes"],
                training=training, supervised=False)
            fc7_t = t_out["pooled_feat"]

        img_l, ins_l = self._terms(out["base_feat"], fc7_s,
                                   out["rois"], 1.0, deterministic)
        t_img_l, t_ins_l = self._terms(t_feat, fc7_t,
                                       t_out["rois"], 0.0, deterministic)

        out.update({"da_img_loss": img_l, "da_ins_loss": ins_l,
                    "tgt_da_img_loss": t_img_l, "tgt_da_ins_loss": t_ins_l})
        return out


def us_daf_loss(out: Dict[str, Any], lamda: float = 0.1) -> jnp.ndarray:
    """det + λ·(img + ins + tgt_img + tgt_ins)
    (reference ``US_DAF_train.py:428-431``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    return det + lamda * (out["da_img_loss"] + out["da_ins_loss"]
                          + out["tgt_da_img_loss"]
                          + out["tgt_da_ins_loss"])
