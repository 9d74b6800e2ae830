"""DAF — Domain Adaptive Faster R-CNN.

Rebuild of ``lib/DAF/faster_rcnn.py:22-224``: supervised source forward +
unsupervised target forward (RPN in eval config — ``:140``), image-level and
instance-level domain classifiers behind GRL (α=0.1), and the consistency
loss between per-RoI domain probability and the mean image-level domain
probability. All in ONE jitted step — the reference runs two backbone passes,
a CPU LabelResizeLayer round trip, and a CUDA NMS sync per step.

Bug-compatible detail kept for parity: the source consistency term uses
image-prob channel 1 while the target term uses channel 0
(``lib/DAF/faster_rcnn.py:192,216``).

Total training loss (``methods/DAF/DAF_train.py:397-400``):
    det + λ·(img + ins + cst + tgt_img + tgt_ins + tgt_cst), λ = 0.1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import (ImageDA, InstanceDA,
                                          features_pair, image_da_loss,
                                          instance_da_loss)
from tllod_tpu.models.faster_rcnn import FasterRCNN


class DAFModel(nn.Module):
    """Detector + DAF heads. Param subtrees: ``detector``, ``img_da``,
    ``ins_da`` — eval restores ``detector`` alone."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # One batched conv pass over [src; tgt] when bucket shapes match (exact:
    # every backbone op is per-image). False forces two passes (parity test).
    fuse_pair: bool = True
    # One batched box-head (fc6/fc7) pass over [src RoIs; tgt RoIs]: the
    # 103M-param fc6 weight and its gradient accumulation stream HBM once
    # per step instead of twice. Exact for the dense head (rows are
    # independent); dropout masks stay i.i.d. per row, only the rng stream
    # differs from two separate draws.
    fuse_head: bool = True

    def setup(self):
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.img_da = ImageDA(alpha=self.grl_alpha, dtype=self.dtype,
                              name="img_da")
        self.ins_da = InstanceDA(alpha=self.grl_alpha, dtype=self.dtype,
                                 name="ins_da")

    def _domain_terms(self, base_feat, fc7, domain, rois_per_image,
                      consistency_channel: int, deterministic: bool):
        img_logits = self.img_da(base_feat)
        img_loss = image_da_loss(img_logits, domain)

        ins_prob = self.ins_da(fc7, deterministic=deterministic)
        ins_loss = instance_da_loss(ins_prob, domain, rois_per_image)

        # Consistency: per-RoI prob vs detached mean image prob on the
        # domain-specific channel (reference :191-196, :216-220;
        # MSELoss(size_average=False) → SUM over RoIs).
        img_prob = jax.nn.softmax(img_logits, axis=-1)[
            ..., consistency_channel]
        target = jax.lax.stop_gradient(img_prob.mean())
        cst_loss = jnp.sum((ins_prob - target) ** 2)
        return img_loss, ins_loss, cst_loss

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any],
                 *, training: bool = True) -> Dict[str, Any]:
        det = self.detector
        cfg = self.cfg
        deterministic = not training

        s_feat, t_feat = features_pair(det, src["im_data"], tgt["im_data"],
                                       fuse=self.fuse_pair)

        if self.fuse_head:
            # src supervised + tgt unsupervised pre-head passes, then ONE
            # fc6/fc7 chain over the concatenated RoI features.
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
            # ---- source: full supervised path ----
            out = det.forward_from_features(
                s_feat, src["im_info"], src["gt_boxes"], training=training)
            fc7_s = out["pooled_feat"]
            # ---- target: unsupervised path, RPN under TEST config ----
            t_out = det.forward_from_features(
                t_feat, tgt["im_info"], tgt["gt_boxes"],
                training=training, supervised=False)
            fc7_t = t_out["pooled_feat"]

        s_rois_per_img = out["rois"].shape[1]
        img_l, ins_l, cst_l = self._domain_terms(
            out["base_feat"], fc7_s, src["domain"],
            s_rois_per_img, consistency_channel=1,
            deterministic=deterministic)
        t_img_l, t_ins_l, t_cst_l = self._domain_terms(
            t_feat, fc7_t, tgt["domain"],
            t_out["rois"].shape[1],
            consistency_channel=0, deterministic=deterministic)

        out.update({
            "da_img_loss": img_l, "da_ins_loss": ins_l, "da_cst_loss": cst_l,
            "tgt_da_img_loss": t_img_l, "tgt_da_ins_loss": t_ins_l,
            "tgt_da_cst_loss": t_cst_l,
        })
        return out


def daf_loss(out: Dict[str, Any], lamda: float = 0.1) -> jnp.ndarray:
    """det + λ·(6 DA terms) (reference ``DAF_train.py:397-400``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    da = (out["da_img_loss"] + out["da_ins_loss"] + out["da_cst_loss"]
          + out["tgt_da_img_loss"] + out["tgt_da_ins_loss"]
          + out["tgt_da_cst_loss"])
    return det + lamda * da
