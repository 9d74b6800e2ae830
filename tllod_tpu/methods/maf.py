"""MAF — Multi-Adversarial Faster R-CNN.

Rebuild of ``lib/MAF/`` (SURVEY §2.4): hierarchical image-level alignment on
the conv3/conv4/conv5 feature pyramid (the backbone split at
``lib/MAF/vgg16.py:43-45`` becomes feature taps), each low-level tap passing
through a **Scale Reduce Module** (SRM/DRM: 1×1 channel reduction + space-to-
depth, ``lib/MAF/drm.py:10-42``) so all three domain maps live at ~stride-16;
plus a **weighted-GRL** instance discriminator whose reversed gradient is
scaled by the discriminator's own confidence on the true domain
(``WGRLayer``, ``lib/MAF/DA.py:34-53``, α=0.2), fed with fc7 ⊕ cls_prob
(4096 + n_classes, ``lib/MAF/faster_rcnn.py:207-211``).

Total loss (``methods/MAF/MAF_train.py:415-418``):
    det + λ·(img3+img4+img5 + α·ins + tgt_img3+4+5 + α·tgt_ins).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import features_pair, image_da_loss
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.models.rpn import proposal_target
from tllod_tpu.ops.grl import grad_reverse, weighted_grad_reverse
from tllod_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy


def space_to_depth(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """DRM's chunk-and-stack (``lib/MAF/drm.py:20-42``): crop H/W to
    multiples of ``scale``, then fold each scale×scale block into channels
    with the torch (C, i, j) channel ordering."""
    b, h, w, c = x.shape
    hn, wn = h // scale, w // scale
    x = x[:, :hn * scale, :wn * scale, :]
    x = x.reshape(b, hn, scale, wn, scale, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # (B, hn, wn, C, s, s)
    return x.reshape(b, hn, wn, c * scale * scale)


class ImageDADRM(nn.Module):
    """GRL → DRM (1×1 conv to ``inner`` + ReLU + space-to-depth) → 1×1 conv
    512 → ReLU → 1×1 conv 2 (``_ImageDA_drm``, ``lib/MAF/DA.py:128-149``)."""

    inner: int
    scale: int
    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, grl_scale=1.0):
        # grl_scale: PT-MAF scales the GRL strength by the (traced) fg/bg
        # pixel ratio (lib/PT_MAF/faster_rcnn.py:27-28: alpha = ratio * 0.1)
        x = grad_reverse(feat, self.alpha * grl_scale)
        x = nn.Conv(self.inner, (1, 1), use_bias=False, dtype=self.dtype,
                    name="drm_conv")(x)
        x = nn.relu(x)
        x = space_to_depth(x, self.scale)
        x = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return x


class ImageDAPlain(nn.Module):
    """Plain 2-class pixel head (``_ImageDA``, ``lib/MAF/DA.py:60-76``)."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, grl_scale=1.0):
        x = grad_reverse(feat, self.alpha * grl_scale)
        x = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return x


class InstanceDAWeighted(nn.Module):
    """Confidence-weighted instance discriminator (``_InstanceDA_w``,
    ``lib/MAF/DA.py:79-105``): a first pass on the *detached* features yields
    softmax confidence on the true domain, which scales the reversed gradient
    of the second (loss-bearing) pass; α=0.2."""

    wgrl_alpha: float = 0.2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dc_ip1 = nn.Dense(1024, dtype=self.dtype)
        self.dc_ip2 = nn.Dense(1024, dtype=self.dtype)
        self.classifier = nn.Dense(2, dtype=self.dtype)

    def _mlp(self, x):
        x = nn.relu(self.dc_ip1(x))
        x = nn.relu(self.dc_ip2(x))
        return self.classifier(x)

    def __call__(self, feat, domain_label: jnp.ndarray):
        # pass 1 (detached input): confidence on the true domain column
        score = jax.nn.softmax(self._mlp(jax.lax.stop_gradient(feat)),
                               axis=1)
        dom = domain_label.astype(jnp.int32).reshape(-1)[0]
        weight = jnp.take(score, dom, axis=1)[:, None]
        # pass 2: loss-bearing, gradient reversed and confidence-scaled
        x = weighted_grad_reverse(feat, self.wgrl_alpha * weight)
        return self._mlp(x)


class MAFModel(nn.Module):
    """Param subtrees: detector, img_da3, img_da4, img_da5, ins_da."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        # (in 256, inner 64, s 4) / (512, 256, 2) / plain on conv5
        # (reference lib/MAF/faster_rcnn.py:41-44)
        self.img_da3 = ImageDADRM(64, 4, alpha=self.grl_alpha,
                                  dtype=self.dtype, name="img_da3")
        self.img_da4 = ImageDADRM(256, 2, alpha=self.grl_alpha,
                                  dtype=self.dtype, name="img_da4")
        self.img_da5 = ImageDAPlain(alpha=self.grl_alpha, dtype=self.dtype,
                                    name="img_da5")
        self.ins_da = InstanceDAWeighted(dtype=self.dtype, name="ins_da")

    def _image_losses(self, taps, domain):
        c3, c4, c5 = taps
        return (image_da_loss(self.img_da3(c3), domain)
                + image_da_loss(self.img_da4(c4), domain)
                + image_da_loss(self.img_da5(c5), domain))

    def _instance_loss(self, fc7, cls_prob, domain):
        feat = jnp.concatenate([fc7, cls_prob], axis=1)   # (R, 4096 + C)
        logits = self.ins_da(feat, domain)
        labels = jnp.full((logits.shape[0],),
                          domain.reshape(-1)[0].astype(jnp.int32))
        return softmax_cross_entropy(logits, labels)

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector

        # source: supervised path with pyramid taps (one batched conv pass
        # over [src; tgt] when bucket shapes match — see features_pair)
        s_taps, t_taps = features_pair(det, src["im_data"], tgt["im_data"],
                                       return_taps=True)
        out = det.forward_from_features(
            s_taps[-1], src["im_info"], src["gt_boxes"],
            training=training, supervised=training)
        out["da_img_loss"] = self._image_losses(s_taps, src["domain"])
        out["da_ins_loss"] = self._instance_loss(
            out["pooled_feat"], out["cls_prob"].reshape(
                -1, self.num_classes), src["domain"])

        # target: unsupervised (RPN under TEST config)
        t_out = det.forward_from_features(
            t_taps[-1], tgt["im_info"], tgt["gt_boxes"],
            training=training, supervised=False)
        out["tgt_da_img_loss"] = self._image_losses(t_taps, tgt["domain"])
        out["tgt_da_ins_loss"] = self._instance_loss(
            t_out["pooled_feat"], t_out["cls_prob"].reshape(
                -1, self.num_classes), tgt["domain"])
        return out


def maf_loss(out: Dict[str, Any], lamda: float = 0.1,
             alpha: float = 1.0) -> jnp.ndarray:
    """det + λ·(img + α·ins + tgt_img + α·tgt_ins)
    (reference ``MAF_train.py:415-418``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    return det + lamda * (out["da_img_loss"] + alpha * out["da_ins_loss"]
                          + out["tgt_da_img_loss"]
                          + alpha * out["tgt_da_ins_loss"])
