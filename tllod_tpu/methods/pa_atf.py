"""PA-ATF — Partial Alignment ATF.

Rebuild of ``lib/PA_ATF/`` (SURVEY §2.4): the ATF tri-way structure (shared
frozen prefix, main + ancillary VGG branches, both source branches through
one RPN/head with summed supervised losses) plus:

  * **partial-alignment image DA** (``lib/PA_ATF/faster_rcnn.py:69-103``):
    each image head computes a per-channel global mask (5×5 s3 conv → ReLU →
    2×2 maxpool → 3×3 s2 conv → global max-pool → sigmoid) on the GRL'd
    features, multiplies the features by it, then a 1-channel sigmoid BCE to
    the domain label; the head returns (loss, mask);
  * **L1 instance DA** (``:57-66``): mean |sigmoid − label|;
  * **CLUB mutual-information heads** (``:105-148, 387-405``): gt-RoI
    features pooled (RoIPool) from the ancillary branch at strides 4/8/16,
    split into aligned (×mask) and specific (×(1−mask)) parts; a pairwise
    discriminator (concat channels → conv s2 → 1×1 conv → fc 2) is trained
    to call matched pairs "same" (label 1) and batch-shuffled pairs "diff"
    (label 0), with GRL 0.1 on both inputs.

Total loss (``methods/PA_ATF/PA_ATF_train.py:405-408``):
    det + λ·(img + ins + tgt_img + tgt_ins) + β·pm, λ=0.1, β=0.1.

The modified target-pass proposal selection — keep top-25% by rank plus a
random 75% of the remaining NMS survivors
(``lib/PA_ATF/proposal_layer1.py:153-161``) — is reproduced inline in
``models/rpn.py`` (the ``sample_rng`` branch of the proposal layer's
``per_image``) and enabled on the target stream.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.models.backbones import VGG16Features
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.ops.grl import grad_reverse
from tllod_tpu.ops.losses import binary_cross_entropy
from tllod_tpu.ops.roi_pool import roi_pool


class PartialImageDA(nn.Module):
    """Masked 1-channel image discriminator returning (loss-ready probs,
    per-channel mask)."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        dim = feat.shape[-1]
        xx = grad_reverse(feat, self.alpha)

        m = nn.Conv(dim, (5, 5), strides=3, padding="VALID",
                    dtype=self.dtype, name="mask_conv1")(xx)
        m = nn.relu(m)
        m = nn.max_pool(m, (2, 2), strides=(2, 2))
        m = nn.Conv(dim, (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, name="mask_conv2")(m)
        mask = jax.nn.sigmoid(m.max(axis=(1, 2), keepdims=True))  # (B,1,1,C)

        x = xx * mask
        x = nn.Conv(dim // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        return jax.nn.sigmoid(x), mask


class InstanceDAL1(nn.Module):
    """GRL → MLP → sigmoid, L1 loss to the domain label
    (``lib/PA_ATF/faster_rcnn.py:43-66``)."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, *, deterministic: bool = True):
        x = grad_reverse(feat, self.alpha)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="dc_ip1")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="dc_ip2")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype,
                                       name="classifier")(x))


class CLUBHead(nn.Module):
    """Pairwise same/shuffled discriminator on (R, 7, 7, C) RoI features."""

    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    # out_score: conv(2C→C, 3x3 s2 VALID) → ReLU → conv(C→128, 1x1) →
    # ReLU → fc(3·3·128 → 2)   (reference :109-118)
    @nn.compact
    def __call__(self, xa, xs, valid, rng):
        """xa/xs: (R, 7, 7, C) aligned/specific gt-RoI features;
        valid: (R,) bool gt-slot validity; rng for the shuffle."""
        dim = xa.shape[-1]
        xa = grad_reverse(xa, self.alpha)
        xs = grad_reverse(xs, self.alpha)

        perm = jax.random.permutation(rng, xa.shape[0])
        xs_r = jnp.take(xs, perm, axis=0)
        valid_r = jnp.take(valid, perm)

        conv1 = nn.Conv(dim, (3, 3), strides=2, padding="VALID",
                        dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(128, (1, 1), dtype=self.dtype, name="conv2")
        fc = nn.Dense(2, dtype=self.dtype, name="fc")

        def score(pair):
            x = nn.relu(conv1(pair))
            x = nn.relu(conv2(x))
            return fc(x.reshape(x.shape[0], -1))

        same = score(jnp.concatenate([xa, xs], axis=-1))
        diff = score(jnp.concatenate([xa, xs_r], axis=-1))

        logp_same = jax.nn.log_softmax(same, axis=1)[:, 1]
        logp_diff = jax.nn.log_softmax(diff, axis=1)[:, 0]
        w_same = valid.astype(jnp.float32)
        w_diff = (valid & valid_r).astype(jnp.float32)
        loss_same = -(logp_same * w_same).sum() / jnp.maximum(w_same.sum(),
                                                              1.0)
        loss_diff = -(logp_diff * w_diff).sum() / jnp.maximum(w_diff.sum(),
                                                              1.0)
        return loss_same + loss_diff


class PAATFModel(nn.Module):
    """Param subtrees: detector, backbone_anc, img_da3/4/5, ins_da,
    club3/4/5."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    # "ancillary" = default PA-ATF; "main" = the vgg16_source_intra variant
    # (reference lib/PA_ATF/faster_rcnn_source_intra.py:391-393 pools the
    # CLUB gt-RoI features from the main branch instead)
    club_branch: str = "ancillary"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.net in ("vgg16", "vgg16_thin"), \
            "PA-ATF ships with the VGG16 backbone"
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.backbone_anc = VGG16Features(
            dtype=self.dtype, name="backbone_anc",
            width=(0.25 if self.net == "vgg16_thin" else 1.0))
        self.img_da3 = PartialImageDA(alpha=self.grl_alpha, name="img_da3")
        self.img_da4 = PartialImageDA(alpha=self.grl_alpha, name="img_da4")
        self.img_da5 = PartialImageDA(alpha=self.grl_alpha, name="img_da5")
        self.ins_da = InstanceDAL1(alpha=self.grl_alpha, name="ins_da")
        self.club3 = CLUBHead(name="club3")
        self.club4 = CLUBHead(name="club4")
        self.club5 = CLUBHead(name="club5")

    def _image_losses(self, taps, domain):
        losses, masks = [], []
        for head, feat in zip((self.img_da3, self.img_da4, self.img_da5),
                              taps):
            probs, mask = head(feat)
            label = jnp.broadcast_to(
                (domain > 0).astype(jnp.float32)[:, None, None, None],
                probs.shape)
            losses.append(binary_cross_entropy(probs, label))
            masks.append(mask)
        return sum(losses), masks

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector
        deterministic = not training
        train_post_n = self.cfg.TRAIN.RPN_POST_NMS_TOP_N

        s_taps_main = det.features(src["im_data"], return_taps=True)
        s_taps_anc = self.backbone_anc(src["im_data"], return_taps=True)

        out = det.forward_from_features(
            s_taps_main[-1], src["im_info"], src["gt_boxes"],
            training=training, supervised=training)
        anc = det.forward_from_features(
            s_taps_anc[-1], src["im_info"], src["gt_boxes"],
            training=training, supervised=training)
        for k in ("rpn_loss_cls", "rpn_loss_box",
                  "rcnn_loss_cls", "rcnn_loss_box"):
            out[k] = out[k] + anc[k]

        t_taps = det.features(tgt["im_data"], return_taps=True)
        # target pass uses the modified TEST proposal selection: top-25% of
        # NMS survivors + a random 75% of the rest
        # (lib/PA_ATF/proposal_layer1.py:153-161)
        t_out = det.forward_from_features(
            t_taps[-1], tgt["im_info"], tgt["gt_boxes"],
            training=training, supervised=False,
            post_nms_top_n=train_post_n,
            proposal_sample_rng=(self.make_rng("sampling")
                                 if training else None))

        # image DA: ancillary source features vs main target features,
        # collecting the per-level masks for the CLUB split
        out["da_img_loss"], masks = self._image_losses(s_taps_anc,
                                                       src["domain"])
        out["tgt_da_img_loss"], _ = self._image_losses(t_taps, tgt["domain"])

        # instance DA (L1): ancillary head feats on source, main on target
        s_ins = self.ins_da(anc["pooled_feat"], deterministic=deterministic)
        out["da_ins_loss"] = jnp.abs(
            s_ins - (src["domain"] > 0).astype(jnp.float32)[0]).mean()
        t_ins = self.ins_da(t_out["pooled_feat"],
                            deterministic=deterministic)
        out["tgt_da_ins_loss"] = jnp.abs(
            t_ins - (tgt["domain"] > 0).astype(jnp.float32)[0]).mean()

        # CLUB partial-alignment on gt-RoI features of the ancillary branch.
        # GT boxes from EVERY batch image (flattened with their batch index
        # in the rois' first column); at bs=1 this is identical to the
        # reference's single-image pooling (lib/PA_ATF/faster_rcnn.py:387).
        b, g = src["gt_boxes"].shape[:2]
        gt = src["gt_boxes"].reshape(b * g, 5)
        valid = gt[:, 2] > gt[:, 0]
        bidx = jnp.repeat(jnp.arange(b, dtype=gt.dtype), g)[:, None]
        gt_rois = jnp.concatenate([bidx, gt[:, :4]], axis=1)
        club_taps = (s_taps_anc if self.club_branch == "ancillary"
                     else s_taps_main)
        pm = jnp.float32(0.0)
        for i, (club, feat, stride) in enumerate(
                zip((self.club3, self.club4, self.club5), club_taps,
                    (4, 8, 16))):
            pooled = roi_pool(feat, gt_rois, out_size=7,
                              spatial_scale=1.0 / stride)
            mask = jax.lax.stop_gradient(masks[i])         # (B, 1, 1, C)
            mask = jnp.repeat(mask, g, axis=0)             # row i ↔ roi i's image
            fa = pooled * mask
            fs = pooled * (1.0 - mask)
            pm = pm + club(fa, fs, valid,
                           self.make_rng("sampling"))
        out["pm_loss"] = pm
        return out


def pa_atf_loss(out: Dict[str, Any], lamda: float = 0.1,
                beta: float = 0.1) -> jnp.ndarray:
    """det + λ·(img + ins + tgt_img + tgt_ins) + β·pm
    (reference ``PA_ATF_train.py:405-408``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    return det + lamda * (out["da_img_loss"] + out["da_ins_loss"]
                          + out["tgt_da_img_loss"]
                          + out["tgt_da_ins_loss"]) + beta * out["pm_loss"]
