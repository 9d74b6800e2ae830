"""MAD — Multi-view Adversarial Discriminator (domain generalization).

Rebuild of ``lib/MAD/`` (SURVEY §2.4): NO target data — two *source views*
s1/s2 (original + style-augmented splits) run symmetric supervised forwards
(``lib/MAD/faster_rcnn.py:94-202``); generalization comes from three
randomly-initialized **view encoders** (conv stacks with dilation 1/2/3 on
the bilinear-upsampled base features, ``lib/MAD/AC.py:53-201``) and three
instance encoders (MLPs on fc7), each paired with a decoder (reconstruction
MSE to the detached input), a LayerNorm, and a domain head; plus a
**view-difference loss** forcing encoder diversity: ``exp(-Σ pairwise MSE)``
for image views, ``1/Σ`` for instance views (``faster_rcnn.py:319-331,
430-440``), and an MV consistency term between the averaged per-RoI sigmoid
and the averaged image-head probability.

Shipped loss (``methods/MAD/MAD_train.py:553-583``): det_s1 + det_s2 +
epoch·0.12·(0.1·(recon+cls) + 0.01·dis + 0.1·cst), with the single-view DA
terms computed but NOT in the final loss (the reference ships the
``abl_bl`` ablation line) — reproduced faithfully, single-view terms
reported as metrics.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import (ImageDA, InstanceDA, image_da_loss,
                                          instance_da_loss)
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.ops.grl import grad_reverse
from tllod_tpu.ops.losses import binary_cross_entropy

IMG_SIZE = (40, 76)   # fixed upsample target (lib/MAD/faster_rcnn.py:92)
ENC_SIZE = (10, 19)   # encoder output (AC.py comments); LayerNorm shape


class BatchStatNorm(nn.Module):
    """Torch-train-mode BatchNorm: normalize by the current batch statistics
    over (B, H, W) with learned scale/bias. No running averages — these
    modules are train-only scaffolding (eval uses the vanilla detector)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        axes = tuple(range(x.ndim - 1))
        mean = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class ImgEncoder(nn.Module):
    """512 → 1024 → 512(s2) → 256 → 128(s2), 3×3 convs with per-view
    dilation (``ImgEncoder_1/2/3``, ``lib/MAD/AC.py:53-201``)."""

    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        plan = ((1024, 1), (512, 2), (256, 1), (128, 2))
        for i, (ch, stride) in enumerate(plan):
            x = nn.Conv(ch, (3, 3), strides=stride, kernel_dilation=d,
                        use_bias=False, name=f"conv{i}")(x)
            x = BatchStatNorm(ch, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class ImgDecoder(nn.Module):
    """128 → 256(s2) → 512 → 1024(s2) → out_ch transpose convs; out_ch
    follows the backbone's feature width (512 for the reference VGG16)."""

    dilation: int = 1
    out_ch: int = 512

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        plan = ((256, 2, True), (512, 1, True), (1024, 2, True),
                (self.out_ch, 1, False))
        for i, (ch, stride, bn) in enumerate(plan):
            x = nn.ConvTranspose(ch, (3, 3), strides=(stride, stride),
                                 kernel_dilation=(d, d), use_bias=False,
                                 name=f"deconv{i}")(x)
            if bn:
                x = BatchStatNorm(ch, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class InsEncoder(nn.Module):
    """4096 → 2048 → 1024 → 512 (``AC.py:203-220``)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(2048, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        return nn.Dense(512, name="fc3")(x)


class InsDecoder(nn.Module):
    """512 → 1024 → 2048 → out_dim (``AC.py:222-235``); out_dim follows the
    backbone head width (4096 for the reference VGG16)."""

    out_dim: int = 4096

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.relu(nn.Dense(2048, name="fc2")(x))
        return nn.Dense(self.out_dim, name="fc3")(x)


class InstanceDAEn(nn.Module):
    """GRL → 512→256 → drop → 256→64 → drop → 64→1 sigmoid
    (``_InstanceDA_En``, ``lib/MAD/DA.py:148-168``)."""

    alpha: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = grad_reverse(x, self.alpha)
        x = nn.relu(nn.Dense(256, name="dc_ip1")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(64, name="dc_ip2")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return jax.nn.sigmoid(nn.Dense(1, name="classifier")(x))


def _bilinear_resize(x, size):
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]),
                            method="bilinear")


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def _sym_diff(a, b):
    """(MSE(a, sg(b)) + MSE(b, sg(a))) / 2 (reference :319-324)."""
    return 0.5 * (_mse(a, jax.lax.stop_gradient(b))
                  + _mse(b, jax.lax.stop_gradient(a)))


def mv_consistency(ins_prob_mean, img_score_mean, channel: int):
    """SUM((mean per-RoI sigmoid − detached mean image-head prob on
    ``channel``)²) — the MV consistency term (reference
    ``lib/MAD/faster_rcnn.py:470-481``, MSELoss(size_average=False));
    golden-pinned vs torch in tests/test_golden_methods.py."""
    target = jax.lax.stop_gradient(
        jax.nn.softmax(img_score_mean, -1)[..., channel].mean())
    return jnp.sum((ins_prob_mean - target) ** 2)


class MADModel(nn.Module):
    """Param subtrees: detector, img_da, ins_da, per-view img/ins
    encoder+decoder+heads, layernorms."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    # fixed upsample target for the multi-view encoders (reference
    # lib/MAD/faster_rcnn.py:92); tests shrink it — the 1024-ch dilated
    # ConvTranspose gradients at 40×76 are ~170 s/step on XLA:CPU
    img_size: tuple = IMG_SIZE
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.img_da = ImageDA(alpha=self.grl_alpha, name="img_da")
        self.ins_da = InstanceDA(alpha=self.grl_alpha, name="ins_da")
        from tllod_tpu.models.backbones import backbone_dims
        feat_ch, head_dim = backbone_dims(self.net)
        for v in (1, 2, 3):
            setattr(self, f"img_enc{v}", ImgEncoder(dilation=v,
                                                    name=f"img_enc{v}"))
            setattr(self, f"img_dec{v}", ImgDecoder(dilation=v,
                                                    out_ch=feat_ch,
                                                    name=f"img_dec{v}"))
            setattr(self, f"img_da_en{v}", ImageDA(alpha=self.grl_alpha,
                                                   name=f"img_da_en{v}"))
            setattr(self, f"ins_enc{v}", InsEncoder(name=f"ins_enc{v}"))
            setattr(self, f"ins_dec{v}", InsDecoder(out_dim=head_dim,
                                                    name=f"ins_dec{v}"))
            setattr(self, f"ins_da_en{v}", InstanceDAEn(
                alpha=self.grl_alpha, name=f"ins_da_en{v}"))
        self.ln_img = nn.LayerNorm(reduction_axes=(1, 2),
                                   feature_axes=(1, 2), name="ln_img")
        self.ln_ins = nn.LayerNorm(name="ln_ins")

    def _image_views(self, feat_up, domain_for_head):
        """Per view: encode, decode-reconstruct, LN, domain head.
        Returns (mv_feats, recon_loss, cls_loss, scores)."""
        mv_feats, scores = [], []
        recon = jnp.float32(0.0)
        cls = jnp.float32(0.0)
        for v in (1, 2, 3):
            enc = getattr(self, f"img_enc{v}")(feat_up)
            dec = getattr(self, f"img_dec{v}")(enc)
            recon = recon + _mse(dec, jax.lax.stop_gradient(feat_up))
            enc = self.ln_img(enc)
            score = getattr(self, f"img_da_en{v}")(enc)
            cls = cls + image_da_loss(score, domain_for_head)
            mv_feats.append(enc)
            scores.append(score)
        return mv_feats, recon, cls, scores

    def _ins_views(self, fc7, domain_for_head, deterministic):
        mv_feats, probs = [], []
        recon = jnp.float32(0.0)
        cls = jnp.float32(0.0)
        dom = jnp.broadcast_to(domain_for_head.reshape(-1)[0].astype(
            jnp.float32), ())
        for v in (1, 2, 3):
            enc = getattr(self, f"ins_enc{v}")(fc7)
            dec = getattr(self, f"ins_dec{v}")(enc)
            recon = recon + _mse(dec, jax.lax.stop_gradient(fc7))
            enc = self.ln_ins(enc)
            prob = getattr(self, f"ins_da_en{v}")(
                enc, deterministic=deterministic)
            labels = jnp.full_like(prob, dom)
            cls = cls + binary_cross_entropy(prob, labels)
            mv_feats.append(enc)
            probs.append(prob)
        return mv_feats, recon, cls, probs

    @staticmethod
    def _pairwise(fs1, fs2):
        """Σ over view pairs and both sources of symmetric diffs."""
        total = jnp.float32(0.0)
        for i in range(3):
            for j in range(i + 1, 3):
                total = total + _sym_diff(fs1[i], fs1[j]) \
                    + _sym_diff(fs2[i], fs2[j])
        return total

    def __call__(self, s1: Dict[str, Any], s2: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector
        deterministic = not training

        out1 = det(s1["im_data"], s1["im_info"], s1["gt_boxes"],
                   training=training)
        out2 = det(s2["im_data"], s2["im_info"], s2["gt_boxes"],
                   training=training)
        out: Dict[str, Any] = {
            "rois": out1["rois"], "cls_prob": out1["cls_prob"],
            "bbox_pred": out1["bbox_pred"],
            "rois_label": out1["rois_label"],
        }
        for k in ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls",
                  "rcnn_loss_box"):
            out[k] = out1[k] + out2[k]

        # single-view DA (computed, reported, NOT in the shipped loss —
        # reference MAD_train.py:583 "abl_bl"); image heads get s1→0 / s2→1,
        # instance heads s1→1 / s2→0 (reference :102-107, :213-224 quirk)
        zero = jnp.zeros_like(s1["domain"])
        one = jnp.ones_like(s1["domain"])
        score1 = self.img_da(out1["base_feat"])
        score2 = self.img_da(out2["base_feat"])
        out["da_img_loss"] = (image_da_loss(score1, zero)
                              + image_da_loss(score2, one))
        n1 = out1["rois"].shape[1]
        n2 = out2["rois"].shape[1]
        ins1 = self.ins_da(out1["pooled_feat"], deterministic=deterministic)
        ins2 = self.ins_da(out2["pooled_feat"], deterministic=deterministic)
        out["da_ins_loss"] = (instance_da_loss(ins1, one, n1)
                              + instance_da_loss(ins2, zero, n2))
        cst1 = jnp.sum((ins1 - jax.lax.stop_gradient(
            jax.nn.softmax(score1, -1)[..., 1].mean())) ** 2)
        cst2 = jnp.sum((ins2 - jax.lax.stop_gradient(
            jax.nn.softmax(score2, -1)[..., 0].mean())) ** 2)
        out["da_cst_loss"] = cst1 + cst2

        # multi-view machinery
        up1 = _bilinear_resize(out1["base_feat"], self.img_size)
        up2 = _bilinear_resize(out2["base_feat"], self.img_size)
        mv1, rec1, cls1, scores1 = self._image_views(up1, zero)
        mv2, rec2, cls2, scores2 = self._image_views(up2, one)
        out["img_mv_recon_loss"] = rec1 + rec2
        out["img_mv_cls_loss"] = cls1 + cls2
        out["img_mv_dis_loss"] = jnp.exp(-self._pairwise(mv1, mv2))

        imv1, irec1, icls1, iprobs1 = self._ins_views(
            out1["pooled_feat"], one, deterministic)
        imv2, irec2, icls2, iprobs2 = self._ins_views(
            out2["pooled_feat"], zero, deterministic)
        out["ins_mv_recon_loss"] = irec1 + irec2
        out["ins_mv_cls_loss"] = icls1 + icls2
        out["ins_mv_dis_loss"] = 1.0 / (self._pairwise(imv1, imv2) + 1e-8)

        # MV consistency (reference :470-481)
        mv_score1 = sum(scores1) / 3.0
        mv_score2 = sum(scores2) / 3.0
        mv_ins1 = sum(iprobs1) / 3.0
        mv_ins2 = sum(iprobs2) / 3.0
        out["mv_cst_loss"] = (mv_consistency(mv_ins1, mv_score1, 1)
                              + mv_consistency(mv_ins2, mv_score2, 0))
        return out


def mad_loss(out: Dict[str, Any], epoch: jnp.ndarray | float) -> jnp.ndarray:
    """det_s1+s2 + epoch·0.12·(0.1·(recon+cls) + 0.01·dis + 0.1·cst), the
    shipped 'abl_bl' combination (reference ``MAD_train.py:569-583``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    img_mv = (0.1 * out["img_mv_recon_loss"] + 0.1 * out["img_mv_cls_loss"]
              + 0.01 * out["img_mv_dis_loss"])
    ins_mv = (0.1 * out["ins_mv_recon_loss"] + 0.1 * out["ins_mv_cls_loss"]
              + 0.01 * out["ins_mv_dis_loss"])
    cst_mv = 0.1 * out["mv_cst_loss"]
    return det + (img_mv + ins_mv + cst_mv) * epoch * 0.12
