"""IDF — Implicit Domain-invariant Feature learning (dual-branch, stage 5 of
the IDF pipeline).

Rebuild of ``lib/IDF/`` (SURVEY §2.4). The full pipeline
(``methods/IDF/IDF_train.sh:1-17``):
  ① CycleGAN style transfer (external — translated images are dataset
     inputs here, as in the reference),
  ② source-only Faster R-CNN (``methods/faster_rcnn``),
  ③ pseudo-label XML generation (``tools/generate_pseudo_labels.py``,
     reimplementing ``lib/IDF/xml_create.py`` + ``--savelabel``),
  ④ offline Mosaic augmentation (``tools/mosaic_augment.py``,
     reimplementing ``lib/IDF/Mosaic.py``),
  ⑤ THIS model: shared-init VGG split into blocks 1-3/4/5 with a private
     branch ``*_b`` (``lib/IDF/vgg16.py:270-291``); per-block adversarial
     discriminators netD_1/2/3 (GRL) on the invariant branch and
     non-adversarial netD_*_b on the private branch
     (``lib/IDF/faster_rcnn.py:61-101``); **DAM attention** cross-applied
     between branches after blocks 4/5 (``lib/IDF/net_utils.py:300-307``);
     0.001-weighted separation distances; an instance discriminator netD_da
     with Focal/EFocal loss (``lib/IDF/net_utils.py:43-180``); and an
     auxiliary full RPN+head trained on target pseudo-labels from the
     private branch (``lib/IDF/faster_rcnn.py:144-191``).

Loss assembly (``methods/IDF/IDF_train.py:229-335``): source det + 0.5·aux
target det (pseudo) + 0.5·CE domain terms per block per domain + 0.25·focal
instance terms + separation (from epoch 3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.mad import BatchStatNorm
from tllod_tpu.models.backbones import VGG16Features, VGG16Head
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.models.rpn import RPNHead, proposal_layer, proposal_target, \
    rpn_probs, anchor_target
from tllod_tpu.ops.grl import grad_reverse
from tllod_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy


def dam(feat: jnp.ndarray) -> jnp.ndarray:
    """Domain-attention map (``lib/IDF/net_utils.py:300-307``): channel-mean
    of sigmoid features, zeroed below its own mean. (B, H, W, 1)."""
    avg = jax.nn.sigmoid(feat).mean(axis=-1, keepdims=True)
    thr = avg.mean()
    return jnp.where(avg < thr, 0.0, avg)


def pairwise_dist(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6
                  ) -> jnp.ndarray:
    """mean over positions of the channel-wise L2 distance, with torch's
    exact ``F.pairwise_distance(..., 2)`` semantics: the eps is added to the
    DIFFERENCE before the norm (``||a - b + eps||_2``), not to the sum."""
    return jnp.sqrt(jnp.sum((a - b + eps) ** 2, axis=-1)).mean()


def focal_loss(logits: jnp.ndarray, label: int, gamma: float = 5.0,
               efocal: bool = False) -> jnp.ndarray:
    """FocalLoss / EFocalLoss (``lib/IDF/net_utils.py:43-180``):
    -(1-p)^γ·log(p), or -exp(-γ·p)·log(p) for the E variant; mean over N."""
    p = jax.nn.softmax(logits, axis=1)[:, label]
    logp = jnp.log(jnp.clip(p, 1e-10, 1.0))
    mod = jnp.exp(-gamma * p) if efocal else (1.0 - p) ** gamma
    return (-mod * logp).mean()


class NetDConv(nn.Module):
    """Per-block domain head: 3 convs (1×1 for block3, 3×3 s2 for blocks
    4/5) with BN+dropout, global average pool, fc→2
    (``lib/IDF/vgg16.py:28-207``)."""

    channels: tuple
    kernel: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (self.kernel, self.kernel),
                        strides=self.stride, padding=1 if self.kernel == 3
                        else 0, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = BatchStatNorm(ch, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(2, dtype=self.dtype, name="fc")(x)


class NetDInstance(nn.Module):
    """Instance domain head: fc 4096→100 (BN) → 100 (BN) → 2
    (``netD_da``, ``lib/IDF/vgg16.py:225-240``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(100, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(BatchStatNorm(100, name="bn1")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.Dense(100, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(BatchStatNorm(100, name="bn2")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return nn.Dense(2, dtype=self.dtype, name="fc3")(x)


class IDFModel(nn.Module):
    """Param subtrees: detector (invariant branch + shared RPN/head),
    backbone_b (private branch), netd_1/2/3 (+_b), netd_da, and the
    auxiliary target detector (rpn_aux, head_aux, cls/bbox_aux)."""

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    eta: float = 1.0      # GRL strength (reference eta=1.0)
    gamma: float = 5.0    # focal gamma (reference --gamma)
    efocal: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.net in ("vgg16", "vgg16_thin"), \
            "IDF ships with the VGG16 backbone"
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.backbone_b = VGG16Features(
            dtype=self.dtype, name="backbone_b",
            width=(0.25 if self.net == "vgg16_thin" else 1.0))
        self.netd_1 = NetDConv((256, 128, 128), kernel=1, stride=1,
                               name="netd_1")
        self.netd_1_b = NetDConv((256, 128, 128), kernel=1, stride=1,
                                 name="netd_1_b")
        self.netd_2 = NetDConv((512, 128, 128), name="netd_2")
        self.netd_2_b = NetDConv((512, 128, 128), name="netd_2_b")
        self.netd_3 = NetDConv((512, 128, 128), name="netd_3")
        self.netd_3_b = NetDConv((512, 128, 128), name="netd_3_b")
        self.netd_da = NetDInstance(name="netd_da")
        # auxiliary target detector on the private branch (reference
        # RCNN_rpn_t / _head_to_tail_t / RCNN_cls_score_t / bbox_pred_t)
        a = len(self.cfg.ANCHOR_SCALES) * len(self.cfg.ANCHOR_RATIOS)
        self.rpn_aux = RPNHead(a, dtype=self.dtype, name="rpn_aux")
        self.head_aux = VGG16Head(dtype=self.dtype, name="head_aux")
        self.cls_score_aux = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="cls_score_aux")
        out_dim = 4 if self.class_agnostic else 4 * self.num_classes
        self.bbox_pred_aux = nn.Dense(
            out_dim, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="bbox_pred_aux")

    def _dual_branch(self, im_data, deterministic):
        """Run both branches with DAM cross-attention; return per-block
        features of both branches + separation terms."""
        det = self.detector
        # block 1-3
        f1 = det.backbone(im_data, stage_range=(0, 3))
        f1_b = self.backbone_b(im_data, stage_range=(0, 3))
        dist1 = pairwise_dist(f1, f1_b)
        # block 4 + DAM cross-attention
        f2 = det.backbone(f1, stage_range=(3, 4))
        f2_b = self.backbone_b(f1_b, stage_range=(3, 4))
        att2 = dam(jax.lax.stop_gradient(f2))
        att2_b = dam(jax.lax.stop_gradient(f2_b))
        dist2 = pairwise_dist(f2 * att2_b, f2_b * att2_b)
        f2 = f2 * (1.0 + att2_b)
        f2_b = f2_b * (1.0 + att2)
        # block 5 + DAM
        f3 = det.backbone(f2, stage_range=(4, 5))
        f3_b = self.backbone_b(f2_b, stage_range=(4, 5))
        att3 = dam(jax.lax.stop_gradient(f3))
        att3_b = dam(jax.lax.stop_gradient(f3_b))
        dist3 = pairwise_dist(f3 * att3_b, f3_b * att3_b)
        f3 = f3 * (1.0 + att3_b)
        f3_b = f3_b * (1.0 + att3)
        return (f1, f2, f3), (f1_b, f2_b, f3_b), (dist1, dist2, dist3)

    def _domains(self, feats, feats_b, deterministic):
        """Adversarial (GRL) heads on the invariant branch, plain heads on
        the private branch."""
        f1, f2, f3 = feats
        f1_b, f2_b, f3_b = feats_b
        adv = (self.netd_1(grad_reverse(f1, self.eta),
                           deterministic=deterministic),
               self.netd_2(grad_reverse(f2, self.eta),
                           deterministic=deterministic),
               self.netd_3(grad_reverse(f3, self.eta),
                           deterministic=deterministic))
        priv = (self.netd_1_b(f1_b, deterministic=deterministic),
                self.netd_2_b(f2_b, deterministic=deterministic),
                self.netd_3_b(f3_b, deterministic=deterministic))
        return adv, priv

    def _aux_tail(self, base_feat_b, im_info, gt_boxes_p, training,
                  deterministic):
        """Auxiliary detector on the private branch, trained on pseudo
        labels (reference ``lib/IDF/faster_rcnn.py:144-191``)."""
        cfg = self.cfg
        rcfg = cfg.rpn_cfg(training)
        b = base_feat_b.shape[0]
        cls_score, bbox_deltas = self.rpn_aux(base_feat_b)
        fg_prob, logits = rpn_probs(cls_score)
        det = self.detector
        anchors = det.anchors_for(base_feat_b.shape[1], base_feat_b.shape[2])
        props = proposal_layer(
            fg_prob, bbox_deltas, im_info, anchors,
            pre_nms_top_n=rcfg.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=rcfg.RPN_POST_NMS_TOP_N,
            nms_thresh=rcfg.RPN_NMS_THRESH)
        rois = props.rois

        out = {"rpn_loss_cls": jnp.float32(0.0),
               "rpn_loss_box": jnp.float32(0.0),
               "rcnn_loss_cls": jnp.float32(0.0),
               "rcnn_loss_box": jnp.float32(0.0)}
        if training:
            tgt = anchor_target(gt_boxes_p, im_info, anchors, cfg,
                                self.make_rng("sampling"))
            flat_logits = logits.reshape(-1, 2)
            flat_labels = tgt.labels.reshape(-1)
            w = (flat_labels >= 0).astype(jnp.float32)
            out["rpn_loss_cls"] = softmax_cross_entropy(
                flat_logits, jnp.maximum(flat_labels, 0), w)
            h, wd = base_feat_b.shape[1], base_feat_b.shape[2]
            a4 = 4 * det.num_anchors
            out["rpn_loss_box"] = smooth_l1_loss(
                bbox_deltas, tgt.bbox_targets.reshape(b, h, wd, a4),
                jnp.broadcast_to(tgt.in_weights[..., None],
                                 tgt.in_weights.shape + (4,)).reshape(
                    b, h, wd, a4),
                jnp.broadcast_to(tgt.out_weights[..., None],
                                 tgt.out_weights.shape + (4,)).reshape(
                    b, h, wd, a4),
                sigma=3.0, reduce_dims=(1, 2, 3))
            samples = proposal_target(rois, gt_boxes_p, cfg,
                                      self.make_rng("sampling"))
            rois = samples.rois

        pooled = det.roi_features(base_feat_b, rois.reshape(-1, 5))
        fc7 = self.head_aux(pooled, deterministic=deterministic)
        cls_score = self.cls_score_aux(fc7)
        bbox_pred = self.bbox_pred_aux(fc7)

        if training:
            labels = samples.labels.reshape(-1)
            if not self.class_agnostic:
                bp = bbox_pred.reshape(bbox_pred.shape[0], -1, 4)
                bbox_pred = jnp.take_along_axis(
                    bp, labels[:, None, None].astype(jnp.int32),
                    axis=1)[:, 0, :]
            out["rcnn_loss_cls"] = softmax_cross_entropy(cls_score, labels)
            out["rcnn_loss_box"] = smooth_l1_loss(
                bbox_pred, samples.bbox_targets.reshape(-1, 4),
                samples.in_weights.reshape(-1, 4),
                samples.out_weights.reshape(-1, 4))
        n = rois.shape[1]
        out["rois"] = rois
        out["cls_prob"] = jax.nn.softmax(cls_score, axis=1).reshape(b, n, -1)
        out["bbox_pred"] = bbox_pred.reshape(b, n, -1)
        return out

    def _domain_ce(self, adv, priv, ins_logits, label: int):
        """0.5-weighted CE per block head + 0.25·focal on instances
        (reference IDF_train.py:245-276, 327-339; the train script's
        ``0.5·FL`` meets the loss-line's extra ``·0.5``)."""
        ce = sum(0.5 * softmax_cross_entropy(
            a, jnp.full((a.shape[0],), label, jnp.int32)) for a in adv)
        na = sum(0.5 * softmax_cross_entropy(
            p, jnp.full((p.shape[0],), label, jnp.int32)) for p in priv)
        ins = 0.25 * focal_loss(ins_logits, label, self.gamma, self.efocal)
        return ce, na, ins

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector
        deterministic = not training
        sep_w = src.get("separation")
        sep_w = (jnp.float32(1.0) if sep_w is None
                 else sep_w.reshape(-1)[0].astype(jnp.float32))

        # ---- source ----
        s_feats, s_feats_b, s_dists = self._dual_branch(src["im_data"],
                                                        deterministic)
        out = det.forward_from_features(
            s_feats[2], src["im_info"], src["gt_boxes"],
            training=training, supervised=training)
        s_ins = self.netd_da(grad_reverse(out["pooled_feat"], self.eta),
                             deterministic=deterministic)
        s_adv, s_priv = self._domains(s_feats, s_feats_b, deterministic)
        s_ce, s_na, s_ins_l = self._domain_ce(s_adv, s_priv, s_ins, 0)

        # ---- target: primary branch feeds the discriminators, private
        # branch feeds the auxiliary pseudo-label detector ----
        t_feats, t_feats_b, t_dists = self._dual_branch(tgt["im_data"],
                                                        deterministic)
        # primary pass with zeroed gt — its det losses are discarded
        # (reference IDF_train.py:306-310 zeroes gt for the target pass)
        zero_gt = jnp.zeros_like(tgt["gt_boxes"])
        t_main = det.forward_from_features(
            t_feats[2], tgt["im_info"], zero_gt,
            training=training, supervised=training)
        t_ins = self.netd_da(grad_reverse(t_main["pooled_feat"], self.eta),
                             deterministic=deterministic)
        t_adv, t_priv = self._domains(t_feats, t_feats_b, deterministic)
        t_ce, t_na, t_ins_l = self._domain_ce(t_adv, t_priv, t_ins, 1)

        aux = self._aux_tail(t_feats_b[2], tgt["im_info"], tgt["gt_boxes"],
                             training, deterministic)

        out.update({
            "aux_rpn_loss_cls": aux["rpn_loss_cls"],
            "aux_rpn_loss_box": aux["rpn_loss_box"],
            "aux_rcnn_loss_cls": aux["rcnn_loss_cls"],
            "aux_rcnn_loss_box": aux["rcnn_loss_box"],
            "adv_loss": s_ce + t_ce,
            "nonadv_loss": s_na + t_na,
            "ins_loss": s_ins_l + t_ins_l,
            # 0.001-weighted separation distances on attended block 4/5
            # features, both domains (reference faster_rcnn.py:81-98,
            # gated from epoch 3 by IDF_train.py:179)
            "se_loss": sep_w * 0.001 * (s_dists[1] + s_dists[2]
                                        + t_dists[1] + t_dists[2]),
            # raw per-block branch distances, both domains — surfaced for
            # the per-run record_dist.txt (reference IDF_train.py:399-405)
            "dist1_s": s_dists[0], "dist2_s": s_dists[1],
            "dist3_s": s_dists[2],
            "dist1_t": t_dists[0], "dist2_t": t_dists[1],
            "dist3_t": t_dists[2],
        })
        return out


def idf_infer(model: "IDFModel", variables, im_data, im_info, gt_boxes):
    """Eval forward for IDF_test: the IDF model tests with its OWN dual
    branch (fused invariant features → shared RPN/head) — the one method
    whose eval is not the vanilla detector (``methods/IDF/IDF_test.py:
    157-164``)."""

    def fwd(mdl):
        feats, _, _ = mdl._dual_branch(im_data, True)
        return mdl.detector.forward_from_features(
            feats[2], im_info, gt_boxes, training=False, supervised=False)

    return model.apply(variables, method=fwd)


def idf_loss(out: Dict[str, Any]) -> jnp.ndarray:
    """source det + 0.5·aux(pseudo) det + adversarial + non-adversarial +
    focal instance + separation (reference ``IDF_train.py:229-335``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    aux = 0.5 * (out["aux_rpn_loss_cls"] + out["aux_rpn_loss_box"]
                 + out["aux_rcnn_loss_cls"] + out["aux_rcnn_loss_box"])
    return (det + aux + out["adv_loss"] + out["nonadv_loss"]
            + out["ins_loss"] + out["se_loss"])
