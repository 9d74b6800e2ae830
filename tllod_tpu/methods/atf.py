"""ATF — Asymmetric Tri-way Faster R-CNN.

Rebuild of ``lib/ATF/`` (SURVEY §2.4): the source image runs through TWO
backbone branches — the main branch and an *ancillary* branch deep-copied at
init (``lib/ATF/vgg16.py:45-59``; both share the frozen conv1/conv2 prefix) —
and BOTH branches feed the SAME RPN and box head with summed supervised
losses (``lib/ATF/faster_rcnn.py:121-134, 231-240``). Domain alignment is
asymmetric: image-level discriminators (plain 2-class heads on conv3/4/5)
see the *ancillary*-branch features of the source image vs the *main*-branch
features of the target image; the instance discriminator sees head features
of the full proposal set — 2000 RoIs per side, with the reference mutating
``cfg.TEST.RPN_POST_NMS_TOP_N`` to match at train time
(``lib/ATF/faster_rcnn.py:260``; here an explicit ``post_nms_top_n``
override).

Total loss (``methods/ATF/ATF_train.py:405-408``):
    det + λ·(7·img + ins + 7·tgt_img + tgt_ins).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from tllod_tpu.config import Config
from tllod_tpu.methods.da_modules import (ImageDA, InstanceDA,
                                          blocked_instance_labels,
                                          image_da_loss)
from tllod_tpu.ops.losses import binary_cross_entropy
from tllod_tpu.models.backbones import VGG16Features
from tllod_tpu.models.faster_rcnn import FasterRCNN


class ATFModel(nn.Module):
    """Param subtrees: detector, backbone_anc, img_da3/4/5, ins_da.

    ``backbone_anc`` must be initialized from the same pretrained weights as
    the main backbone (the reference's ``copy.deepcopy``); the training entry
    point loads the caffe weights into both.
    """

    num_classes: int
    cfg: Config
    net: str = "vgg16"
    class_agnostic: bool = False
    grl_alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.net in ("vgg16", "vgg16_thin"), \
            "ATF ships with the VGG16 backbone"
        self.detector = FasterRCNN(
            num_classes=self.num_classes, cfg=self.cfg, net=self.net,
            class_agnostic=self.class_agnostic, dtype=self.dtype,
            name="detector")
        self.backbone_anc = VGG16Features(
            dtype=self.dtype, name="backbone_anc",
            width=(0.25 if self.net == "vgg16_thin" else 1.0))
        self.img_da3 = ImageDA(alpha=self.grl_alpha, dtype=self.dtype,
                               name="img_da3")
        self.img_da4 = ImageDA(alpha=self.grl_alpha, dtype=self.dtype,
                               name="img_da4")
        self.img_da5 = ImageDA(alpha=self.grl_alpha, dtype=self.dtype,
                               name="img_da5")
        self.ins_da = InstanceDA(alpha=self.grl_alpha, dtype=self.dtype,
                                 name="ins_da")

    def _image_losses(self, taps, domain):
        c3, c4, c5 = taps
        return (image_da_loss(self.img_da3(c3), domain)
                + image_da_loss(self.img_da4(c4), domain)
                + image_da_loss(self.img_da5(c5), domain))

    def __call__(self, src: Dict[str, Any], tgt: Dict[str, Any], *,
                 training: bool = True) -> Dict[str, Any]:
        det = self.detector
        deterministic = not training
        train_post_n = self.cfg.TRAIN.RPN_POST_NMS_TOP_N

        # ---- source through both branches, summed supervised losses ----
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

        # ---- target through the main branch, RPN eval with train-sized
        #      proposal count (reference :258-264) ----
        t_taps = det.features(tgt["im_data"], return_taps=True)
        t_out = det.forward_from_features(
            t_taps[-1], tgt["im_info"], tgt["gt_boxes"],
            training=training, supervised=False,
            post_nms_top_n=train_post_n)

        # ---- image DA: ancillary-branch source vs main-branch target ----
        out["da_img_loss"] = self._image_losses(s_taps_anc, src["domain"])
        out["tgt_da_img_loss"] = self._image_losses(t_taps, tgt["domain"])

        # ---- instance DA on the FULL proposal sets (2000 RoIs/side):
        #      source side uses ancillary-branch head features of its raw
        #      proposals (reference :290-293, :351-357) ----
        anc_rois = anc["rpn_rois"]
        anc_pooled = det.roi_features(s_taps_anc[-1],
                                      anc_rois.reshape(-1, 5))
        anc_fc7 = det.box_head(anc_pooled, deterministic=deterministic)
        ins_prob = self.ins_da(anc_fc7, deterministic=deterministic)
        # the reference's hard-coded 256-row label blocks: over the full
        # 2000-proposal set only the first 256 source rows are labeled 1
        # (lib/ATF/LabelResizeLayer.py:47-60) — see blocked_instance_labels
        out["da_ins_loss"] = binary_cross_entropy(
            ins_prob, blocked_instance_labels(src["domain"],
                                              ins_prob.shape[0]))

        t_ins_prob = self.ins_da(t_out["pooled_feat"],
                                 deterministic=deterministic)
        out["tgt_da_ins_loss"] = binary_cross_entropy(
            t_ins_prob, blocked_instance_labels(tgt["domain"],
                                                t_ins_prob.shape[0]))
        return out


def atf_loss(out: Dict[str, Any], lamda: float = 0.1) -> jnp.ndarray:
    """det + λ·(7·img + ins + 7·tgt_img + tgt_ins)
    (reference ``ATF_train.py:405-408``)."""
    det = (out["rpn_loss_cls"] + out["rpn_loss_box"]
           + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
    return det + lamda * (7.0 * out["da_img_loss"] + out["da_ins_loss"]
                          + 7.0 * out["tgt_da_img_loss"]
                          + out["tgt_da_ins_loss"])
