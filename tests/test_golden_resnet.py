"""Golden full-detector parity for the ResNet101 path (VERDICT r2 item 7):
US-DAF's flagship backbone (``lib/US_DAF/DA.py:72``,
``lib/model/faster_rcnn/resnet.py:220-288``). Same composition pinning as
``test_golden_detector.py`` but through FrozenBN conv1..layer3 features →
RPN → proposal/NMS → RoIAlign → the layer4+mean-pool head — the seams
(NCHW↔NHWC, BN folding, per-RoI layer4, 2048-d head outputs) where the
ResNet path could silently diverge from the reference."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from test_rpn import _decode_oracle  # noqa: E402
from test_zoo_parity import _TBottleneck  # noqa: E402

from tllod_tpu.config import Config  # noqa: E402
from tllod_tpu.models.faster_rcnn import FasterRCNN  # noqa: E402
from tllod_tpu.ops.anchors import generate_anchors, shift_anchors  # noqa: E402
from tllod_tpu.ops.nms import nms_numpy  # noqa: E402
from tllod_tpu.ops.roi_align import roi_align_avg  # noqa: E402
from tllod_tpu.utils.checkpoint import restore_into  # noqa: E402
from tllod_tpu.zoo import convert_resnet  # noqa: E402

C = 5
PRE, POST = 120, 16


pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def _torch_resnet_trunk(depth=101):
    """conv1..layer4 with torchvision names (what convert_resnet reads)."""
    spec = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    mods = tnn.ModuleDict()
    mods["conv1"] = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    mods["bn1"] = tnn.BatchNorm2d(64)
    inplanes = 64
    for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), spec),
                                        start=1):
        stride = 1 if stage == 1 else 2
        blocks = []
        for i in range(n):
            s = stride if i == 0 else 1
            ds = None
            if i == 0:
                ds = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride=s, bias=False),
                    tnn.BatchNorm2d(planes * 4))
            blocks.append(_TBottleneck(inplanes, planes, s, ds))
            inplanes = planes * 4
        mods[f"layer{stage}"] = tnn.Sequential(*blocks)
    return mods


def _conv_t(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy()}


def _dense_t(m):
    return {"kernel": m.weight.detach().numpy().T,
            "bias": m.bias.detach().numpy()}


def test_res101_inference_golden_parity(rng):
    torch.manual_seed(3)
    c = Config()
    test = dataclasses.replace(c.TEST, RPN_PRE_NMS_TOP_N=PRE,
                               RPN_POST_NMS_TOP_N=POST, RPN_NMS_THRESH=0.7)
    cfg = dataclasses.replace(c, TEST=test, ANCHOR_SCALES=(2, 4, 8),
                              POOLING_MODE="align", MAX_NUM_GT_BOXES=10)
    a = len(cfg.ANCHOR_SCALES) * len(cfg.ANCHOR_RATIOS)

    trunk = _torch_resnet_trunk(101).eval()
    for _, m in trunk.named_modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in trunk.state_dict().items()
          if "num_batches" not in k}
    backbone_p, head_p = convert_resnet(sd, 101)
    assert head_p is not None

    rpn_conv = tnn.Conv2d(1024, 512, 3, padding=1)
    rpn_cls = tnn.Conv2d(512, 2 * a, 1)
    rpn_bbox = tnn.Conv2d(512, 4 * a, 1)
    cls_score = tnn.Linear(2048, C)
    bbox_pred = tnn.Linear(2048, 4 * C)
    with torch.no_grad():
        rpn_cls.weight.mul_(0.1)
        rpn_bbox.weight.mul_(0.05)
        cls_score.weight.mul_(0.1)
        bbox_pred.weight.mul_(0.05)

    model = FasterRCNN(num_classes=C, cfg=cfg, net="res101")
    im = (rng.randn(1, 64, 96, 3) * 30).astype(np.float32)
    im_info = np.array([[64, 96, 1.0]], np.float32)
    gt = np.zeros((1, cfg.MAX_NUM_GT_BOXES, 5), np.float32)
    template = model.init({"params": jax.random.PRNGKey(0),
                           "sampling": jax.random.PRNGKey(1)},
                          im, im_info, gt, training=False)["params"]
    params = restore_into(template, {
        "backbone": backbone_p, "head": head_p,
        "rpn": {"conv": _conv_t(rpn_conv), "cls_score": _conv_t(rpn_cls),
                "bbox_pred": _conv_t(rpn_bbox)},
        "cls_score": _dense_t(cls_score), "bbox_pred": _dense_t(bbox_pred)})

    out = model.apply({"params": params}, im, im_info, gt, training=False)
    rois = np.asarray(out["rois"])[0]
    valid = np.asarray(out["rois_valid"])[0]
    cls_prob = np.asarray(out["cls_prob"])[0]
    bbox_out = np.asarray(out["bbox_pred"])[0]

    # ---- independent reference forward (resnet.py:105-135 eval path) ----
    with torch.no_grad():
        t = torch.from_numpy(im.transpose(0, 3, 1, 2))
        t = tF.relu(trunk["bn1"](trunk["conv1"](t)))
        t = tF.max_pool2d(t, 3, stride=2, padding=1)
        for stage in ("layer1", "layer2", "layer3"):
            t = trunk[stage](t)
        rx = tF.relu(rpn_conv(t))
        tc = rpn_cls(rx).numpy()[0]
        tb = rpn_bbox(rx).numpy()[0]
    fh, fw = t.shape[2], t.shape[3]
    bg, fg = tc[:a], tc[a:]
    fg_prob = np.exp(fg) / (np.exp(bg) + np.exp(fg))
    scores_hwa = fg_prob.transpose(1, 2, 0).reshape(-1)
    deltas_hwa = tb.transpose(1, 2, 0).reshape(-1, 4)

    anchors = shift_anchors(fh, fw, cfg.FEAT_STRIDE[0],
                            generate_anchors(base_size=cfg.FEAT_STRIDE[0],
                                             ratios=cfg.ANCHOR_RATIOS,
                                             scales=cfg.ANCHOR_SCALES))
    boxes = _decode_oracle(anchors, deltas_hwa, 64, 96)
    order = np.argsort(-scores_hwa)[:PRE]
    dets = np.concatenate([boxes[order], scores_hwa[order, None]], 1)
    keep = nms_numpy(dets, 0.7)[:POST]
    ref_rois = dets[keep, :4]
    n = len(keep)

    assert valid[:n].all() and not valid[n:].any()
    np.testing.assert_allclose(rois[:n, 1:], ref_rois, rtol=1e-3, atol=5e-3)
    assert (rois[:, 0] == 0).all()

    # RoIAlign on the TORCH layer3 features, then torch layer4 head
    feat_nhwc = jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    ref_roi5 = np.concatenate([np.zeros((n, 1), np.float32),
                               ref_rois.astype(np.float32)], 1)
    pooled = np.asarray(roi_align_avg(
        feat_nhwc, jnp.asarray(ref_roi5), out_size=7,
        spatial_scale=1.0 / cfg.FEAT_STRIDE[0]))          # (n, 7, 7, 1024)
    with torch.no_grad():
        h4 = trunk["layer4"](torch.from_numpy(
            pooled.transpose(0, 3, 1, 2).copy()))
        hf = h4.mean(3).mean(2)                            # (n, 2048)
        ref_cls_prob = tF.softmax(cls_score(hf), dim=1).numpy()
        ref_bbox = bbox_pred(hf).numpy()

    np.testing.assert_allclose(cls_prob[:n], ref_cls_prob,
                               rtol=5e-2, atol=1e-2)
    np.testing.assert_allclose(bbox_out[:n], ref_bbox, rtol=5e-2, atol=3e-2)
    assert cls_prob[:n].std() > 1e-4
