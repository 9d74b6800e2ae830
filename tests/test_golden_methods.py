"""Golden TRAIN-MODE loss parity for the method layer (VERDICT r3 item 3).

The detector is already golden-pinned (test_golden_detector/_resnet); the
method layer's GRL'd discriminator losses are where a silent sign /
weighting / normalization slip would cost the published mAPs without any
test noticing (synthetic overfits prove "learns", not "matches"). Here the
reference modules' train-mode loss math is transcribed in torch (CPU, eval
dropout) on fixed inputs with SHARED weights, and our method wrappers must
reproduce every loss term to tolerance:

  * DAF img/ins/cst, source AND target (``lib/DAF/faster_rcnn.py:181-224``,
    ``lib/DAF/DA.py:36-73``) — pinned through the real ``DAFModel._domain_
    terms`` composition via flax method binding, including the
    channel-1(source)/channel-0(target) consistency quirk.
  * MAD multi-view: the symmetric-pairwise view difference, the
    ``exp(-Σ)`` image / ``1/Σ`` instance discrepancy losses, and the MV
    consistency term (``lib/MAD/faster_rcnn.py:319-331, 430-440,
    470-481``), plus the InstanceDA_En head + BCE through the real
    ``InstanceDAEn`` module with shared weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tllod_tpu.methods.daf import DAFModel  # noqa: E402
from tllod_tpu.methods.mad import (MADModel, InstanceDAEn, _sym_diff,  # noqa: E402
                                   mv_consistency)

ATOL = 2e-5


def _conv_t(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}


def _dense_t(m):
    return {"kernel": m.weight.detach().numpy().T,
            "bias": m.bias.detach().numpy()}


def _torch_image_da(dim):
    """_ImageDA transcription (lib/DAF/DA.py:36-50): 1x1 conv dim→512
    (bias-free) → ReLU → 1x1 conv 512→2 (bias-free)."""
    conv1 = tnn.Conv2d(dim, 512, 1, bias=False)
    conv2 = tnn.Conv2d(512, 2, 1, bias=False)
    return conv1, conv2


def _torch_instance_da(in_dim):
    """_InstanceDA transcription (lib/DAF/DA.py:53-73), eval-mode dropout."""
    return (tnn.Linear(in_dim, 1024), tnn.Linear(1024, 1024),
            tnn.Linear(1024, 1))


def _torch_daf_terms(feat_nchw, fc7_t, conv1, conv2, fcs, domain_value,
                     consistency_channel):
    """The reference's DA loss math (lib/DAF/faster_rcnn.py:175-220):
    img = nll_loss(log_softmax(score), label_map);
    ins = BCELoss()(sigmoid(mlp(fc7)), label);
    cst = MSELoss(size_average=False)(sigmoid, mean softmax prob[channel])."""
    with torch.no_grad():
        score = conv2(tF.relu(conv1(feat_nchw)))                # (B,2,H,W)
        label = torch.full(score.shape[0:1] + score.shape[2:],
                           int(domain_value), dtype=torch.long)
        img = tF.nll_loss(tF.log_softmax(score, dim=1), label)

        x = fc7_t
        x = tF.relu(fcs[0](x))
        x = tF.relu(fcs[1](x))
        sig = torch.sigmoid(fcs[2](x))                          # (R,1)
        ins_label = torch.full_like(sig, float(domain_value))
        ins = tF.binary_cross_entropy(sig, ins_label)

        cprob = tF.softmax(score, dim=1)[:, consistency_channel, :, :]
        cst = ((sig - cprob.mean()) ** 2).sum()
    return float(img), float(ins), float(cst)


@pytest.mark.slow  # full model init
def test_daf_losses_golden(rng):
    """All six DAF DA terms through the real DAFModel._domain_terms
    composition must match the torch transcription bit-for-bit (shared
    weights, eval dropout)."""
    import __graft_entry__ as ge

    torch.manual_seed(11)
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
    src = ge._make_batch(1, 64, 64, domain=1, seed=0)
    tgt = ge._make_batch(1, 64, 64, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt,
        training=True)["params"]

    feat_ch, head_dim = 128, 512                       # vgg16_thin widths
    b, h, w, r = 1, 6, 9, 16
    feat = np.random.RandomState(3).randn(b, h, w, feat_ch).astype(
        np.float32)
    fc7 = np.random.RandomState(4).randn(b * r, head_dim).astype(np.float32)

    conv1, conv2 = _torch_image_da(feat_ch)
    fcs = _torch_instance_da(head_dim)
    params = dict(params)
    params["img_da"] = {"conv1": _conv_t(conv1), "conv2": _conv_t(conv2)}
    params["ins_da"] = {"dc_ip1": _dense_t(fcs[0]),
                        "dc_ip2": _dense_t(fcs[1]),
                        "classifier": _dense_t(fcs[2])}

    feat_t = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    fc7_t = torch.from_numpy(fc7)

    for domain_value, channel in ((1, 1), (0, 0)):     # source / target
        want_img, want_ins, want_cst = _torch_daf_terms(
            feat_t, fc7_t, conv1, conv2, fcs, domain_value, channel)
        got_img, got_ins, got_cst = model.apply(
            {"params": params}, jnp.asarray(feat), jnp.asarray(fc7),
            jnp.full((b,), float(domain_value), jnp.float32), r, channel,
            True,  # deterministic (torch side has no dropout active)
            method=DAFModel._domain_terms)
        np.testing.assert_allclose(float(got_img), want_img, atol=ATOL,
                                   err_msg=f"img domain={domain_value}")
        np.testing.assert_allclose(float(got_ins), want_ins, atol=ATOL,
                                   err_msg=f"ins domain={domain_value}")
        np.testing.assert_allclose(float(got_cst), want_cst, atol=1e-4,
                                   err_msg=f"cst domain={domain_value}")


def test_mad_pairwise_dis_golden():
    """MAD view-difference math: symmetric pairwise MSE over 3 views × 2
    sources, exp(-Σ) for image views, 1/Σ for instance views (reference
    lib/MAD/faster_rcnn.py:319-331, 430-440)."""
    rs = np.random.RandomState(7)
    fs1 = [rs.randn(2, 5, 9, 16).astype(np.float32) for _ in range(3)]
    fs2 = [rs.randn(2, 5, 9, 16).astype(np.float32) for _ in range(3)]

    def t_mse(a, b):
        return tF.mse_loss(torch.from_numpy(a), torch.from_numpy(b))

    want = 0.0
    for i in range(3):
        for j in range(i + 1, 3):
            want += (t_mse(fs1[i], fs1[j]) + t_mse(fs1[j], fs1[i])) / 2
            want += (t_mse(fs2[i], fs2[j]) + t_mse(fs2[j], fs2[i])) / 2
    want = float(want)

    got = float(MADModel._pairwise([jnp.asarray(f) for f in fs1],
                                   [jnp.asarray(f) for f in fs2]))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.exp(-got)), np.exp(-want),
                               rtol=1e-5)
    np.testing.assert_allclose(1.0 / (got + 1e-8), 1.0 / (want + 1e-8),
                               rtol=1e-5)

    # the building block itself: (mse(a, b.detach()) + mse(b, a.detach()))/2
    a, b = fs1[0], fs1[1]
    np.testing.assert_allclose(
        float(_sym_diff(jnp.asarray(a), jnp.asarray(b))),
        float((t_mse(a, b) + t_mse(b, a)) / 2), rtol=1e-6)


def test_mad_mv_consistency_and_insda_golden():
    """MV consistency (sum-MSE between averaged sigmoid and detached mean
    image prob, channel 1 view-1 / channel 0 view-2) and the InstanceDA_En
    head + BCE with shared torch weights (lib/MAD/DA.py:148-168,
    faster_rcnn.py:470-481)."""
    torch.manual_seed(13)
    rs = np.random.RandomState(9)
    r = 24
    probs = rs.rand(r, 1).astype(np.float32)
    score = rs.randn(2, 5, 9, 2).astype(np.float32)   # NHWC image score

    score_t = torch.from_numpy(score.transpose(0, 3, 1, 2))
    for channel in (1, 0):
        cprob = tF.softmax(score_t, dim=1)[:, channel, :, :]
        want = float(((torch.from_numpy(probs) - cprob.mean()) ** 2).sum())
        got = float(mv_consistency(jnp.asarray(probs), jnp.asarray(score),
                                   channel))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    # InstanceDA_En: GRL → 512→256 → 256→64 → 64→1 sigmoid + BCE
    enc = rs.randn(r, 512).astype(np.float32)
    ip1, ip2, clf = (tnn.Linear(512, 256), tnn.Linear(256, 64),
                     tnn.Linear(64, 1))
    with torch.no_grad():
        sig = torch.sigmoid(clf(tF.relu(ip2(tF.relu(
            ip1(torch.from_numpy(enc)))))))
        want_bce = float(tF.binary_cross_entropy(
            sig, torch.ones_like(sig)))

    head = InstanceDAEn()
    p = {"dc_ip1": _dense_t(ip1), "dc_ip2": _dense_t(ip2),
         "classifier": _dense_t(clf)}
    got_prob = head.apply({"params": p}, jnp.asarray(enc),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(got_prob),
                               sig.numpy(), atol=ATOL)
    from tllod_tpu.ops.losses import binary_cross_entropy
    got_bce = float(binary_cross_entropy(got_prob,
                                         jnp.ones_like(got_prob)))
    np.testing.assert_allclose(got_bce, want_bce, atol=ATOL)


# ---------------------------------------------------------------------------
# Round-5 additions: the remaining six methods' distinctive loss math, pinned
# against torch transcriptions of the reference modules with SHARED weights
# (VERDICT r4 item 1). Conventions: NCHW torch vs NHWC jax, eval-mode dropout
# on both sides, torch train-mode (batch-stat) BatchNorm vs BatchStatNorm.
# ---------------------------------------------------------------------------


def _share_conv(m):
    p = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def _share_bn(m_weight, m_bias):
    return {"scale": m_weight.detach().numpy(),
            "bias": m_bias.detach().numpy()}


# ------------------------------ US-DAF -------------------------------------


def _torch_bce_margin(x_sigmoid, label):
    """BCEloss_margin transcription (lib/US_DAF/faster_rcnn.py:25-33)."""
    NEAR_0 = 1e-10
    scale_weight = torch.ones(len(label), 3)
    bce = -(label * torch.log(x_sigmoid + NEAR_0)
            + (1 - label) * torch.log(1 - x_sigmoid + NEAR_0))
    n = len(bce)
    a = (bce[:, 0] > 0.5).reshape(n, -1).float()
    weight = torch.cat([a, scale_weight], dim=1)
    return (bce * weight).mean()


@pytest.mark.slow  # full model init
def test_us_daf_losses_golden():
    """US-DAF's four DA terms through the real ``USDAFModel._terms``
    composition vs the torch transcription of ``lib/US_DAF/faster_rcnn.py:
    25-33, 264-282`` + ``DA.py:36-51, 69-89`` with shared weights: 1-channel
    sigmoid image BCE, and the scale-aware multi-label instance head under
    margin-BCE filtering (domain column zeroed unless its own BCE > 0.5).
    The r4 saturation clip (us_daf.py:104) is a no-op in this unsaturated
    regime — exactly the parity VERDICT r4 asked for."""
    import __graft_entry__ as ge
    from tllod_tpu.methods.us_daf import USDAFModel

    torch.manual_seed(23)
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = USDAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
    src = ge._make_batch(1, 64, 64, domain=1, seed=0)
    tgt = ge._make_batch(1, 64, 64, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt,
        training=True)["params"]

    feat_ch, head_dim = 128, 512                     # vgg16_thin widths
    b, h, w, r = 1, 6, 9, 16
    rs = np.random.RandomState(5)
    feat = rs.randn(b, h, w, feat_ch).astype(np.float32)
    fc7 = (2.0 * rs.randn(b * r, head_dim)).astype(np.float32)
    # RoIs spanning all three area buckets (≤400 / (400, 1e4) / ≥1e4 px²)
    rois = np.zeros((b, r, 5), np.float32)
    for i in range(r):
        side = [10.0, 50.0, 150.0][i % 3] + i       # areas ~1e2 / 2.5e3 / 2e4
        x0, y0 = rs.rand(2) * 20
        rois[0, i] = [0, x0, y0, x0 + side, y0 + side * 0.9]

    conv1 = tnn.Conv2d(feat_ch, 512, 1, bias=False)
    conv2 = tnn.Conv2d(512, 1, 1, bias=False)
    fc1, fc2, fc3 = (tnn.Linear(head_dim, 1024), tnn.Linear(1024, 1024),
                     tnn.Linear(1024, 4))
    with torch.no_grad():
        fc3.weight.mul_(12.0)      # spread sigmoids so the margin filter
        fc3.bias.mul_(0.0)         # keeps some rows and drops others
    params = dict(params)
    params["img_da"] = {"conv1": _conv_t(conv1), "conv2": _conv_t(conv2)}
    params["ins_da"] = {"dc_ip1": _dense_t(fc1), "dc_ip2": _dense_t(fc2),
                        "classifier": _dense_t(fc3)}

    feat_t = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    fc7_t = torch.from_numpy(fc7)
    rois_t = torch.from_numpy(rois[0])

    with torch.no_grad():
        img_prob = torch.sigmoid(conv2(tF.relu(conv1(feat_t))))
        ins_sig = torch.sigmoid(fc3(tF.relu(fc2(tF.relu(fc1(fc7_t))))))
        # scale labels per the reference's per-roi area loop (:206-231)
        area = (rois_t[:, 3] - rois_t[:, 1]) * (rois_t[:, 4] - rois_t[:, 2])
        small = (area <= 400).float()[:, None]
        large = (area >= 10000).float()[:, None]
        middle = ((area > 400) & (area < 10000)).float()[:, None]
        assert float(small.sum()) and float(middle.sum()) \
            and float(large.sum()), "all three buckets must be exercised"

    for domain_value in (1.0, 0.0):
        with torch.no_grad():
            tlabel = torch.full_like(img_prob, domain_value).view(-1, 1)
            want_img = float(tF.binary_cross_entropy(
                img_prob.view(-1, 1), tlabel))
            dom = torch.full((r, 1), domain_value)
            label_ins = torch.cat([dom, small, middle, large], dim=1)
            # the margin filter must actually bite: some domain-column BCEs
            # above 0.5 and some below
            bce0 = -(label_ins[:, 0] * torch.log(ins_sig[:, 0] + 1e-10)
                     + (1 - label_ins[:, 0])
                     * torch.log(1 - ins_sig[:, 0] + 1e-10))
            kept = int((bce0 > 0.5).sum())
            assert 0 < kept < r, f"margin filter not exercised (kept={kept})"
            want_ins = float(_torch_bce_margin(ins_sig, label_ins))

        got_img, got_ins = model.apply(
            {"params": params}, jnp.asarray(feat), jnp.asarray(fc7),
            jnp.asarray(rois), domain_value, True,
            method=USDAFModel._terms)
        np.testing.assert_allclose(float(got_img), want_img, atol=ATOL,
                                   err_msg=f"img domain={domain_value}")
        np.testing.assert_allclose(float(got_ins), want_ins, atol=ATOL,
                                   err_msg=f"ins domain={domain_value}")


# ------------------------------- ATF ----------------------------------------


def test_atf_blocked_instance_da_golden():
    """ATF instance DA (lib/ATF/faster_rcnn.py:44-64, 324-326): sigmoid MLP
    + BCELoss against the InstanceLabelResizeLayer's EXACT hard-coded
    256-row-block labels (LabelResizeLayer.py:47-60) — over a 600-proposal
    set only the first 256 source rows carry label 1. (The image-level term
    is DAF's 2-class NLL, already pinned by test_daf_losses_golden; ATF's
    ``ignore_index=-1`` never binds since the label maps are 0/1.)"""
    from tllod_tpu.methods.da_modules import (InstanceDA,
                                              blocked_instance_labels)
    from tllod_tpu.ops.losses import binary_cross_entropy

    torch.manual_seed(29)
    in_dim, rows = 96, 600
    fc1, fc2, fc3 = (tnn.Linear(in_dim, 1024), tnn.Linear(1024, 1024),
                     tnn.Linear(1024, 1))
    feat = np.random.RandomState(11).randn(rows, in_dim).astype(np.float32)

    head = InstanceDA()
    p = {"dc_ip1": _dense_t(fc1), "dc_ip2": _dense_t(fc2),
         "classifier": _dense_t(fc3)}
    probs = head.apply({"params": p}, jnp.asarray(feat), deterministic=True)

    with torch.no_grad():
        sig = torch.sigmoid(fc3(tF.relu(fc2(tF.relu(
            fc1(torch.from_numpy(feat)))))))
    np.testing.assert_allclose(np.asarray(probs), sig.numpy(), atol=ATOL)

    for domain in (1, 0):
        # InstanceLabelResizeLayer transcription: zeros, then
        # resized_lbs[i*256:(i+1)*256] = lbs[i]
        resized = np.zeros((rows,), np.float32)
        resized[0:256] = domain
        with torch.no_grad():
            want = float(tF.binary_cross_entropy(
                sig, torch.from_numpy(resized)[:, None]))
        got = float(binary_cross_entropy(
            probs, blocked_instance_labels(jnp.asarray([domain]), rows)))
        np.testing.assert_allclose(got, want, atol=ATOL,
                                   err_msg=f"domain={domain}")

    # multi-image layout: block i takes image i's label, overflow rows 0
    lbl = np.asarray(blocked_instance_labels(jnp.asarray([1, 0]), 600))[:, 0]
    ref = np.zeros((600,), np.float32)
    ref[0:256] = 1.0
    ref[256:512] = 0.0
    np.testing.assert_array_equal(lbl, ref)


# ------------------------------- MAF ----------------------------------------


class _TorchDRM(tnn.Module):
    """DRM transcription (lib/MAF/drm.py:10-42): 1x1 reduce + ReLU, crop to
    scale multiples, chunk HxW into scale-size tiles stacked into channels."""

    def __init__(self, in_dim, inner, scale):
        super().__init__()
        self.conv = tnn.Conv2d(in_dim, inner, 1, bias=False)
        self.scale = scale

    def forward(self, x):
        low = tF.relu(self.conv(x))
        s = self.scale
        hn, wn = low.size(2) // s, low.size(3) // s
        low = low[:, :, :s * hn, :s * wn]
        rows = []
        for hc in torch.chunk(low, hn, dim=2):
            cols = [c.reshape(c.size(0), c.size(1) * s * s, 1, 1)
                    for c in torch.chunk(hc, wn, dim=3)]
            rows.append(torch.cat(cols, dim=3))
        return torch.cat(rows, dim=2)


def test_maf_drm_image_head_golden():
    """The full _ImageDA_drm head (lib/MAF/DA.py:128-149): GRL → DRM →
    1x1(512) → ReLU → 1x1(2), then the NLL image loss — shared weights,
    odd H/W so the DRM crop path is exercised."""
    from tllod_tpu.methods.maf import ImageDADRM
    from tllod_tpu.methods.da_modules import image_da_loss

    torch.manual_seed(31)
    in_dim, inner, scale = 24, 8, 2
    b, h, w = 1, 13, 17                       # 13, 17 not multiples of 2
    feat = np.random.RandomState(13).randn(b, h, w, in_dim).astype(
        np.float32)

    drm = _TorchDRM(in_dim, inner, scale)
    conv1 = tnn.Conv2d(inner * scale * scale, 512, 1, bias=False)
    conv2 = tnn.Conv2d(512, 2, 1, bias=False)

    head = ImageDADRM(inner, scale)
    p = {"drm_conv": _conv_t(drm.conv), "conv1": _conv_t(conv1),
         "conv2": _conv_t(conv2)}
    got_logits = head.apply({"params": p}, jnp.asarray(feat))

    with torch.no_grad():
        score = conv2(tF.relu(conv1(drm(
            torch.from_numpy(feat.transpose(0, 3, 1, 2))))))
    np.testing.assert_allclose(
        np.asarray(got_logits),
        score.numpy().transpose(0, 2, 3, 1), atol=ATOL)

    for domain in (1, 0):
        with torch.no_grad():
            label = torch.full(score.shape[0:1] + score.shape[2:], domain,
                               dtype=torch.long)
            want = float(tF.nll_loss(tF.log_softmax(score, dim=1), label))
        got = float(image_da_loss(got_logits, jnp.asarray([domain])))
        np.testing.assert_allclose(got, want, atol=ATOL)


class _TorchWGRL(torch.autograd.Function):
    """WGRLayer transcription (lib/MAF/DA.py:34-53)."""

    @staticmethod
    def forward(ctx, input, score, dc_label):
        ctx.alpha = 0.2
        ctx.score = score
        ctx.dc_label = dc_label
        return input.view_as(input)

    @staticmethod
    def backward(ctx, grad_output):
        weight = ctx.score[:, int(ctx.dc_label)].view(grad_output.shape[0],
                                                      1)
        weight = weight.repeat(1, grad_output.shape[1])
        return grad_output.neg() * weight * ctx.alpha, None, None


def test_maf_wgrl_instance_golden():
    """MAF's confidence-weighted instance DA (lib/MAF/DA.py:79-105 +
    CrossEntropyLoss, faster_rcnn.py:207-211): forward CE loss AND the
    WGRL-scaled input cotangent must both match torch autograd — the vjp
    pin VERDICT r4 asked for explicitly."""
    from tllod_tpu.methods.maf import InstanceDAWeighted
    from tllod_tpu.ops.losses import softmax_cross_entropy

    torch.manual_seed(37)
    in_dim, rows = 72, 20
    fc1, fc2, fc3 = (tnn.Linear(in_dim, 1024), tnn.Linear(1024, 1024),
                     tnn.Linear(1024, 2))
    feat = np.random.RandomState(17).randn(rows, in_dim).astype(np.float32)

    head = InstanceDAWeighted()
    p = {"dc_ip1": _dense_t(fc1), "dc_ip2": _dense_t(fc2),
         "classifier": _dense_t(fc3)}

    def mlp_t(x):
        return fc3(tF.relu(fc2(tF.relu(fc1(x)))))

    for domain in (1, 0):
        x_t = torch.from_numpy(feat).requires_grad_(True)
        score = tF.softmax(mlp_t(x_t.detach()), dim=1)
        out = mlp_t(_TorchWGRL.apply(x_t, score, domain))
        label_t = torch.full((rows,), domain, dtype=torch.long)
        loss_t = tF.cross_entropy(out, label_t)
        loss_t.backward()

        dom = jnp.asarray([domain], jnp.int32)

        def loss_fn(f):
            logits = head.apply({"params": p}, f, dom)
            return softmax_cross_entropy(
                logits, jnp.full((rows,), domain, jnp.int32))

        got_loss, got_grad = jax.value_and_grad(loss_fn)(jnp.asarray(feat))
        np.testing.assert_allclose(float(got_loss), float(loss_t),
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(got_grad),
                                   x_t.grad.numpy(), atol=ATOL,
                                   err_msg=f"WGRL cotangent domain={domain}")


# ------------------------------ PA-ATF --------------------------------------


def test_pa_atf_partial_image_da_golden():
    """PA-ATF's masked image discriminator (lib/PA_ATF/faster_rcnn.py:
    68-104): mask path 5x5/s3 conv → ReLU → 2x2 maxpool → 3x3/s2 conv →
    global-max sigmoid; masked features → 1x1(dim/2) → ReLU → 1x1(1) →
    sigmoid → BCE. Shared weights, both domains."""
    from tllod_tpu.methods.pa_atf import PartialImageDA
    from tllod_tpu.ops.losses import binary_cross_entropy

    torch.manual_seed(41)
    dim, b, h, w = 16, 1, 29, 33
    feat = np.random.RandomState(19).randn(b, h, w, dim).astype(np.float32)

    convm1 = tnn.Conv2d(dim, dim, 5, stride=3, bias=True)
    convm2 = tnn.Conv2d(dim, dim, 3, stride=2, bias=True)
    conv1 = tnn.Conv2d(dim, dim // 2, 1, bias=False)
    conv2 = tnn.Conv2d(dim // 2, 1, 1, bias=False)

    head = PartialImageDA()
    p = {"mask_conv1": _share_conv(convm1), "mask_conv2": _share_conv(convm2),
         "conv1": _share_conv(conv1), "conv2": _share_conv(conv2)}
    got_probs, got_mask = head.apply({"params": p}, jnp.asarray(feat))

    with torch.no_grad():
        xx = torch.from_numpy(feat.transpose(0, 3, 1, 2))
        x_mask = tF.relu(convm1(xx))
        x_mask = convm2(tF.max_pool2d(x_mask, 2, 2))
        mask = torch.sigmoid(tF.adaptive_max_pool2d(x_mask, (1, 1)))
        x = conv2(tF.relu(conv1(xx * mask)))
        probs = torch.sigmoid(x)

    np.testing.assert_allclose(np.asarray(got_mask).reshape(-1),
                               mask.numpy().reshape(-1), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(got_probs), probs.numpy().transpose(0, 2, 3, 1),
        atol=ATOL)
    for domain in (1, 0):
        with torch.no_grad():
            want = float(tF.binary_cross_entropy(
                probs, torch.full_like(probs, domain)))
        got = float(binary_cross_entropy(
            got_probs, jnp.full(got_probs.shape, domain, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=ATOL)


def test_pa_atf_instance_l1_and_club_golden():
    """PA-ATF's L1 instance loss (faster_rcnn.py:57-66: mean |sigmoid −
    label|) and the CLUB same/shuffled MI discriminator (:108-148: concat →
    3x3/s2 conv → ReLU → 1x1(128) → ReLU → fc(2); NLL to 'same'=1 on
    matched pairs and 'diff'=0 on batch-shuffled pairs). The shuffle
    permutation is read out of the jax side and replayed in torch; all gt
    slots valid so the masked means equal the reference's plain means."""
    from tllod_tpu.methods.pa_atf import CLUBHead, InstanceDAL1

    torch.manual_seed(43)
    rs = np.random.RandomState(23)

    # --- instance L1 ---
    in_dim, rows = 64, 18
    fc1, fc2, fc3 = (tnn.Linear(in_dim, 1024), tnn.Linear(1024, 1024),
                     tnn.Linear(1024, 1))
    feat = rs.randn(rows, in_dim).astype(np.float32)
    ins = InstanceDAL1()
    p = {"dc_ip1": _dense_t(fc1), "dc_ip2": _dense_t(fc2),
         "classifier": _dense_t(fc3)}
    got_sig = ins.apply({"params": p}, jnp.asarray(feat), deterministic=True)
    with torch.no_grad():
        sig = torch.sigmoid(fc3(tF.relu(fc2(tF.relu(
            fc1(torch.from_numpy(feat)))))))
        for domain in (1.0, 0.0):
            want = float(torch.abs(sig - domain).mean())
            got = float(jnp.abs(got_sig - domain).mean())
            np.testing.assert_allclose(got, want, atol=ATOL)

    # --- CLUB ---
    dim, r = 12, 8
    xa = rs.randn(r, 7, 7, dim).astype(np.float32)
    xs = rs.randn(r, 7, 7, dim).astype(np.float32)
    conv1 = tnn.Conv2d(2 * dim, dim, 3, stride=2)
    conv2 = tnn.Conv2d(dim, 128, 1)
    fc = tnn.Linear(3 * 3 * 128, 2)

    club = CLUBHead()
    # torch flattens (R, 128, 3, 3) channel-major; permute the fc kernel to
    # the NHWC flatten order
    fc_kernel = fc.weight.detach().numpy().reshape(2, 128, 3, 3)
    fc_kernel = fc_kernel.transpose(2, 3, 1, 0).reshape(3 * 3 * 128, 2)
    p = {"conv1": _share_conv(conv1), "conv2": _share_conv(conv2),
         "fc": {"kernel": fc_kernel, "bias": fc.bias.detach().numpy()}}

    rng = jax.random.PRNGKey(7)
    valid = jnp.ones((r,), bool)
    got = float(club.apply({"params": p}, jnp.asarray(xa), jnp.asarray(xs),
                           valid, rng))

    perm = np.asarray(jax.random.permutation(rng, r))
    with torch.no_grad():
        xa_t = torch.from_numpy(xa.transpose(0, 3, 1, 2))
        xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
        xs_r = xs_t[torch.from_numpy(perm)]

        def score(pair):
            z = tF.relu(conv2(tF.relu(conv1(pair))))
            return fc(z.reshape(z.size(0), -1))

        same_prob = tF.log_softmax(score(torch.cat((xa_t, xs_t), 1)), dim=1)
        diff_prob = tF.log_softmax(score(torch.cat((xa_t, xs_r), 1)), dim=1)
        want = float(tF.nll_loss(same_prob, torch.ones(r, dtype=torch.long))
                     + tF.nll_loss(diff_prob,
                                   torch.zeros(r, dtype=torch.long)))
    np.testing.assert_allclose(got, want, atol=1e-4)


# ------------------------------ PT-MAF --------------------------------------


def test_pt_maf_fg_bg_masked_nll_golden():
    """PT-MAF's fg/bg gating (lib/PT_MAF/faster_rcnn.py:132-148): per-pixel
    max anchor prob thresholded at high/low fractions of the global max,
    ratio_f/ratio_b with detached denominator; the per-group DA loss is
    F.nll_loss with the off-group pixels labeled -1 (ignore_index)."""
    from tllod_tpu.methods.pt_maf import fg_bg_maps, masked_image_nll

    rs = np.random.RandomState(29)
    b, h, w, a = 1, 7, 9, 2
    # heavy-tailed probs so both groups are non-empty at the reference's
    # default thresholds (most pixels < 0.1·max, a few > 0.7·max)
    fg_prob = (rs.rand(b, h, w, a) ** 6).astype(np.float32)
    high, low = 0.7, 0.1

    fmap, bmap, ratio_f, ratio_b = fg_bg_maps(jnp.asarray(fg_prob), high,
                                              low)

    prob_t = torch.from_numpy(fg_prob.transpose(0, 3, 1, 2))
    rpn_prob_tmp, _ = torch.max(prob_t, dim=1)
    max_prob = torch.max(rpn_prob_tmp)
    f_t = torch.where(rpn_prob_tmp.gt(max_prob * high),
                      torch.full_like(rpn_prob_tmp, 1),
                      torch.full_like(rpn_prob_tmp, 0))
    b_t = torch.where(rpn_prob_tmp.lt(max_prob * low),
                      torch.full_like(rpn_prob_tmp, 1),
                      torch.full_like(rpn_prob_tmp, 0))
    np.testing.assert_array_equal(np.asarray(fmap), f_t.numpy())
    np.testing.assert_array_equal(np.asarray(bmap), b_t.numpy())
    np.testing.assert_allclose(
        float(ratio_f), float(f_t.sum() / (f_t.sum() + b_t.sum())),
        atol=ATOL)
    np.testing.assert_allclose(
        float(ratio_b), float(b_t.sum() / (f_t.sum() + b_t.sum())),
        atol=ATOL)
    assert float(fmap.sum()) > 0 and float(bmap.sum()) > 0

    logits = rs.randn(b, h, w, 2).astype(np.float32)
    logits_t = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    for domain, mask_t, mask_j in ((1, f_t, fmap), (0, b_t, bmap)):
        label = torch.where(mask_t == 1,
                            torch.full_like(mask_t, domain),
                            torch.full_like(mask_t, -1)).long()
        want = float(tF.nll_loss(tF.log_softmax(logits_t, dim=1), label,
                                 ignore_index=-1))
        got = float(masked_image_nll(jnp.asarray(logits),
                                     jnp.asarray([domain]), mask_j))
        np.testing.assert_allclose(got, want, atol=ATOL,
                                   err_msg=f"group domain={domain}")
    # NOTE (adjudicated divergence): the reference's conv3 BACKGROUND loss
    # accidentally reuses the foreground head's scores
    # (lib/PT_MAF/faster_rcnn.py:300 `conv3_prob_b = F.log_softmax(
    # conv3_score_f, dim=1)` — an obvious copy-paste typo, conv4/conv5 use
    # their own `_b` scores). We apply each level's own b-head uniformly.


def test_pt_maf_kd_loss_golden():
    """The paradigm-teacher KD loss (methods/PT_MAF/PT_MAF_train.py:448-451):
    (1/(pos+1))·Σ_pos student·log(student/teacher) over RoI class dists +
    (1/(mask+1))·Σ_mask ... over T-softened RPN dists, plus the teacher's
    int-truncated gt-footprint mask (lib/PT_MAF/faster_rcnn_kd.py:58-68)."""
    from tllod_tpu.methods.pt_maf import gt_footprint_mask, pt_maf_kd_loss

    rs = np.random.RandomState(31)
    fh, fw = 6, 8
    gt = np.zeros((4, 5), np.float32)
    gt[0] = [10, 18, 70, 60, 3]          # spans several stride-16 cells
    gt[1] = [40, 5, 100, 90, 1]
    gt[2] = [90, 70, 126, 95, 2]         # clipped near the border
    # gt[3] stays zero-padded (invalid)
    mask_j = gt_footprint_mask(jnp.asarray(gt), fh, fw, stride=16)

    mask_ref = np.zeros((fh, fw))
    for k in range(3):                   # reference loops num_boxes only
        bb = gt[k, :4] / 16.0
        for i in range(int(bb[0]), int(bb[2])):
            for j in range(int(bb[1]), int(bb[3])):
                mask_ref[j, i] = 1
    np.testing.assert_array_equal(np.asarray(mask_j), mask_ref)
    assert mask_ref.sum() > 0

    # KD terms on random distributions (the sum is elementwise, so layout
    # differences between the reference's reshaped NCHW view and our
    # (B, H, W, A, 2) tensor cannot change it)
    r, c, a = 10, 9, 4
    s_cls = rs.rand(r, c).astype(np.float32) + 0.05
    t_cls = rs.rand(r, c).astype(np.float32) + 0.05
    s_rpn = rs.rand(1, fh, fw, a, 2).astype(np.float32) + 0.05
    t_rpn = rs.rand(1, fh, fw, a, 2).astype(np.float32) + 0.05
    labels = np.array([0, 2, 0, 1, 3, 0, 0, 5, 1, 0], np.int64)

    pos = torch.from_numpy((labels > 0).astype(np.float32))
    cls1, cls2 = torch.from_numpy(s_cls), torch.from_numpy(t_cls)
    rpn1, rpn2 = torch.from_numpy(s_rpn), torch.from_numpy(t_rpn)
    m_t = torch.from_numpy(mask_ref.astype(np.float32))[None, :, :, None,
                                                        None]
    want = float(
        (1. / (pos.sum() + 1))
        * (pos.unsqueeze(1) * cls1 * torch.log(cls1 / cls2)).sum()
        + (1. / (m_t.sum() + 1))
        * (m_t * rpn1 * torch.log(rpn1 / rpn2)).sum())

    got = float(pt_maf_kd_loss(
        jnp.asarray(s_rpn), jnp.asarray(t_rpn), jnp.asarray(s_cls),
        jnp.asarray(t_cls), jnp.asarray(labels), mask_j[None]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ------------------------------- IDF ----------------------------------------


def test_idf_focal_dam_pairwise_golden():
    """IDF's loss primitives: FocalLoss / EFocalLoss (lib/IDF/net_utils.py:
    43-180, softmax path, α=1), the DAM attention map (:300-307), and the
    torch-0.4 F.pairwise_distance separation metric (faster_rcnn.py:81-98:
    ||a − b + eps||₂ over the CHANNEL dim, eps INSIDE the norm)."""
    from tllod_tpu.methods.idf import dam, focal_loss, pairwise_dist

    rs = np.random.RandomState(37)
    logits = rs.randn(14, 2).astype(np.float32)
    logits_t = torch.from_numpy(logits)

    for label in (0, 1):
        for gamma in (2.0, 5.0):
            p_t = tF.softmax(logits_t, dim=1)[:, label:label + 1]
            want_f = float((-(1 - p_t) ** gamma * p_t.log()).mean())
            want_e = float((-torch.exp(-gamma * p_t) * p_t.log()).mean())
            got_f = float(focal_loss(jnp.asarray(logits), label, gamma))
            got_e = float(focal_loss(jnp.asarray(logits), label, gamma,
                                     efocal=True))
            np.testing.assert_allclose(got_f, want_f, atol=ATOL)
            np.testing.assert_allclose(got_e, want_e, atol=ATOL)

    feat = rs.randn(1, 10, 12, 32).astype(np.float32)
    feat_t = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    sig = torch.sigmoid(feat_t)
    avg = torch.mean(sig, dim=1, keepdim=True)
    thr = torch.mean(avg)
    att = torch.where(avg < thr, torch.full_like(avg, 0), avg)
    got_att = dam(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(got_att)[..., 0],
                               att.numpy()[:, 0], atol=ATOL)

    a = rs.randn(1, 10, 12, 32).astype(np.float32)
    b = rs.randn(1, 10, 12, 32).astype(np.float32)
    # torch-0.4 pairwise_distance: norm(x1 - x2 + eps, p=2, dim=1)
    a_t = torch.from_numpy(a.transpose(0, 3, 1, 2))
    b_t = torch.from_numpy(b.transpose(0, 3, 1, 2))
    want = float(torch.norm(a_t - b_t + 1e-6, 2, dim=1).mean())
    got = float(pairwise_dist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_idf_netd_heads_golden():
    """IDF's per-block and instance discriminators with shared weights
    (lib/IDF/vgg16.py:28-44 netD_1 [1x1 convs], :91-107 netD_2 [3x3/s2
    convs], :225-240 netD_da), torch train-mode (batch-stat) BatchNorm vs
    BatchStatNorm, dropout off both sides; then the 0.5·CE / 0.25·focal
    composition of IDF_train.py:246-258 + :330-331 through _domain_ce's
    weights."""
    from tllod_tpu.methods.idf import NetDConv, NetDInstance, focal_loss
    from tllod_tpu.ops.losses import softmax_cross_entropy

    torch.manual_seed(47)
    rs = np.random.RandomState(41)

    def t_bn(x, w, b):
        return tF.batch_norm(x, None, None, w, b, training=True)

    # --- netD_1-style head (1x1 convs, stride 1) ---
    feat = rs.randn(2, 9, 11, 16).astype(np.float32)
    convs = [tnn.Conv2d(16, 32, 1), tnn.Conv2d(32, 24, 1),
             tnn.Conv2d(24, 24, 1)]
    bns = [tnn.BatchNorm2d(32), tnn.BatchNorm2d(24), tnn.BatchNorm2d(24)]
    fc = tnn.Linear(24, 2)
    head1 = NetDConv((32, 24, 24), kernel=1, stride=1)
    p = {"fc": _dense_t(fc)}
    for i in range(3):
        p[f"conv{i + 1}"] = _share_conv(convs[i])
        p[f"bn{i + 1}"] = _share_bn(bns[i].weight, bns[i].bias)
    got1 = head1.apply({"params": p}, jnp.asarray(feat), deterministic=True)

    with torch.no_grad():
        x = torch.from_numpy(feat.transpose(0, 3, 1, 2))
        for conv, bn in zip(convs, bns):
            x = tF.dropout(tF.relu(t_bn(conv(x), bn.weight, bn.bias)),
                           training=False)
        x = tF.avg_pool2d(x, (x.size(2), x.size(3))).view(-1, 24)
        want1 = fc(x)
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=1e-4)

    # --- netD_2-style head (3x3 convs, stride 2, padding 1) ---
    feat2 = rs.randn(2, 16, 18, 12).astype(np.float32)
    convs2 = [tnn.Conv2d(12, 20, 3, stride=2, padding=1),
              tnn.Conv2d(20, 24, 3, stride=2, padding=1),
              tnn.Conv2d(24, 24, 3, stride=2, padding=1)]
    bns2 = [tnn.BatchNorm2d(20), tnn.BatchNorm2d(24), tnn.BatchNorm2d(24)]
    fc2 = tnn.Linear(24, 2)
    head2 = NetDConv((20, 24, 24), kernel=3, stride=2)
    p2 = {"fc": _dense_t(fc2)}
    for i in range(3):
        p2[f"conv{i + 1}"] = _share_conv(convs2[i])
        p2[f"bn{i + 1}"] = _share_bn(bns2[i].weight, bns2[i].bias)
    got2 = head2.apply({"params": p2}, jnp.asarray(feat2),
                       deterministic=True)
    with torch.no_grad():
        x = torch.from_numpy(feat2.transpose(0, 3, 1, 2))
        for conv, bn in zip(convs2, bns2):
            x = tF.dropout(tF.relu(t_bn(conv(x), bn.weight, bn.bias)),
                           training=False)
        x = tF.avg_pool2d(x, (x.size(2), x.size(3))).view(-1, 24)
        want2 = fc2(x)
    np.testing.assert_allclose(np.asarray(got2), want2.numpy(), atol=1e-4)

    # --- netD_da instance head ---
    ins_feat = rs.randn(10, 48).astype(np.float32)
    ifc1, ifc2, ifc3 = (tnn.Linear(48, 100), tnn.Linear(100, 100),
                        tnn.Linear(100, 2))
    ibn1, ibn2 = tnn.BatchNorm1d(100), tnn.BatchNorm1d(100)
    ihead = NetDInstance()
    ip = {"fc1": _dense_t(ifc1), "fc2": _dense_t(ifc2),
          "fc3": _dense_t(ifc3),
          "bn1": _share_bn(ibn1.weight, ibn1.bias),
          "bn2": _share_bn(ibn2.weight, ibn2.bias)}
    got_ins = ihead.apply({"params": ip}, jnp.asarray(ins_feat),
                          deterministic=True)
    with torch.no_grad():
        x = torch.from_numpy(ins_feat)
        x = tF.relu(t_bn(ifc1(x), ibn1.weight, ibn1.bias))
        x = tF.relu(t_bn(ifc2(x), ibn2.weight, ibn2.bias))
        want_ins = ifc3(x)
    np.testing.assert_allclose(np.asarray(got_ins), want_ins.numpy(),
                               atol=1e-4)

    # --- the 0.5·CE + 0.25·FL composition (gamma=5, reference default) ---
    for label in (0, 1):
        lbl_t = torch.full((got1.shape[0],), label, dtype=torch.long)
        want_ce = float(0.5 * tF.cross_entropy(want1, lbl_t)
                        + 0.5 * tF.cross_entropy(want2, lbl_t))
        got_ce = float(sum(
            0.5 * softmax_cross_entropy(
                a, jnp.full((a.shape[0],), label, jnp.int32))
            for a in (got1, got2)))
        np.testing.assert_allclose(got_ce, want_ce, atol=1e-4)

        p_t = tF.softmax(want_ins, dim=1)[:, label:label + 1]
        want_fl = float(0.25 * (-(1 - p_t) ** 5.0 * p_t.log()).mean())
        got_fl = float(0.25 * focal_loss(got_ins, label, 5.0))
        np.testing.assert_allclose(got_fl, want_fl, atol=1e-4)
