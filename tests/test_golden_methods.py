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
