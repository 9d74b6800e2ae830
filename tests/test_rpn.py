"""RPN proposal layer and target-assignment layers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tllod_tpu.config import Config
from tllod_tpu.models.rpn import anchor_target, proposal_layer, proposal_target
from tllod_tpu.ops.anchors import generate_anchors, shift_anchors
from tllod_tpu.ops.boxes import bbox_overlaps
from tllod_tpu.ops.nms import nms_numpy

CFG = Config()


def _small_cfg():
    train = dataclasses.replace(
        CFG.TRAIN, RPN_PRE_NMS_TOP_N=300, RPN_POST_NMS_TOP_N=60,
        BATCH_SIZE=64, RPN_BATCHSIZE=64, BG_THRESH_LO=0.0)
    return dataclasses.replace(CFG, TRAIN=train)


def _decode_oracle(anchors, deltas, h, w):
    # numpy transcription of bbox_transform_inv + clip (reference semantics)
    wa = anchors[:, 2] - anchors[:, 0] + 1
    ha = anchors[:, 3] - anchors[:, 1] + 1
    cx = anchors[:, 0] + 0.5 * wa
    cy = anchors[:, 1] + 0.5 * ha
    pcx = deltas[:, 0] * wa + cx
    pcy = deltas[:, 1] * ha + cy
    pw = np.exp(deltas[:, 2]) * wa
    ph = np.exp(deltas[:, 3]) * ha
    boxes = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], 1)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, w - 1)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, h - 1)
    return boxes


def test_proposal_layer_matches_numpy_pipeline(rng):
    fh, fw, a = 6, 8, 9
    stride = 16
    anchors = shift_anchors(fh, fw, stride, generate_anchors())
    ka = anchors.shape[0]
    scores = rng.rand(1, fh, fw, a).astype(np.float32)
    deltas = (rng.randn(1, fh, fw, 4 * a) * 0.2).astype(np.float32)
    im_info = np.array([[fh * stride, fw * stride, 1.0]], np.float32)

    props = proposal_layer(jnp.asarray(scores), jnp.asarray(deltas),
                           jnp.asarray(im_info), jnp.asarray(anchors),
                           pre_nms_top_n=200, post_nms_top_n=40,
                           nms_thresh=0.7)
    rois = np.asarray(props.rois)[0]
    valid = np.asarray(props.valid)[0]

    # numpy oracle: decode -> clip -> top 200 -> greedy nms -> top 40
    flat_scores = scores.reshape(ka)
    flat_deltas = deltas.reshape(ka, 4)
    boxes = _decode_oracle(anchors, flat_deltas, fh * stride, fw * stride)
    order = np.argsort(-flat_scores)[:200]
    dets = np.concatenate([boxes[order], flat_scores[order, None]], 1)
    keep = nms_numpy(dets, 0.7)[:40]
    want = dets[keep, :4]

    n = len(keep)
    assert valid[:n].all() and not valid[n:].any()
    np.testing.assert_allclose(rois[:n, 1:], want, rtol=1e-4, atol=1e-3)
    assert (rois[:, 0] == 0).all()
    assert (rois[n:, 1:] == 0).all()  # zero padding


def test_anchor_target_counts_and_masks(rng):
    cfg = _small_cfg()
    fh, fw = 10, 12
    # small scales so plenty of anchors fall fully inside the tiny image
    anchors = jnp.asarray(
        shift_anchors(fh, fw, 16, generate_anchors(scales=(1, 2, 4))))
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [30, 30, 120, 100, 3]
    gt[0, 1] = [60, 50, 150, 150, 1]
    im_info = np.array([[fh * 16, fw * 16, 1.0]], np.float32)

    out = anchor_target(jnp.asarray(gt), jnp.asarray(im_info), anchors, cfg,
                        jax.random.PRNGKey(0))
    labels = np.asarray(out.labels)[0]
    n_fg = (labels == 1).sum()
    n_bg = (labels == 0).sum()
    assert n_fg >= 2  # at least the best anchor of each gt
    assert n_fg <= cfg.TRAIN.RPN_BATCHSIZE * cfg.TRAIN.RPN_FG_FRACTION
    assert n_fg + n_bg == cfg.TRAIN.RPN_BATCHSIZE

    # anchors outside the image never get labels
    a = np.asarray(anchors)
    outside = ~((a[:, 0] >= 0) & (a[:, 1] >= 0)
                & (a[:, 2] < fw * 16) & (a[:, 3] < fh * 16))
    assert (labels[outside] == -1).all()

    # every positive anchor overlaps a real gt decently or ties the per-gt
    # best IoU (reference marks ALL tying anchors positive via the equality
    # test at anchor_target_layer.py:107-110, not just the argmax)
    ov = np.asarray(bbox_overlaps(anchors, jnp.asarray(gt[0, :2, :4])))
    ov_in = np.where(outside[:, None], -1.0, ov)
    pos = labels == 1
    best = (ov_in == ov_in.max(axis=0, keepdims=True)).any(axis=1)
    assert np.all((ov[pos].max(axis=1) >= cfg.TRAIN.RPN_POSITIVE_OVERLAP)
                  | best[pos])

    # in/out weights only on labeled anchors
    assert (np.asarray(out.in_weights)[0][labels != 1] == 0).all()
    ow = np.asarray(out.out_weights)[0]
    assert (ow[labels == -1] == 0).all()
    np.testing.assert_allclose(ow[labels >= 0],
                               1.0 / cfg.TRAIN.RPN_BATCHSIZE, rtol=1e-5)


def test_proposal_target_sampling(rng):
    cfg = _small_cfg()
    n = 100
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [50, 50, 200, 200, 2]
    gt[0, 1] = [300, 100, 420, 260, 5]
    rois = np.zeros((1, n, 5), np.float32)
    # Half the proposals near gt0 (fg), half far away (bg).
    for i in range(n // 2):
        j = rng.randint(2)
        base = gt[0, j, :4]
        rois[0, i, 1:] = base + rng.randn(4) * 8
    for i in range(n // 2, n):
        x, y = rng.rand(2) * 300 + 500
        rois[0, i, 1:] = [x, y, x + 60, y + 60]

    out = proposal_target(jnp.asarray(rois), jnp.asarray(gt), cfg,
                          jax.random.PRNGKey(1))
    labels = np.asarray(out.labels)[0]
    s = cfg.TRAIN.BATCH_SIZE
    assert labels.shape == (s,)
    n_fg = (labels > 0).sum()
    assert 1 <= n_fg <= int(cfg.TRAIN.FG_FRACTION * s)
    # fg slots lead, bg slots trail
    assert (labels[n_fg:] == 0).all()
    # all sampled rois carry the right image index
    assert (np.asarray(out.rois)[0][:, 0] == 0).all()
    # regression weights only on fg slots
    in_w = np.asarray(out.in_weights)[0]
    assert (in_w[labels > 0] == 1).all() and (in_w[labels == 0] == 0).all()
    # normalized targets are bounded for near-gt fg rois
    t = np.asarray(out.bbox_targets)[0][labels > 0]
    assert np.abs(t).max() < 30


def test_proposal_target_gt_appended(rng):
    # Even when every proposal is far from the gt, the gt box itself is
    # appended to the candidate pool (reference :39-43) and sampled as the
    # single foreground RoI.
    cfg = _small_cfg()
    gt = np.zeros((1, 20, 5), np.float32)
    gt[0, 0] = [50, 50, 120, 120, 2]
    rois = np.zeros((1, 40, 5), np.float32)
    for i in range(40):  # all far from gt -> bg only
        x, y = rng.rand(2) * 200 + 400
        rois[0, i, 1:] = [x, y, x + 50, y + 50]
    out = proposal_target(jnp.asarray(rois), jnp.asarray(gt), cfg,
                          jax.random.PRNGKey(2))
    labels = np.asarray(out.labels)[0]
    assert labels[0] == 2          # the appended gt box, IoU 1.0
    assert (labels[1:] == 0).all()
    in_w = np.asarray(out.in_weights)[0]
    assert (in_w[0] == 1).all() and (in_w[1:] == 0).all()
    np.testing.assert_allclose(np.asarray(out.rois)[0][0, 1:5], gt[0, 0, :4])


def test_proposal_layer_pa_atf_sampling(rng):
    # PA-ATF's modified selection: slot [0, 25%·postN) keeps the NMS rank
    # order; the rest is a random without-replacement subset of the
    # remaining keepers (reference lib/PA_ATF/proposal_layer1.py:153-161).
    fh, fw, a = 6, 8, 9
    anchors = shift_anchors(fh, fw, 16, generate_anchors())
    scores = rng.rand(1, fh, fw, a).astype(np.float32)
    deltas = (rng.randn(1, fh, fw, 4 * a) * 0.2).astype(np.float32)
    im_info = np.array([[fh * 16, fw * 16, 1.0]], np.float32)

    plain = proposal_layer(jnp.asarray(scores), jnp.asarray(deltas),
                           jnp.asarray(im_info), jnp.asarray(anchors),
                           pre_nms_top_n=200, post_nms_top_n=40,
                           nms_thresh=0.7)
    sampled = proposal_layer(jnp.asarray(scores), jnp.asarray(deltas),
                             jnp.asarray(im_info), jnp.asarray(anchors),
                             pre_nms_top_n=200, post_nms_top_n=40,
                             nms_thresh=0.7,
                             sample_rng=jax.random.PRNGKey(5))
    p = np.asarray(plain.rois)[0]
    s = np.asarray(sampled.rois)[0]
    pv = np.asarray(plain.valid)[0]
    sv = np.asarray(sampled.valid)[0]
    q = 10  # 25% of 40
    # head preserved in rank order
    np.testing.assert_allclose(s[:q][sv[:q]], p[:q][pv[:q]])
    # tail entries are drawn from the plain keep list beyond the head
    tail_pool = {tuple(row) for row in p[q:][pv[q:]]}
    tail = [tuple(row) for row in s[q:][sv[q:]]]
    assert all(t in tail_pool for t in tail)
    assert len(set(tail)) == len(tail)          # without replacement
    assert sv.sum() == pv.sum()                 # same total keeper count
