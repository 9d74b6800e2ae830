"""Inference post-processing vs a numpy transcription of the reference eval
loop (``methods/DAF/DAF_test.py:264-332``): un-normalize deltas, decode,
clip, rescale, per-class NMS, cross-class top-K cap."""

import jax.numpy as jnp
import numpy as np

from tllod_tpu.ops.nms import nms_numpy
from tllod_tpu.train import collect_detections, postprocess_detections

STDS = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
MEANS = np.zeros(4, np.float32)


def _decode_np(boxes, deltas):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy, dw, dh = deltas.T
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - .5 * pw, pcy - .5 * ph,
                     pcx + .5 * pw, pcy + .5 * ph], 1)


def _oracle(rois, cls_prob, bbox_pred, im_info, num_classes, nms_t, max_per):
    h, w, scale = im_info[0]
    boxes = rois[0, :, 1:5]
    out = [np.zeros((0, 5), np.float32)]
    for c in range(1, num_classes):
        d = bbox_pred[0][:, 4 * c:4 * c + 4] * STDS + MEANS
        dec = _decode_np(boxes, d)
        dec[:, 0::2] = dec[:, 0::2].clip(0, w - 1)
        dec[:, 1::2] = dec[:, 1::2].clip(0, h - 1)
        dec = dec / scale
        scores = cls_prob[0][:, c]
        keep = scores > 0.0
        dets = np.concatenate([dec[keep], scores[keep, None]], 1)
        k = nms_numpy(dets, nms_t)
        out.append(dets[k].astype(np.float32))
    allsc = np.concatenate([o[:, 4] for o in out[1:]])
    if allsc.size > max_per:
        thr = np.sort(allsc)[-max_per]
        out = [o[o[:, 4] >= thr] if i > 0 else o for i, o in enumerate(out)]
    return out


def test_postprocess_matches_reference_eval_loop(rng):
    n, c = 40, 4
    h, w, scale = 200.0, 300.0, 1.5
    x1 = rng.rand(n) * 250
    y1 = rng.rand(n) * 150
    rois = np.zeros((1, n, 5), np.float32)
    rois[0, :, 1] = x1
    rois[0, :, 2] = y1
    rois[0, :, 3] = x1 + rng.rand(n) * 40 + 5
    rois[0, :, 4] = y1 + rng.rand(n) * 40 + 5
    logits = rng.randn(1, n, c).astype(np.float32)
    cls_prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    bbox_pred = (rng.randn(1, n, 4 * c) * 0.5).astype(np.float32)
    im_info = np.array([[h, w, scale]], np.float32)

    boxes, scores, valid = postprocess_detections(
        jnp.asarray(rois), jnp.asarray(cls_prob), jnp.asarray(bbox_pred),
        jnp.asarray(im_info), num_classes=c, stds=jnp.asarray(STDS),
        means=jnp.asarray(MEANS), nms_thresh=0.3, max_dets=30)
    got = collect_detections(boxes, scores, valid, num_classes=c,
                             max_per_image=25, score_thresh=0.0)
    want = _oracle(rois, cls_prob, bbox_pred, im_info, c, 0.3, 25)
    for ci in range(1, c):
        assert got[ci].shape == want[ci].shape, (ci, got[ci].shape,
                                                 want[ci].shape)
        # same detections in the same score order
        order_g = np.argsort(-got[ci][:, 4])
        order_w = np.argsort(-want[ci][:, 4])
        np.testing.assert_allclose(got[ci][order_g], want[ci][order_w],
                                   rtol=1e-4, atol=1e-3)
