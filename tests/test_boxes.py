"""Box math vs numpy oracles replicating the reference torch implementations
(``lib/model/rpn/bbox_transform.py``)."""

import jax.numpy as jnp
import numpy as np

from tllod_tpu.ops.boxes import (bbox_overlaps, bbox_transform,
                                 bbox_transform_inv, clip_boxes)


def _rand_boxes(rng, n, scale=500):
    x1 = rng.rand(n) * scale
    y1 = rng.rand(n) * scale
    w = rng.rand(n) * 100 + 1
    h = rng.rand(n) * 100 + 1
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _iou_oracle(a, b):
    # "+1" convention, reference bbox_overlaps (bbox_transform.py:136-166)
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        iw = np.minimum(a[i, 2], b[:, 2]) - np.maximum(a[i, 0], b[:, 0]) + 1
        ih = np.minimum(a[i, 3], b[:, 3]) - np.maximum(a[i, 1], b[:, 1]) + 1
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        out[i] = inter / (area_a[i] + area_b - inter)
    return out


def test_iou_matches_oracle(rng):
    a, b = _rand_boxes(rng, 40), _rand_boxes(rng, 17)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _iou_oracle(a, b), rtol=1e-5)


def test_iou_padding_masks(rng):
    a = _rand_boxes(rng, 5)
    a[3] = 0  # padded candidate slot
    b = _rand_boxes(rng, 4)
    b[2] = 0  # padded gt slot
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b),
                                   mask_zero_area=True))
    assert np.all(got[3, :] == -1.0)   # zero-area candidate row → -1
    assert np.all(got[:3, 2] == 0.0)   # zero-area gt column → 0 (where not -1)
    assert np.all(got[4, 2] == 0.0)


def test_encode_decode_roundtrip(rng):
    # Reference convention: encode uses "+1" widths but decode emits
    # ctr ± w/2, so decode(encode(gt)) returns (x1, y1, x2+1, y2+1). This
    # asymmetry is reference behavior (bbox_transform.py:28-101) and the
    # regression-target statistics bake it in — verify it exactly.
    ex = _rand_boxes(rng, 30)
    gt = _rand_boxes(rng, 30)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    back = np.asarray(bbox_transform_inv(jnp.asarray(ex), deltas))
    want = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(back, want, rtol=1e-4, atol=1e-2)


def test_decode_zero_deltas_shifts_half_open(rng):
    ex = _rand_boxes(rng, 10)
    out = np.asarray(bbox_transform_inv(jnp.asarray(ex), jnp.zeros((10, 4))))
    want = ex + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-3)


def test_decode_multi_class_columns(rng):
    ex = _rand_boxes(rng, 6)
    deltas = rng.randn(6, 12).astype(np.float32) * 0.1
    out = np.asarray(bbox_transform_inv(jnp.asarray(ex), jnp.asarray(deltas)))
    for k in range(3):
        single = np.asarray(bbox_transform_inv(
            jnp.asarray(ex), jnp.asarray(deltas[:, 4 * k:4 * k + 4])))
        np.testing.assert_allclose(out[:, 4 * k:4 * k + 4], single, rtol=1e-5)


def test_clip(rng):
    b = _rand_boxes(rng, 20, scale=800)
    got = np.asarray(clip_boxes(jnp.asarray(b), 600.0, 700.0))
    assert got[:, 0].min() >= 0 and got[:, 2].max() <= 699.0
    assert got[:, 1].min() >= 0 and got[:, 3].max() <= 599.0
