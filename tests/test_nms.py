"""NMS: fixed-shape XLA kernel vs the reference-semantics numpy oracle."""

import jax.numpy as jnp
import numpy as np

from tllod_tpu.ops.nms import nms_fixed, nms_numpy

NEG_INF = float(np.finfo(np.float32).min)


def _rand_dets(rng, n, spread=200):
    x1 = rng.rand(n) * spread
    y1 = rng.rand(n) * spread
    w = rng.rand(n) * 80 + 1
    h = rng.rand(n) * 80 + 1
    scores = rng.rand(n)
    return np.stack([x1, y1, x1 + w, y1 + h, scores], 1).astype(np.float32)


def _check(dets, thresh, max_out, block_size=512):
    idx, num = nms_fixed(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                         iou_threshold=thresh, max_output=max_out,
                         block_size=block_size)
    idx, num = np.asarray(idx), int(num)
    want = nms_numpy(dets, thresh)[:max_out]
    assert num == len(want), (num, len(want))
    np.testing.assert_array_equal(idx[:num], want)


def test_small_vs_oracle(rng):
    for _ in range(5):
        _check(_rand_dets(rng, 60), 0.7, 60)


def test_dense_overlaps(rng):
    # Tight cluster: heavy suppression chains exercise the fixpoint path.
    dets = _rand_dets(rng, 200, spread=40)
    _check(dets, 0.5, 200, block_size=64)


def test_multi_block(rng):
    dets = _rand_dets(rng, 700, spread=300)
    _check(dets, 0.7, 700, block_size=128)


def test_max_output_truncates(rng):
    dets = _rand_dets(rng, 300, spread=500)
    want = nms_numpy(dets, 0.7)
    assert len(want) > 10
    idx, num = nms_fixed(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                         iou_threshold=0.7, max_output=10)
    assert int(num) == 10
    np.testing.assert_array_equal(np.asarray(idx), want[:10])


def test_padding_never_selected(rng):
    dets = _rand_dets(rng, 50)
    scores = dets[:, 4].copy()
    scores[30:] = NEG_INF
    idx, num = nms_fixed(jnp.asarray(dets[:, :4]), jnp.asarray(scores),
                         iou_threshold=0.7, max_output=50)
    assert int(num) <= 30
    assert np.all(np.asarray(idx)[:int(num)] < 30)


def test_rpn_scale(rng):
    # Train-time scale: 12000 boxes, keep 2000 @ 0.7 — matches oracle.
    dets = _rand_dets(rng, 2000, spread=600)
    _check(dets, 0.7, 400)


def test_presorted_fast_path(rng):
    # presorted=True (proposal-layer path: scores straight out of top_k)
    # must select exactly the same boxes as the sorting path.
    dets = _rand_dets(rng, 300, spread=120)
    dets = dets[np.argsort(-dets[:, 4])]
    idx, num = nms_fixed(jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                         iou_threshold=0.6, max_output=100, presorted=True)
    idx, num = np.asarray(idx), int(num)
    want = nms_numpy(dets, 0.6)[:100]
    assert num == len(want)
    np.testing.assert_array_equal(idx[:num], want)
