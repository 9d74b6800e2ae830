"""End-to-end detector smoke tests: init, train forward + grads, eval forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tllod_tpu.config import Config
from tllod_tpu.models.faster_rcnn import FasterRCNN, detection_loss


pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def _tiny_cfg():
    c = Config()
    train = dataclasses.replace(
        c.TRAIN, RPN_PRE_NMS_TOP_N=300, RPN_POST_NMS_TOP_N=50,
        BATCH_SIZE=32, RPN_BATCHSIZE=32, BG_THRESH_LO=0.0)
    test = dataclasses.replace(
        c.TEST, RPN_PRE_NMS_TOP_N=150, RPN_POST_NMS_TOP_N=20)
    return dataclasses.replace(
        c, TRAIN=train, TEST=test, POOLING_MODE="align",
        ANCHOR_SCALES=(1, 2, 4), MAX_NUM_GT_BOXES=8)


def _batch(rng, h=128, w=160, n_gt=3):
    im = rng.randn(1, h, w, 3).astype(np.float32)
    info = np.array([[h, w, 1.0]], np.float32)
    gt = np.zeros((1, 8, 5), np.float32)
    for i in range(n_gt):
        x, y = rng.rand(2) * np.array([w - 60, h - 60])
        gt[0, i] = [x, y, x + 40 + rng.rand() * 15, y + 40 + rng.rand() * 15,
                    1 + rng.randint(3)]
    return jnp.asarray(im), jnp.asarray(info), jnp.asarray(gt)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = FasterRCNN(num_classes=4, cfg=cfg, net="vgg16")
    rng = np.random.RandomState(0)
    im, info, gt = _batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        im, info, gt, training=True)["params"]
    return cfg, model, params, (im, info, gt)


def test_train_forward_and_loss(setup):
    cfg, model, params, (im, info, gt) = setup

    out = model.apply({"params": params}, im, info, gt, training=True,
                      rngs={"sampling": jax.random.PRNGKey(2),
                            "dropout": jax.random.PRNGKey(3)})
    s = cfg.TRAIN.BATCH_SIZE
    assert out["rois"].shape == (1, s, 5)
    assert out["cls_prob"].shape == (1, s, 4)
    assert out["rois_label"].shape == (s,)
    for k in ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls",
              "rcnn_loss_box"):
        v = float(out[k])
        assert np.isfinite(v) and v >= 0, (k, v)
    assert float(out["rcnn_loss_cls"]) > 0


def test_grads_flow_and_frozen_layers(setup):
    cfg, model, params, (im, info, gt) = setup

    def loss_fn(p):
        out = model.apply({"params": p}, im, info, gt, training=True,
                          rngs={"sampling": jax.random.PRNGKey(2),
                                "dropout": jax.random.PRNGKey(3)})
        return detection_loss(out)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).sum())
               for k, v in flat}
    # frozen vgg blocks get exactly zero grads (stop_gradient boundary)
    for name, g in nonzero.items():
        if "conv1_" in name or "conv2_" in name:
            assert g == 0, name
    # trainable parts receive signal
    assert any(v > 0 for k, v in nonzero.items() if "conv5_" in k)
    assert any(v > 0 for k, v in nonzero.items() if "rpn" in k)
    assert any(v > 0 for k, v in nonzero.items() if "cls_score" in k)
    assert any(v > 0 for k, v in nonzero.items() if "fc6" in k)


def test_eval_forward(setup):
    cfg, model, params, (im, info, gt) = setup
    out = model.apply({"params": params}, im, info, gt, training=False)
    n = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out["rois"].shape == (1, n, 5)
    assert out["cls_prob"].shape == (1, n, 4)
    assert out["bbox_pred"].shape == (1, n, 16)
    probs = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_resnet_variant_init():
    cfg = _tiny_cfg()
    model = FasterRCNN(num_classes=4, cfg=cfg, net="res50")
    rng = np.random.RandomState(1)
    im, info, gt = _batch(rng, h=96, w=96)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        im, info, gt, training=False)
    out = model.apply(variables, im, info, gt, training=False)
    assert out["cls_prob"].shape == (1, cfg.TEST.RPN_POST_NMS_TOP_N, 4)


def test_no_grad_leak_through_proposals(setup):
    # Proposals are constants (reference feeds .data through the proposal
    # layer): the RCNN head losses must produce ZERO gradient on the RPN
    # convs — only the RPN's own losses train it.
    cfg, model, params, (im, info, gt) = setup

    def rcnn_only_loss(p):
        out = model.apply({"params": p}, im, info, gt, training=True,
                          rngs={"sampling": jax.random.PRNGKey(2),
                                "dropout": jax.random.PRNGKey(3)})
        return out["rcnn_loss_cls"] + out["rcnn_loss_box"]

    grads = jax.grad(rcnn_only_loss)(params)
    rpn_grad = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads["rpn"]))
    assert rpn_grad == 0.0
    # the backbone still learns through RoIAlign
    bb_grad = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(grads["backbone"]))
    assert bb_grad > 0.0
