"""Structural checks for every method model — param subtrees, shapes, and
the detector-subset restore contract. Uses jax.eval_shape so no XLA
compilation happens (fast on the 1-core CI host); numerical smoke coverage
lives in test_graft_and_daf.py and the verify drives."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from tllod_tpu.methods.atf import ATFModel
from tllod_tpu.methods.daf import DAFModel
from tllod_tpu.methods.idf import IDFModel
from tllod_tpu.methods.mad import MADModel
from tllod_tpu.methods.maf import MAFModel
from tllod_tpu.methods.pa_atf import PAATFModel
from tllod_tpu.methods.pt_maf import PTMAFModel
from tllod_tpu.methods.us_daf import USDAFModel
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.utils.checkpoint import detector_params, restore_into

CASES = [
    (DAFModel, "vgg16", {"detector", "img_da", "ins_da"}),
    (MAFModel, "vgg16", {"detector", "img_da3", "img_da4", "img_da5",
                         "ins_da"}),
    (ATFModel, "vgg16", {"detector", "backbone_anc", "img_da3", "img_da4",
                         "img_da5", "ins_da"}),
    (PTMAFModel, "vgg16", {"detector", "img_da3_f", "img_da4_f", "img_da5_f",
                           "img_da3_b", "img_da4_b", "img_da5_b", "ins_da"}),
    (PAATFModel, "vgg16", {"detector", "backbone_anc", "img_da3", "img_da4",
                           "img_da5", "ins_da", "club3", "club4", "club5"}),
    (USDAFModel, "res50", {"detector", "img_da", "ins_da"}),
    (MADModel, "vgg16", None),   # many subtrees; checked via superset below
    (IDFModel, "vgg16", None),
]


pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def _batches():
    # large enough that PA-ATF's strided mask convs keep nonzero extent
    # (its conv5x5s3 → pool2s2 → conv3x3s2 VALID stack needs a stride-16
    # map of ≥ 20 pixels per side)
    src = ge._make_batch(1, 384, 512, domain=1, seed=0)
    tgt = ge._make_batch(1, 384, 512, domain=0, seed=1)
    src["separation"] = np.zeros((1,), np.float32)
    return src, tgt


@pytest.mark.parametrize("model_cls,net,subtrees",
                         CASES, ids=[c[0].__name__ for c in CASES])
def test_method_param_structure(model_cls, net, subtrees):
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = model_cls(num_classes=9, cfg=cfg, net=net)
    src, tgt = _batches()
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True))
    params = variables["params"]
    assert "detector" in params
    if subtrees is not None:
        assert set(params.keys()) == subtrees, sorted(params.keys())
    # every method keeps the full detector intact: the vanilla eval model's
    # params restore from the method checkpoint's detector subtree
    # (the reference's filtered state_dict trick, DAF_test.py:194)
    det = FasterRCNN(num_classes=9, cfg=cfg, net=net)
    det_template = jax.eval_shape(
        lambda: det.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            src["im_data"], src["im_info"], src["gt_boxes"],
            training=False))["params"]
    restored = restore_into(det_template, detector_params(params))
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(det_template)


def test_mad_subtree_superset():
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = MADModel(num_classes=9, cfg=cfg)
    src, tgt = _batches()
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, src, tgt,
            training=True))["params"]
    want = {"detector", "img_da", "ins_da", "ln_img", "ln_ins"}
    for v in (1, 2, 3):
        want |= {f"img_enc{v}", f"img_dec{v}", f"img_da_en{v}",
                 f"ins_enc{v}", f"ins_dec{v}", f"ins_da_en{v}"}
    assert set(params.keys()) == want


def test_idf_subtrees():
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = IDFModel(num_classes=9, cfg=cfg)
    src, tgt = _batches()
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, src, tgt,
            training=True))["params"]
    want = {"detector", "backbone_b", "netd_1", "netd_1_b", "netd_2",
            "netd_2_b", "netd_3", "netd_3_b", "netd_da", "rpn_aux",
            "head_aux", "cls_score_aux", "bbox_pred_aux"}
    assert set(params.keys()) == want
    # dual branch shares conv names with the detector backbone (shared-init
    # deepcopy contract)
    assert set(params["backbone_b"].keys()) == \
        set(params["detector"]["backbone"].keys())


def test_batch2_shapes():
    # batch>1 (the reference asserts batch=1; we are vmap-first) — shape-level
    # check that the whole DAF train forward traces at B=2.
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(2, 96, 128, domain=1, seed=0)
    tgt = ge._make_batch(2, 96, 128, domain=0, seed=1)
    out = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True,
            method=None))
    params = out["params"]
    assert "detector" in params

    def fwd(p):
        return model.apply({"params": p}, src, tgt, training=True,
                           rngs={"sampling": jax.random.PRNGKey(3),
                                 "dropout": jax.random.PRNGKey(4)})
    shapes = jax.eval_shape(fwd, params)
    assert shapes["rois"].shape == (2, 8, 5)
    assert shapes["cls_prob"].shape == (2, 8, 9)
    assert shapes["rois_label"].shape == (2 * 8,)
    assert shapes["rpn_loss_cls"].shape == ()


def test_batch2_pa_atf_club():
    # PA-ATF's CLUB used to pool gt boxes of image 0 only (VERDICT r2 item
    # 6); now every batch image's gt boxes are pooled with their batch
    # index. Shape-level check that the whole forward traces at B=2 and the
    # CLUB/pm machinery yields a scalar.
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = PAATFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(2, 384, 512, domain=1, seed=0)
    tgt = ge._make_batch(2, 384, 512, domain=0, seed=1)
    params = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, src, tgt,
            training=True))["params"]

    def fwd(p):
        return model.apply({"params": p}, src, tgt, training=True,
                           rngs={"sampling": jax.random.PRNGKey(3),
                                 "dropout": jax.random.PRNGKey(4)})
    shapes = jax.eval_shape(fwd, params)
    assert shapes["pm_loss"].shape == ()
    assert shapes["da_ins_loss"].shape == ()


def test_batch2_pt_maf_kd():
    # PT-MAF's KD mask used to read gt_boxes[0] only; now per-image masks
    # (B, H, W). Numeric check of the batched mask + KD loss.
    import jax.numpy as jnp

    from tllod_tpu.methods.pt_maf import gt_footprint_mask, pt_maf_kd_loss

    h, w, stride = 6, 8, 16
    gt = np.zeros((2, 4, 5), np.float32)
    gt[0, 0] = [0, 0, 64, 48, 1]      # image 0: one box → 4×3 footprint
    gt[1, 0] = [64, 48, 128, 96, 2]   # image 1: a DIFFERENT box
    mask = jax.vmap(lambda g: gt_footprint_mask(g, h, w, stride))(
        jnp.asarray(gt))
    assert mask.shape == (2, h, w)
    assert float(mask[0, 0, 0]) == 1.0 and float(mask[1, 0, 0]) == 0.0
    assert float(mask[1, 4, 5]) == 1.0   # image 1's own footprint
    # masks differ between images — the bs>1 landmine is closed
    assert not np.array_equal(np.asarray(mask[0]), np.asarray(mask[1]))

    rng = np.random.RandomState(0)
    s_rpn = jax.nn.softmax(jnp.asarray(
        rng.randn(2, h, w, 3, 2).astype(np.float32)), axis=-1)
    t_rpn = jax.nn.softmax(jnp.asarray(
        rng.randn(2, h, w, 3, 2).astype(np.float32)), axis=-1)
    s_cls = jax.nn.softmax(jnp.asarray(
        rng.randn(16, 9).astype(np.float32)), axis=1)
    t_cls = jax.nn.softmax(jnp.asarray(
        rng.randn(16, 9).astype(np.float32)), axis=1)
    labels = jnp.asarray(rng.randint(0, 3, size=(16,)))
    loss = pt_maf_kd_loss(s_rpn, t_rpn, s_cls, t_cls, labels, mask)
    assert loss.shape == () and np.isfinite(float(loss))


def test_us_daf_bce_margin_saturation_safe():
    """TPU regression (round-3 us_daf_res101 NaN): XLA's logistic
    approximation can return probabilities an ulp OUTSIDE [0, 1] when
    saturated; bce_margin_loss must stay finite there (the reference's bare
    +1e-10 feeds log a negative argument). Also pins the margin semantics:
    a confidently-classified domain column (BCE <= 0.5) contributes 0."""
    import jax.numpy as jnp

    from tllod_tpu.methods.us_daf import bce_margin_loss, scale_labels

    # simulated ulp excursions outside [0, 1] in every column
    probs = jnp.array([[1.0 + 1e-7, 1.0 + 1e-7, -1e-8, 0.5],
                       [-1e-8, 0.5, 1.0, 0.0]], jnp.float32)
    labels = jnp.array([[0.0, 1.0, 0.0, 1.0],
                        [1.0, 0.0, 1.0, 0.0]], jnp.float32)
    loss = bce_margin_loss(probs, labels)
    assert bool(jnp.isfinite(loss)), loss

    # margin filter: domain prob 0.9 vs label 1 -> BCE ~0.105 < 0.5 ->
    # domain column zeroed; scale columns (cols 1-3) always count
    p = jnp.array([[0.9, 0.5, 0.5, 0.5]], jnp.float32)
    l = jnp.array([[1.0, 1.0, 0.0, 1.0]], jnp.float32)
    got = float(bce_margin_loss(p, l))
    want = 3 * (-jnp.log(0.5)) / 4   # domain column dropped, mean over 4
    assert abs(got - float(want)) < 1e-5, (got, float(want))

    # gradient stays finite through the clip boundary
    g = jax.grad(lambda x: bce_margin_loss(x, labels))(probs)
    assert bool(jnp.isfinite(g).all())

    # scale buckets: <=400 small, (400, 1e4) middle, >=1e4 large
    rois = jnp.array([[0, 0, 0, 10, 10],      # 100 px^2 -> small
                      [0, 0, 0, 50, 50],      # 2500 -> middle
                      [0, 0, 0, 200, 200]], jnp.float32)  # 4e4 -> large
    lab = scale_labels(rois)
    assert lab.tolist() == [[1, 0, 0], [0, 1, 0], [0, 0, 1]]


def test_daf_fused_pair_parity():
    """The batched [src; tgt] conv pass (``DAFModel.fuse_pair``) must produce
    the same losses as two separate backbone passes — it IS exactly two
    passes, since every backbone op (conv/relu/pool/frozen-BN) is per-image;
    only XLA's batch tiling differs."""
    import jax.numpy as jnp

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    src = ge._make_batch(1, 96, 128, domain=1, seed=0)
    tgt = ge._make_batch(1, 96, 128, domain=0, seed=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    fused = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
    split = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin",
                     fuse_pair=False)
    variables = fused.init(rngs, src, tgt, training=True)
    keys = ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls", "rcnn_loss_box",
            "da_img_loss", "da_ins_loss", "da_cst_loss",
            "tgt_da_img_loss", "tgt_da_ins_loss", "tgt_da_cst_loss")
    outs = []
    for model in (fused, split):
        out = model.apply(variables, src, tgt, training=True,
                          rngs={"sampling": jax.random.PRNGKey(7),
                                "dropout": jax.random.PRNGKey(8)})
        outs.append(np.array([float(out[k]) for k in keys]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=1e-5)


def test_daf_fused_head_parity():
    """The batched [src RoIs; tgt RoIs] box-head pass (``DAFModel.
    fuse_head``) must produce the same losses as two separate head passes:
    dense/conv head rows are independent, so concat→head→split is exact.
    Uses the res14 head (no dropout) so the two paths draw identical rng
    streams — with dropout the fused mask is still i.i.d. per row, but the
    draws differ and bitwise comparison is meaningless."""
    import jax.numpy as jnp

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    src = ge._make_batch(1, 96, 128, domain=1, seed=0)
    tgt = ge._make_batch(1, 96, 128, domain=0, seed=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    fused = DAFModel(num_classes=9, cfg=cfg, net="res14")
    split = DAFModel(num_classes=9, cfg=cfg, net="res14", fuse_head=False)
    variables = fused.init(rngs, src, tgt, training=True)
    keys = ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls", "rcnn_loss_box",
            "da_img_loss", "da_ins_loss", "da_cst_loss",
            "tgt_da_img_loss", "tgt_da_ins_loss", "tgt_da_cst_loss")
    outs = []
    for model in (fused, split):
        out = model.apply(variables, src, tgt, training=True,
                          rngs={"sampling": jax.random.PRNGKey(7),
                                "dropout": jax.random.PRNGKey(8)})
        outs.append(np.array([float(out[k]) for k in keys]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=1e-5)
