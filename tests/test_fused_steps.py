"""Fused K-step trainer (``--fuse_steps``): ``make_train_step_multi`` must
reproduce the per-step loop's parameter trajectory — the scan folds the
same per-step RNG sequence, so only the dispatch granularity changes
(reference torch dispatches per step; this is the TPU-native amortization
of the per-dispatch host cost). Numerics are equal up to XLA reassociation
between the two compiled programs (~1e-9 absolute on fresh params)."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def test_fused_two_steps_match_two_single_steps():
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.train import (create_train_state, make_train_step,
                                 make_train_step_multi)
    from tllod_tpu.utils.optim import make_sgd

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    batches = [(ge._make_batch(1, 64, 64, domain=1, seed=2 * i),
                ge._make_batch(1, 64, 64, domain=0, seed=2 * i + 1))
               for i in range(2)]
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batches[0][0], batches[0][1], training=True)["params"]

    def apply_fn(p, rngs, s, t):
        return model.apply({"params": p}, s, t, training=True, rngs=rngs)

    tx = make_sgd(0.01, clip_norm=10.0)
    rng = jax.random.PRNGKey(7)

    # two single-step dispatches (donate=False so params survive for reuse)
    step = make_train_step(apply_fn, daf_loss, tx, donate=False)
    state = create_train_state(params, tx)
    losses = []
    for s, t in batches:
        state, m = step(state, rng, s, t)
        losses.append(float(m["loss"]))

    # one fused dispatch over the same two stacked batches
    multi = make_train_step_multi(apply_fn, daf_loss, tx, donate=False)
    stateF = create_train_state(params, tx)
    srcK = {k: np.stack([b[0][k] for b in batches]) for k in batches[0][0]}
    tgtK = {k: np.stack([b[1][k] for b in batches]) for k in batches[0][1]}
    stateF, mK = multi(stateF, rng, srcK, tgtK)

    np.testing.assert_allclose(np.asarray(mK["loss"]), losses, rtol=1e-6)
    assert int(stateF.step) == int(state.step) == 2
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(stateF.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_fused_pt_maf_with_invariant_teacher():
    """PT-MAF's fused loop (``--fuse_steps``): the frozen teacher params are
    a scan-INVARIANT trailing argument (``n_invariant=1``) — the fused
    trajectory must match two per-step dispatches that pass the same teacher
    each step (mirrors methods/PT_MAF/PT_MAF_train.py's apply_fn)."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from tllod_tpu.methods.pt_maf import (PTMAFModel, gt_footprint_mask,
                                          pt_maf_kd_loss, pt_maf_loss)
    from tllod_tpu.models.faster_rcnn import FasterRCNN
    from tllod_tpu.train import (create_train_state, make_train_step,
                                 make_train_step_multi)
    from tllod_tpu.utils.optim import make_sgd

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = PTMAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
    teacher = FasterRCNN(num_classes=9, cfg=cfg, net="vgg16_thin")
    batches = [(ge._make_batch(1, 128, 128, domain=1, seed=2 * i),
                ge._make_batch(1, 128, 128, domain=0, seed=2 * i + 1))
               for i in range(2)]
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batches[0][0], batches[0][1], training=True)["params"]
    teacher_params = jax.tree_util.tree_map(lambda x: x, params["detector"])
    stride = cfg.FEAT_STRIDE[0]

    def teacher_kd(t_params, src, rois):
        def fwd(mdl):
            base = mdl.features(src["im_data"])
            rpn_cls, _ = mdl.rpn(base)
            a = rpn_cls.shape[-1] // 2
            logits = jnp.stack((rpn_cls[..., :a], rpn_cls[..., a:]), -1)
            kd_rpn = jax.nn.softmax(logits / 3.0, axis=-1)
            pooled = mdl.roi_features(base, rois.reshape(-1, 5))
            fc7 = mdl.box_head(pooled, deterministic=True)
            cls_score, _ = mdl.box_outputs(fc7)
            kd_cls = jax.nn.softmax(cls_score / 3.0, axis=1)
            return kd_rpn, kd_cls
        return teacher.apply({"params": t_params}, method=fwd)

    def apply_fn(p, rngs, src, tgt, t_params):
        out = model.apply({"params": p}, src, tgt, training=True, rngs=rngs)
        t_rpn, t_cls = jax.lax.stop_gradient(
            teacher_kd(t_params, src, out["rois"]))
        h, w = out["kd_rpn_prob"].shape[1:3]
        mask = jax.vmap(
            lambda g: gt_footprint_mask(g, h, w, stride))(src["gt_boxes"])
        out["kd_loss"] = pt_maf_kd_loss(out["kd_rpn_prob"], t_rpn,
                                        out["kd_cls_prob"], t_cls,
                                        out["rois_label"], mask)
        return out

    def loss_fn(out):
        return pt_maf_loss(out, 0.1, out["kd_loss"])

    tx = make_sgd(0.01, clip_norm=10.0)
    rng = jax.random.PRNGKey(7)

    step = make_train_step(apply_fn, loss_fn, tx, donate=False)
    state = create_train_state(params, tx)
    losses = []
    for s, t in batches:
        state, m = step(state, rng, s, t, teacher_params)
        losses.append(float(m["loss"]))

    multi = make_train_step_multi(apply_fn, loss_fn, tx, donate=False,
                                  n_invariant=1)
    stateF = create_train_state(params, tx)
    srcK = {k: np.stack([b[0][k] for b in batches]) for k in batches[0][0]}
    tgtK = {k: np.stack([b[1][k] for b in batches]) for k in batches[0][1]}
    stateF, mK = multi(stateF, rng, srcK, tgtK, teacher_params)

    np.testing.assert_allclose(np.asarray(mK["loss"]), losses, rtol=1e-5,
                               atol=1e-7)
    assert int(stateF.step) == int(state.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(stateF.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_stack_batches_pads_variable_shapes():
    """Loader batches pad to their own max (H, W); stack_batches must
    zero-pad to a common shape instead of crashing mid-epoch on
    variable-size datasets (np.stack shape mismatch)."""
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "methods")))
    import jax
    from common import stack_batches
    from tllod_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1)
    batches = iter([
        {"im_data": np.ones((1, 100, 200, 3), np.float32),
         "im_info": np.array([[100, 200, 1.0]], np.float32)},
        {"im_data": np.ones((1, 200, 100, 3), np.float32),
         "im_info": np.array([[200, 100, 1.0]], np.float32)},
    ])
    out = stack_batches(batches, 2, mesh)
    assert out["im_data"].shape == (2, 1, 200, 200, 3)
    got = np.asarray(out["im_data"])
    assert got[0, 0, :100, :200].all() and not got[0, 0, 100:].any()
    assert got[1, 0, :200, :100].all() and not got[1, 0, :, 100:].any()
    np.testing.assert_array_equal(np.asarray(out["im_info"]).shape, (2, 1, 3))
