"""Driver-interface checks: entry() compiles single-chip, dryrun_multichip
runs on an 8-device CPU mesh, DAF losses are finite and grads reach both the
detector and the discriminators (and flow back through GRL)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss, rois = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert rois.ndim == 3 and rois.shape[2] == 5


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_daf_grads_hit_discriminators_and_backbone():
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss

    # num_classes must cover _make_batch's class ids (1..8)
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(1, 96, 128, domain=1, seed=0)
    tgt = ge._make_batch(1, 96, 128, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True)["params"]
    assert set(params) == {"detector", "img_da", "ins_da"}

    def loss_fn(p):
        out = model.apply({"params": p}, src, tgt, training=True,
                          rngs={"sampling": jax.random.PRNGKey(3),
                                "dropout": jax.random.PRNGKey(4)})
        return daf_loss(out), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ("da_img_loss", "da_ins_loss", "da_cst_loss", "tgt_da_img_loss",
              "tgt_da_ins_loss", "tgt_da_cst_loss"):
        assert np.isfinite(float(out[k])), k

    def total(tree):
        return sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(tree))

    assert total(grads["img_da"]) > 0
    assert total(grads["ins_da"]) > 0
    # GRL routes discriminator gradients back into the shared backbone
    assert total(grads["detector"]["backbone"]) > 0
    assert total(grads["detector"]["rpn"]) > 0
