"""Learning regression: every method model's assembled gradient flow must
actually TRAIN — 20 SGD steps on a fixed synthetic batch and the supervised
detection loss (rpn_cls + rpn_box + rcnn_cls + rcnn_box) must decrease.

This is the fast counterpart of the reference's only acceptance check
(epochs of real training followed by the README mAP tables,
``/root/reference/README.md:78-101``): oracle parity on individual ops says
nothing about GRL signs, stop_gradient placement, optimizer masks, or frozen
blocks composing into a descent direction — this does. Uses the
``vgg16_thin`` width variant (identical graph structure, 1/16 the parameter
bytes) so all eight methods fit in the suite budget on the 1-core host.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from tllod_tpu.methods.atf import ATFModel, atf_loss
from tllod_tpu.methods.daf import DAFModel, daf_loss
from tllod_tpu.methods.idf import IDFModel, idf_loss
from tllod_tpu.methods.mad import MADModel, mad_loss
from tllod_tpu.methods.maf import MAFModel, maf_loss
from tllod_tpu.methods.pa_atf import PAATFModel, pa_atf_loss
from tllod_tpu.methods.pt_maf import PTMAFModel, pt_maf_loss
from tllod_tpu.methods.us_daf import USDAFModel, us_daf_loss
from tllod_tpu.train import create_train_state, make_train_step
from tllod_tpu.utils.optim import make_sgd

N_STEPS = 20
DET_KEYS = ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls", "rcnn_loss_box")

# (name, model class, loss fn, image hw). PA-ATF's mask-conv stack
# (5×5s3 → pool2s2 → 3×3s2, all VALID) needs a stride-16 map of ≥ 20 px
# per side, hence the larger images there.
CASES = [
    ("daf", DAFModel, daf_loss, (128, 128)),
    ("maf", MAFModel, maf_loss, (128, 128)),
    ("atf", ATFModel, atf_loss, (128, 128)),
    ("idf", IDFModel, idf_loss, (128, 128)),
    ("pa_atf", PAATFModel, pa_atf_loss, (320, 320)),
    ("pt_maf", PTMAFModel, pt_maf_loss, (128, 128)),
    ("mad", MADModel, functools.partial(mad_loss, epoch=5.0), (128, 128)),
    ("us_daf", USDAFModel, us_daf_loss, (128, 128)),
]


pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def _train(model, loss_fn, src, tgt, n_steps=N_STEPS, lr=0.005,
           clip_norm=10.0):
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True)["params"]
    tx = make_sgd(lr, clip_norm=clip_norm)
    state = create_train_state(params, tx)

    def apply_fn(p, rngs, src, tgt):
        return model.apply({"params": p}, src, tgt, training=True, rngs=rngs)

    step = make_train_step(apply_fn, loss_fn, tx)
    rng = jax.random.PRNGKey(7)
    det_hist, loss_hist = [], []
    for _ in range(n_steps):
        state, metrics = step(state, rng, src, tgt)
        det_hist.append(sum(float(metrics[k]) for k in DET_KEYS))
        loss_hist.append(float(metrics["loss"]))
    return det_hist, loss_hist


@pytest.mark.parametrize("name,model_cls,loss_fn,hw", CASES,
                         ids=[c[0] for c in CASES])
def test_method_learns(name, model_cls, loss_fn, hw):
    h, w = hw
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    kw = {}
    if name == "mad":
        # full-size (40×76) multi-view encoders cost ~170 s/step on
        # XLA:CPU; same machinery at quarter spatial size keeps the suite
        # fast (full-size MAD learning is proven on-chip by
        # tools/overfit_synth.py --method mad → OVERFIT.json)
        kw["img_size"] = (12, 20)   # must be multiples of 4 (2× stride-2)
    model = model_cls(num_classes=9, cfg=cfg, net="vgg16_thin", **kw)
    src = ge._make_batch(1, h, w, domain=1, seed=0)
    tgt = ge._make_batch(1, h, w, domain=0, seed=1)
    if name == "idf":
        src["separation"] = np.zeros((1,), np.float32)
    if name == "mad":
        # MAD is DG: two SOURCE views, both with supervision
        tgt = ge._make_batch(1, h, w, domain=0, seed=1)

    det, total = _train(model, loss_fn, src, tgt)
    assert all(np.isfinite(v) for v in total), (name, total)
    first, last = np.mean(det[:3]), np.mean(det[-3:])
    assert last < first, (
        f"{name}: detection loss did not decrease over {N_STEPS} steps "
        f"(first3={first:.4f} last3={last:.4f}, trajectory={det})")


def test_supervised_baseline_learns():
    """The vanilla Faster R-CNN train step (methods/faster_rcnn CLI path)."""
    from tllod_tpu.models.faster_rcnn import FasterRCNN

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = FasterRCNN(num_classes=9, cfg=cfg, net="vgg16_thin")
    b = ge._make_batch(1, 128, 128, domain=1, seed=0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        b["im_data"], b["im_info"], b["gt_boxes"], training=True)["params"]
    tx = make_sgd(0.005, clip_norm=10.0)
    state = create_train_state(params, tx)

    def apply_fn(p, rngs, batch):
        return model.apply({"params": p}, batch["im_data"], batch["im_info"],
                           batch["gt_boxes"], training=True, rngs=rngs)

    def loss_fn(out):
        return (out["rpn_loss_cls"] + out["rpn_loss_box"]
                + out["rcnn_loss_cls"] + out["rcnn_loss_box"])

    step = make_train_step(apply_fn, loss_fn, tx)
    rng = jax.random.PRNGKey(7)
    hist = []
    for _ in range(N_STEPS):
        state, metrics = step(state, rng, b)
        hist.append(float(metrics["loss"]))
    assert all(np.isfinite(v) for v in hist)
    assert np.mean(hist[-3:]) < np.mean(hist[:3]), hist


def test_res_backbone_learns():
    """Random-init ResNet-family train path (US-DAF's flagship backbone is
    res101, ``/root/reference/lib/US_DAF/DA.py:72``): with every BN frozen
    (FrozenBN) only the zero-init of each bottleneck's last conv controls
    residual variance at init — without it activations reach ~2e3 and the
    UNCLIPPED resnet optimizer (clip is vgg16-only, reference parity)
    NaNs within steps. Regression for the round-3 ``us_daf_res101``
    overfit failure (OVERFIT.json 0.0). ``res14`` is the thin test variant
    of the identical block/freeze code path; ``clip_norm=None`` mirrors
    the production resnet optimizer."""
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = USDAFModel(num_classes=9, cfg=cfg, net="res14")
    src = ge._make_batch(1, 128, 128, domain=1, seed=0)
    tgt = ge._make_batch(1, 128, 128, domain=0, seed=1)
    det, total = _train(model, us_daf_loss, src, tgt, lr=0.002,
                        clip_norm=None)
    assert all(np.isfinite(v) for v in total), total
    first, last = np.mean(det[:3]), np.mean(det[-3:])
    assert last < first, (
        f"res backbone: detection loss did not decrease "
        f"(first3={first:.4f} last3={last:.4f}, trajectory={det})")


def test_daf_learns_bf16():
    """--bf16 mixed precision (bf16 backbone/head compute, f32 losses and
    optimizer) must still train in the right direction — the quality basis
    for running the bench/CLIs in bf16."""
    import jax.numpy as jnp

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin",
                     dtype=jnp.bfloat16)
    src = ge._make_batch(1, 128, 128, domain=1, seed=0)
    tgt = ge._make_batch(1, 128, 128, domain=0, seed=1)
    det, total = _train(model, daf_loss, src, tgt)
    assert all(np.isfinite(v) for v in total), total
    first, last = np.mean(det[:3]), np.mean(det[-3:])
    assert last < first, (
        f"bf16 DAF: detection loss did not decrease "
        f"(first3={first:.4f} last3={last:.4f}, trajectory={det})")
