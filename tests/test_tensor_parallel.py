"""Tensor parallelism over the 2-D (data, model) mesh: the fc head split
must leave the DAF loss bit-comparable to the single-device run, and the
big fc kernels must actually be sharded (not silently replicated).

The reference has no model parallelism (``nn.DataParallel`` only); this is
the TPU-native extension documented in ``parallel/mesh.py``.
"""

import os
import sys

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def test_tp_loss_matches_single_device():
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.parallel.mesh import make_mesh_2d, tp_param_shardings

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(2, 64, 64, domain=1, seed=0)
    tgt = ge._make_batch(2, 64, 64, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True)["params"]

    def loss_fn(p, s, t):
        out = model.apply({"params": p}, s, t, training=True,
                          rngs={"sampling": jax.random.PRNGKey(3),
                                "dropout": jax.random.PRNGKey(4)})
        return daf_loss(out)

    single = float(jax.jit(loss_fn)(params, src, tgt))

    mesh = make_mesh_2d(2, 4)   # 8 virtual CPU devices → dp 2 × tp 4
    specs = tp_param_shardings(params, mesh)
    params_tp = jax.device_put(params, specs)

    # the big fc kernels really are split over "model" ...
    fc6 = params_tp["detector"]["head"]["fc6"]["kernel"]
    assert fc6.sharding.spec == P(None, "model")
    shard_shapes = {s.data.shape for s in fc6.addressable_shards}
    assert shard_shapes == {(fc6.shape[0], fc6.shape[1] // 4)}
    # ... and everything else is replicated
    conv = params_tp["detector"]["backbone"]["conv1_1"]["kernel"]
    assert conv.sharding.spec == P()

    batch = NamedSharding(mesh, P("data"))
    src_s = {k: jax.device_put(v, batch) for k, v in src.items()}
    tgt_s = {k: jax.device_put(v, batch) for k, v in tgt.items()}
    tp = float(jax.jit(loss_fn)(params_tp, src_s, tgt_s))

    assert np.isfinite(single) and np.isfinite(tp)
    np.testing.assert_allclose(tp, single, rtol=1e-4, atol=1e-5)


def test_tp_train_step_runs_and_keeps_shardings():
    """One optimizer step under dp×tp: params and momentum keep their
    tensor-parallel shardings across the update (no silent gather)."""
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.parallel.mesh import make_mesh_2d, tp_param_shardings
    from tllod_tpu.train import create_train_state, make_train_step
    from tllod_tpu.utils.optim import make_sgd

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(2, 64, 64, domain=1, seed=0)
    tgt = ge._make_batch(2, 64, 64, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True)["params"]

    mesh = make_mesh_2d(2, 4)
    params = jax.device_put(params, tp_param_shardings(params, mesh))
    tx = make_sgd(0.001, clip_norm=10.0)
    state = create_train_state(params, tx)

    batch = NamedSharding(mesh, P("data"))
    src = {k: jax.device_put(v, batch) for k, v in src.items()}
    tgt = {k: jax.device_put(v, batch) for k, v in tgt.items()}

    def apply_fn(p, rngs, s, t):
        return model.apply({"params": p}, s, t, training=True, rngs=rngs)

    step = make_train_step(apply_fn, daf_loss, tx)
    new_state, metrics = step(state, jax.random.PRNGKey(7), src, tgt)
    assert np.isfinite(float(metrics["loss"]))
    fc6 = new_state.params["detector"]["head"]["fc6"]["kernel"]
    assert fc6.sharding.spec == P(None, "model")


def test_spatial_partition_loss_matches_single_device():
    """--sp: images sharded (data, model) on H — GSPMD halo-exchanged convs
    must reproduce the single-device DAF loss."""
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.parallel.mesh import make_mesh_2d, shard_batch, \
        tp_param_shardings

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16")
    src = ge._make_batch(2, 64, 64, domain=1, seed=0)
    tgt = ge._make_batch(2, 64, 64, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, src, tgt, training=True)["params"]

    def loss_fn(p, s, t):
        out = model.apply({"params": p}, s, t, training=True,
                          rngs={"sampling": jax.random.PRNGKey(3),
                                "dropout": jax.random.PRNGKey(4)})
        return daf_loss(out)

    single = float(jax.jit(loss_fn)(params, src, tgt))

    mesh = make_mesh_2d(2, 4)
    params_s = jax.device_put(params, tp_param_shardings(params, mesh))
    src_s = shard_batch(src, mesh, spatial=True)
    tgt_s = shard_batch(tgt, mesh, spatial=True)
    assert src_s["im_data"].sharding.spec == P("data", "model")
    sp = float(jax.jit(loss_fn)(params_s, src_s, tgt_s))

    assert np.isfinite(single) and np.isfinite(sp)
    np.testing.assert_allclose(sp, single, rtol=1e-4, atol=1e-5)


def test_resnet_head_tp_loss_matches_single_device():
    """res50: the layer4 bottleneck channel-sharding rules must reproduce
    the single-device supervised loss, with the 1×1 conv kernels actually
    split over "model"."""
    import warnings

    import __graft_entry__ as ge
    from tllod_tpu.models.faster_rcnn import FasterRCNN, detection_loss
    from tllod_tpu.parallel.mesh import make_mesh_2d, tp_param_shardings

    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = FasterRCNN(num_classes=9, cfg=cfg, net="res50")
    b = ge._make_batch(2, 64, 64, domain=1, seed=0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        b["im_data"], b["im_info"], b["gt_boxes"], training=True)["params"]

    def loss_fn(p, batch):
        out = model.apply({"params": p}, batch["im_data"], batch["im_info"],
                          batch["gt_boxes"], training=True,
                          rngs={"sampling": jax.random.PRNGKey(3),
                                "dropout": jax.random.PRNGKey(4)})
        return detection_loss(out)

    single = float(jax.jit(loss_fn)(params, b))

    mesh = make_mesh_2d(2, 4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        specs = tp_param_shardings(params, mesh)
        assert not w, [str(x.message) for x in w]   # rules matched → no warn
    params_tp = jax.device_put(params, specs)
    l4 = params_tp["head"]["layer4_0"]
    assert l4["conv1"]["kernel"].sharding.spec == P(None, None, None, "model")
    assert l4["conv2"]["kernel"].sharding.spec == P(None, None, "model", None)
    assert l4["bn1"]["scale"].sharding.spec == P("model")
    assert l4["bn2"]["scale"].sharding.spec == P()

    batch = NamedSharding(mesh, P("data"))
    b_s = {k: jax.device_put(v, batch) for k, v in b.items()}
    tp = float(jax.jit(loss_fn)(params_tp, b_s))
    assert np.isfinite(single) and np.isfinite(tp)
    np.testing.assert_allclose(tp, single, rtol=1e-4, atol=1e-5)


def test_sp_backbone_partitions_with_halo_exchange():
    """The spatially-sharded backbone must compile to halo exchanges
    (collective-permute between H-neighbors), NOT an input all-gather —
    i.e. --sp genuinely splits the conv FLOPs model-ways."""
    from tllod_tpu.models.backbones import VGG16Features
    from tllod_tpu.parallel.mesh import make_mesh_2d

    import jax.numpy as jnp

    net = VGG16Features()
    x = jnp.zeros((2, 128, 256, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    mesh = make_mesh_2d(2, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    txt = jax.jit(lambda p, v: net.apply({"params": p}, v)).lower(
        ps, xs).compile().as_text()
    assert txt.count("collective-permute") > 0
    assert txt.count("all-gather") == 0


def test_tp_fc_head_reduces_without_gather():
    """The Megatron-split fc stack must compile to all-reduce(s) for the
    fc7 row-parallel contraction with NO all-gather — activations stay
    sharded through fc6→relu→dropout→fc7."""
    from tllod_tpu.models.backbones import VGG16Head
    from tllod_tpu.parallel.mesh import make_mesh_2d, tp_param_shardings

    import jax.numpy as jnp

    net = VGG16Head()
    x = jnp.zeros((64, 7, 7, 512))
    params = {"head": net.init(jax.random.PRNGKey(0), x)["params"]}
    mesh = make_mesh_2d(2, 4)
    ps = jax.device_put(params, tp_param_shardings(params, mesh))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    txt = jax.jit(lambda p, v: net.apply({"params": p["head"]}, v)).lower(
        ps, xs).compile().as_text()
    assert txt.count("all-reduce") > 0
    assert txt.count("all-gather") == 0
