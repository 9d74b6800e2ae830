"""Multi-device numerical consistency: the batch-sharded DAF loss equals the
single-device loss on the same global batch (the guarantee behind
``parallel/mesh.py``'s claim that data parallelism is just a sharding
annotation — XLA's inserted collectives must not change the math)."""

import os
import sys

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def test_sharded_loss_matches_single_device():
    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.parallel.mesh import make_mesh

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

    mesh = make_mesh(2)
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    src_s = {k: jax.device_put(v, shard) for k, v in src.items()}
    tgt_s = {k: jax.device_put(v, shard) for k, v in tgt.items()}
    params_s = jax.device_put(params, rep)
    sharded = float(jax.jit(loss_fn)(params_s, src_s, tgt_s))

    assert np.isfinite(single) and np.isfinite(sharded)
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)
