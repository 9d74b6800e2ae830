"""Multi-process TRAINING smoke (VERDICT r4 item 4): the env-gated
``jax.distributed`` path (methods/common.py:maybe_init_distributed +
mesh.place_global) must produce the SAME train step as single-process DP.

Technique mirrors tests/test_multihost_eval.py: two subprocesses on the CPU
backend (1 device each → a 2-device global mesh), each feeding its 1-image
local slice of the same fixed 2-image global batch through the REAL DAF
train step (vgg16_thin, tiny proposal counts). Each worker prints the step
loss and a post-update parameter fingerprint; the test asserts both
processes agree AND match the single-process 2-device run of the identical
step computed in-process. Skips when the runtime lacks a distributed CPU
backend (same guard as the eval smoke)."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["TLLOD_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(os.environ["COORD"], num_processes=2,
                           process_id=int(os.environ["PID_IDX"]))
import numpy as np
import jax.numpy as jnp
import __graft_entry__ as ge
from tllod_tpu.methods.daf import DAFModel, daf_loss
from tllod_tpu.parallel.mesh import make_mesh, shard_batch
from tllod_tpu.train import create_train_state, make_train_step
import optax

pid = jax.process_index()
assert jax.process_count() == 2 and len(jax.devices()) == 2

cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
model = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
src_full = ge._make_batch(2, 64, 64, domain=1, seed=0)
tgt_full = ge._make_batch(2, 64, 64, domain=0, seed=1)
params = model.init({"params": jax.random.PRNGKey(0),
                     "sampling": jax.random.PRNGKey(1),
                     "dropout": jax.random.PRNGKey(2)},
                    {k: v[:1] for k, v in src_full.items()},
                    {k: v[:1] for k, v in tgt_full.items()},
                    training=True)["params"]
tx = optax.sgd(1e-2, momentum=0.9)
state = create_train_state(params, tx)

def apply_fn(p, rngs, src, tgt):
    return model.apply({"params": p}, src, tgt, training=True, rngs=rngs)

step = make_train_step(apply_fn, daf_loss, tx, donate=False)
mesh = make_mesh()
src = shard_batch({k: v[pid:pid + 1] for k, v in src_full.items()}, mesh)
tgt = shard_batch({k: v[pid:pid + 1] for k, v in tgt_full.items()}, mesh)
new_state, metrics = step(state, jax.random.PRNGKey(5), src, tgt)

leaves = jax.tree_util.tree_leaves(new_state.params)
fp = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
print("LOSS %.8f FP %.6f" % (float(metrics["loss"]), fp))
"""


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.parallel.mesh import make_mesh, shard_batch
    from tllod_tpu.train import create_train_state, make_train_step

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("AXON", "PALLAS_AXON", "TPU")))}
    env.update({"TLLOD_REPO": repo, "COORD": "localhost:12937",
                "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_NUM_CPU_DEVICES": "1",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/tllod_jax_cache"})
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for p in range(2):
        e = dict(env, PID_IDX=str(p))
        procs.append(subprocess.Popen([sys.executable, str(script)],
                                      env=e, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    if any("distributed" in o and "not" in o.lower() and p.returncode
           for p, o in zip(procs, outs)):
        pytest.skip(f"no distributed CPU backend: {outs}")
    assert all(p.returncode == 0 for p in procs), outs

    results = []
    for o in outs:
        m = re.search(r"LOSS ([-\d.]+) FP ([-\d.]+)", o)
        assert m, o
        results.append((float(m.group(1)), float(m.group(2))))
    # both processes computed the same replicated result
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process reference: the identical step on a 2-device mesh
    cfg = ge._tiny_cfg(post_train=16, post_test=8, pre=64, roi_batch=8)
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16_thin")
    src_full = ge._make_batch(2, 64, 64, domain=1, seed=0)
    tgt_full = ge._make_batch(2, 64, 64, domain=0, seed=1)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sampling": jax.random.PRNGKey(1),
                         "dropout": jax.random.PRNGKey(2)},
                        {k: v[:1] for k, v in src_full.items()},
                        {k: v[:1] for k, v in tgt_full.items()},
                        training=True)["params"]
    tx = optax.sgd(1e-2, momentum=0.9)
    state = create_train_state(params, tx)

    def apply_fn(p, rngs, src, tgt):
        return model.apply({"params": p}, src, tgt, training=True, rngs=rngs)

    step = make_train_step(apply_fn, daf_loss, tx, donate=False)
    mesh = make_mesh(2)
    new_state, metrics = step(state, jax.random.PRNGKey(5),
                              shard_batch(src_full, mesh),
                              shard_batch(tgt_full, mesh))
    leaves = jax.tree_util.tree_leaves(new_state.params)
    fp = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in leaves))
    loss = float(metrics["loss"])
    # same partitioned program on a different process topology — equal up
    # to XLA reassociation between the two compilations
    np.testing.assert_allclose(results[0][0], loss, rtol=2e-4)
    np.testing.assert_allclose(results[0][1], fp, rtol=2e-4)
