"""Optimizer surface: the ``--o adam`` branch must match ``torch.optim.Adam``
over the reference's per-parameter groups (``methods/DAF/DAF_train.py:311-322``:
bias lr×2 under DOUBLE_BIAS, no bias weight decay, L2 decay folded into the
gradient), and the LR schedule must reproduce the repeating decay cadence
``epoch % (lr_decay_step + 1) == 0`` (``DAF_train.py:362-365``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tllod_tpu.utils.optim import (build_optimizer, epoch_decay_schedule,
                                   make_adam)


def _reference_lr_trajectory(base_lr, lr_decay_step, gamma, n_epochs):
    """Simulate the reference train loop's lr bookkeeping exactly."""
    lr, out = base_lr, []
    for epoch in range(1, n_epochs + 1):
        if epoch % (lr_decay_step + 1) == 0:
            lr *= gamma
        out.append(lr)
    return out


@pytest.mark.parametrize("lr_decay_step", [5, 6, 3])
def test_epoch_decay_schedule_matches_reference_cadence(lr_decay_step):
    spe = 7
    sched = epoch_decay_schedule(2e-3, spe, lr_decay_step, gamma=0.1)
    want = _reference_lr_trajectory(2e-3, lr_decay_step, 0.1, n_epochs=20)
    for epoch in range(1, 21):
        for step_in_epoch in range(spe):
            count = (epoch - 1) * spe + step_in_epoch
            got = float(sched(count))
            assert got == pytest.approx(want[epoch - 1], rel=1e-6), (
                epoch, step_in_epoch)


def test_adam_matches_torch_reference():
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(3)
    w0 = rng.randn(5, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    x = rng.randn(8, 5).astype(np.float32)
    lr, wd = 1e-3, 5e-4

    # torch: the reference's param groups + torch.optim.Adam(params)
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.Adam([
        {"params": [tw], "lr": lr, "weight_decay": wd},
        {"params": [tb], "lr": lr * 2, "weight_decay": 0.0},
    ])
    tx_in = torch.tensor(x)
    for _ in range(5):
        opt.zero_grad()
        ((tx_in @ tw + tb) ** 2).sum().backward()
        opt.step()

    # ours
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = make_adam(lr, weight_decay=wd, double_bias=True, bias_decay=False,
                   clip_norm=None, trainable=lambda p, v: True)
    state = tx.init(params)

    def loss(p):
        return jnp.sum((x @ p["dense"]["kernel"] + p["dense"]["bias"]) ** 2)

    for _ in range(5):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_build_optimizer_dispatch():
    from tllod_tpu.config import Config
    cfg = Config()
    base = dict(lr=1e-3, lr_decay_step=5, lr_decay_gamma=0.1, net="vgg16")
    sched, tx = build_optimizer(_Args(optimizer="adam", **base), cfg, 10)
    assert tx is not None and float(sched(0)) == pytest.approx(1e-3)
    sched, tx = build_optimizer(_Args(optimizer="sgd", **base), cfg, 10)
    assert tx is not None
    with pytest.raises(ValueError, match="unknown optimizer"):
        build_optimizer(_Args(optimizer="rmsprop", **base), cfg, 10)


def test_bf16_momentum_tracks_f32_trajectory():
    """``--bf16_momentum`` (make_sgd momentum_dtype=bf16) must store the
    velocity rounded but keep the parameter trajectory within bf16 rounding
    of the f32 run — it is a storage optimization, not a different
    optimizer."""
    from tllod_tpu.utils.optim import make_sgd

    rng = np.random.RandomState(0)
    w0 = {"dense": {"kernel": jnp.asarray(rng.randn(64, 32), jnp.float32)}}
    x = jnp.asarray(rng.randn(16, 64), jnp.float32)

    def loss(p):
        return jnp.mean((x @ p["dense"]["kernel"]) ** 2)

    def run(mdt):
        tx = make_sgd(1e-2, clip_norm=10.0,
                      trainable=lambda *_: True, momentum_dtype=mdt)
        p = jax.tree_util.tree_map(jnp.copy, w0)
        st = tx.init(p)
        for _ in range(20):
            g = jax.grad(loss)(p)
            up, st = tx.update(g, st, p)
            p = jax.tree_util.tree_map(jnp.add, p, up)
        return p, st

    p32, _ = run(None)
    p16, st16 = run(jnp.bfloat16)
    # the accumulator really is stored in bf16
    accs = [l for l in jax.tree_util.tree_leaves(st16)
            if hasattr(l, "dtype") and l.ndim > 0]
    assert any(l.dtype == jnp.bfloat16 for l in accs)
    # params stay f32 and track the f32-momentum trajectory
    k32 = p32["dense"]["kernel"]
    k16 = p16["dense"]["kernel"]
    assert k16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(k16), np.asarray(k32),
                               rtol=0, atol=2e-2 * float(
                                   jnp.abs(k32).max()))


def test_mesh_batch_divisibility_check():
    from tllod_tpu.parallel.mesh import check_batch_divisible, make_mesh
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    with pytest.raises(ValueError, match="not divisible"):
        check_batch_divisible(3, mesh)
    check_batch_divisible(mesh.size, mesh)  # no raise
