"""Resume correctness: a resumed run must continue the EXACT trajectory of an
uninterrupted one — parameters, momentum buffers, and the LR-decay schedule
position (the reference restores model + optimizer + lr at
``methods/DAF/DAF_train.py:327-339``).

Uses a tiny quadratic model so the test exercises the full
``save_checkpoint``/``resume_train_state`` machinery (flax state-dict
round-trip of the optax chain state) without a multi-minute detector compile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tllod_tpu.train import TrainState, create_train_state, make_train_step
from tllod_tpu.utils.checkpoint import resume_train_state, save_checkpoint
from tllod_tpu.utils.optim import make_sgd, step_decay_schedule


pytestmark = pytest.mark.slow  # heavy XLA compiles — quick tier: pytest -m 'not slow'


def _setup():
    params = {"dense": {"kernel": jnp.ones((4, 4)) * 0.5,
                        "bias": jnp.zeros((4,))},
              "head": {"kernel": jnp.full((4, 1), 0.1)}}
    # decay at count=3 so the LR drop lands inside the resumed segment
    schedule = step_decay_schedule(0.1, decay_step=3, gamma=0.1)
    tx = make_sgd(schedule, momentum=0.9, weight_decay=5e-4,
                  double_bias=True, bias_decay=False, clip_norm=10.0)

    def apply_fn(params, rngs, x):
        del rngs
        h = x @ params["dense"]["kernel"] + params["dense"]["bias"]
        return {"y": h @ params["head"]["kernel"]}

    step = make_train_step(apply_fn, lambda out: jnp.sum(out["y"] ** 2), tx,
                           donate=False)
    return params, tx, step


def test_resume_matches_uninterrupted(tmp_path):
    params, tx, step_fn = _setup()
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(8, dtype=jnp.float32).reshape(2, 4) / 10.0

    # uninterrupted: 6 steps
    state = create_train_state(params, tx)
    for _ in range(6):
        state, _ = step_fn(state, rng, x)
    ref = state

    # interrupted: 2 steps, checkpoint, fresh state, resume, 4 more
    state = create_train_state(params, tx)
    for _ in range(2):
        state, _ = step_fn(state, rng, x)
    ckpt = str(tmp_path / "resume_ckpt")
    save_checkpoint(ckpt, params=state.params, opt_state=state.opt_state,
                    step=int(state.step), epoch=1)

    fresh = create_train_state(params, tx)
    resumed, epoch, count = resume_train_state(fresh, ckpt)
    assert epoch == 1 and count == 2
    assert int(resumed.step) == 2
    for _ in range(4):
        resumed, _ = step_fn(resumed, rng, x)

    assert int(resumed.step) == int(ref.step) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=0),
        ref.params, resumed.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=0),
        ref.opt_state, resumed.opt_state)


def test_resume_without_opt_state_keeps_fresh_optimizer(tmp_path):
    """Params-only checkpoints (e.g. converted/legacy) still resume."""
    params, tx, step_fn = _setup()
    state = create_train_state(params, tx)
    state, _ = step_fn(state, jax.random.PRNGKey(0),
                       jnp.ones((2, 4), jnp.float32))
    ckpt = str(tmp_path / "params_only")
    save_checkpoint(ckpt, params=state.params, step=1, epoch=3)

    fresh = create_train_state(params, tx)
    resumed, epoch, count = resume_train_state(fresh, ckpt)
    assert epoch == 3 and count == 1 and int(resumed.step) == 1
    # params restored exactly; opt_state left as freshly initialized
    np.testing.assert_allclose(
        np.asarray(resumed.params["dense"]["kernel"]),
        np.asarray(state.params["dense"]["kernel"]))
