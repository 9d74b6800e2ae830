#!/usr/bin/env python
"""On-chip latency ablation for the DAF train step.

Times each stage of the flagship recipe (600×1200 VGG16, bs1+1) separately
so perf work targets the real bottleneck:

  backbone_fwd   — VGG16 features only (the MXU core)
  full_fwd       — complete DAF forward (adds RPN, NMS, RoIAlign, heads, DA)
  train_step     — forward + backward + SGD

Each timing dispatches a dependency chain of N iterations and fetches one
scalar (the axon transport is async; block_until_ready does not flush —
see bench.py). Prints one JSON line per stage.

Usage: python tools/bench_ablate.py [--steps 20] [--bf16] [--hw 600 1200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--hw", type=int, nargs=2, default=(600, 1200))
    ap.add_argument("--stages", nargs="*",
                    default=("backbone_fwd", "full_fwd", "train_step"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from tllod_tpu.config import Config, cfg_from_file
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.train import create_train_state, make_train_step
    from tllod_tpu.utils.optim import make_sgd

    cfg = Config()
    yml = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "cfgs", "vgg16.yml")
    if os.path.exists(yml):
        cfg = cfg_from_file(cfg, yml)
    cfg = dataclasses.replace(cfg, ANCHOR_SCALES=(4, 8, 16, 32),
                              MAX_NUM_GT_BOXES=50)
    h, w = args.hw
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
    src = _make_batch(1, h, w, domain=1, seed=0, n_boxes=15, max_gt=50)
    tgt = _make_batch(1, h, w, domain=0, seed=1, n_boxes=15, max_gt=50)

    small_s = _make_batch(1, 128, 256, domain=1, seed=0)
    small_t = _make_batch(1, 128, 256, domain=0, seed=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, small_s, small_t,
        training=True)["params"]
    src = jax.device_put(src)
    tgt = jax.device_put(tgt)
    params = jax.device_put(params)
    rngs = {"sampling": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)}

    def timed(name, fn, *fn_args):
        """Dispatch a chain whose iterations depend on each other, fetch one
        scalar at the end."""
        out = fn(*fn_args)          # compile + warmup
        float(out)
        t0 = time.perf_counter()
        carry = out
        for _ in range(args.steps):
            carry = fn(*fn_args) + 0 * carry   # serialize via data dep
        float(carry)
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"stage": name, "ms": round(dt * 1000, 2),
                          "dtype": str(dtype.__name__),
                          "hw": [h, w]}), flush=True)

    if "backbone_fwd" in args.stages:
        @jax.jit
        def backbone_only(p, im):
            feats = model.apply({"params": p}, im,
                                method=lambda m, x: m.detector.features(x))
            return jnp.sum(feats.astype(jnp.float32))

        timed("backbone_fwd", backbone_only, params, src["im_data"])

    if "full_fwd" in args.stages:
        @jax.jit
        def fwd(p, s, t):
            out = model.apply({"params": p}, s, t, training=True, rngs=rngs)
            return daf_loss(out)

        timed("full_fwd", fwd, params, src, tgt)

    if "train_step" in args.stages:
        tx = make_sgd(0.002, clip_norm=10.0)
        state = create_train_state(params, tx)
        step = make_train_step(
            lambda p, r, s, t: model.apply({"params": p}, s, t,
                                           training=True, rngs=r),
            daf_loss, tx, donate=False)
        rng = jax.random.PRNGKey(7)

        state, metrics = step(state, rng, src, tgt)   # compile
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, rng, src, tgt)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"stage": "train_step", "ms": round(dt * 1000, 2),
                          "dtype": str(dtype.__name__), "hw": [h, w]}),
              flush=True)


if __name__ == "__main__":
    main()
