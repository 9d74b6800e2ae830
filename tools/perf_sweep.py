#!/usr/bin/env python
"""One-process DAF ablation sweep (development tool).

The axon tunnel costs minutes per process launch (weight upload + dial), so
this runs EVERY whole-program ablation of the flagship DAF/VGG16 600x1200
bf16 step inside one process: model init + device_put once, then jit and
time each loss/optimizer variant.  Whole-program subtraction (XLA dead-code
elimination of the ablated term) is the only trustworthy per-term costing on
this host — isolated probes are dispatch-floored (see README "Ceiling
analysis").

Prints one JSON line per variant and a final summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tllod_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--hw", type=int, nargs=2, default=(600, 1200))
    ap.add_argument("--variants", default=None,
                    help="comma list; default = all")
    args = ap.parse_args()

    import dataclasses

    from __graft_entry__ import _make_batch
    from tllod_tpu.config import Config, cfg_from_file
    from tllod_tpu.methods.daf import DAFModel, daf_loss
    from tllod_tpu.train import create_train_state, make_train_step
    from tllod_tpu.utils.optim import make_sgd

    h, w = args.hw
    cfg = Config()
    yml = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", "vgg16.yml")
    if os.path.exists(yml):
        cfg = cfg_from_file(cfg, yml)
    cfg = dataclasses.replace(cfg, ANCHOR_SCALES=(4, 8, 16, 32),
                              MAX_NUM_GT_BOXES=50)
    dtype = jnp.bfloat16

    model = DAFModel(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    s0 = _make_batch(1, 128, 256, domain=1, seed=0)
    t0 = _make_batch(1, 128, 256, domain=0, seed=1)
    params = model.init(rngs, s0, t0, training=True)["params"]

    src = _make_batch(1, h, w, domain=1, seed=0, n_boxes=15, max_gt=50)
    tgt = _make_batch(1, h, w, domain=0, seed=1, n_boxes=15, max_gt=50)
    s = jax.device_put(src)
    t = jax.device_put(tgt)
    rng = jax.random.PRNGKey(3)

    def apply_fn(p, r, s_, t_):
        return model.apply({"params": p}, s_, t_, training=True, rngs=r)

    def loss_no_rpn(out, lamda=0.1):
        det_l = out["rcnn_loss_cls"] + out["rcnn_loss_box"]
        return det_l + lamda * (
            out["da_img_loss"] + out["da_ins_loss"] + out["da_cst_loss"]
            + out["tgt_da_img_loss"] + out["tgt_da_ins_loss"]
            + out["tgt_da_cst_loss"])

    def loss_no_tgt(out, lamda=0.1):
        det_l = (out["rpn_loss_cls"] + out["rpn_loss_box"]
                 + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
        return det_l + lamda * (out["da_img_loss"] + out["da_ins_loss"]
                                + out["da_cst_loss"])

    def loss_det_only(out, lamda=0.1):
        # det losses only: every DA head AND the whole target branch
        # (beyond the fused conv pass) DCE away
        del lamda
        return (out["rpn_loss_cls"] + out["rpn_loss_box"]
                + out["rcnn_loss_cls"] + out["rcnn_loss_box"])

    tx = make_sgd(0.002, clip_norm=10.0)
    tx_bf16m = make_sgd(0.002, clip_norm=10.0, momentum_dtype=jnp.bfloat16)

    def grad_only_step():
        import optax
        from tllod_tpu.train import TrainState

        def body(state, rng_, s_, t_):
            rng_ = jax.random.fold_in(rng_, state.step)
            sampling, dropout = jax.random.split(rng_)

            def compute(p):
                out = apply_fn(p, {"sampling": sampling,
                                   "dropout": dropout}, s_, t_)
                return daf_loss(out)

            loss, grads = jax.value_and_grad(compute)(state.params)
            m = {"loss": loss, "gnorm": optax.global_norm(grads)}
            return TrainState(state.params, state.opt_state,
                              state.step + 1), m
        return jax.jit(body)

    variants = {
        "baseline": lambda: make_train_step(apply_fn, daf_loss, tx,
                                            donate=False),
        "no_rpn_tgt": lambda: make_train_step(apply_fn, loss_no_rpn, tx,
                                              donate=False),
        "no_tgt": lambda: make_train_step(apply_fn, loss_no_tgt, tx,
                                          donate=False),
        "det_only": lambda: make_train_step(apply_fn, loss_det_only, tx,
                                            donate=False),
        "no_update": grad_only_step,
        "bf16_momentum": lambda: make_train_step(apply_fn, daf_loss,
                                                 tx_bf16m, donate=False),
    }
    sel = (args.variants.split(",") if args.variants else list(variants))

    results = {}
    for name in sel:
        step = variants[name]()
        state = create_train_state(params, tx_bf16m if name ==
                                   "bf16_momentum" else tx)
        tc = time.perf_counter()
        state, m = step(state, rng, s, t)
        float(m["loss"])
        compile_s = time.perf_counter() - tc
        t1 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, rng, s, t)
        float(m["loss"])
        ms = (time.perf_counter() - t1) / args.steps * 1e3
        results[name] = ms
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 2),
                          "images_per_sec": round(2e3 / ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    if "baseline" in results:
        base = results["baseline"]
        print("--- whole-program subtraction vs baseline "
              f"({base:.2f} ms) ---")
        for name, ms in results.items():
            if name != "baseline":
                print(f"{name:>14}: {ms:7.2f} ms  (delta "
                      f"{base - ms:+6.2f} ms)")


if __name__ == "__main__":
    main()
