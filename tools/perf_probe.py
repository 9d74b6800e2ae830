#!/usr/bin/env python
"""On-chip perf probes for the DAF train step (development tool).

Times isolated pieces of the flagship DAF/VGG16 600x1200 step so
optimization effort goes where the time is:

  --probe backbone   VGG16 features fwd+bwd only (the conv FLOPs ceiling)
  --probe detector   full supervised Faster R-CNN step (no DA heads)
  --probe daf        full DAF step (source+target+DA) == bench.py
  --probe rpnhead    everything after the backbone (proposal/NMS/targets/
                     RoIAlign/head) — isolates the detection machinery

Each prints one JSON line {probe, ms_per_step, images_per_sec}.
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tllod_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _force(out):
    """Fetch one scalar derived from ``out`` — the axon TPU transport is
    async and ``block_until_ready`` alone does not flush (see bench.py);
    device programs execute in dispatch order, so fetching a scalar of the
    LAST program forces every enqueued one."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def _timeit(step, n, *args):
    _force(step(*args))  # warmup / compile
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step(*args)
    _force(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="backbone",
                    choices=["backbone", "detector", "daf", "rpnhead",
                             "proposal", "anchortgt", "sgd", "tgtpass",
                             "roialign", "eval", "evalfwd", "evalpost"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=(600, 1200),
                    help="debug override of the probe image shape (CPU "
                         "smoke runs)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=1,
                    help="backbone probe batch size (batch-2 vs 2x batch-1 "
                         "decides whether fusing src+tgt conv passes pays)")
    ap.add_argument("--stages", default=None,
                    help="backbone probe only: 'lo,hi' conv-block range "
                         "(e.g. 0,2 = conv1+conv2) to localize where the "
                         "backbone's time goes")
    ap.add_argument("--precision", default=None,
                    choices=["bfloat16", "tensorfloat32", "float32"],
                    help="jax default_matmul_precision for the probe")
    ap.add_argument("--fused", type=int, default=0,
                    help="daf probe only: scan this many steps inside ONE "
                         "jitted dispatch (isolates per-dispatch host/tunnel "
                         "overhead from device step time)")
    ap.add_argument("--block", type=int, default=0,
                    help="proposal probe only: NMS block_size override "
                         "(0 = the nms_fixed default)")
    ap.add_argument("--no_update", action="store_true",
                    help="daf probe ablation: value_and_grad only, no "
                         "clip/momentum/SGD apply — isolates the optimizer "
                         "cost by whole-program subtraction")
    ap.add_argument("--no_tgt", action="store_true",
                    help="daf probe ablation: zero out the six DA losses so "
                         "XLA dead-code-eliminates the target branch "
                         "(machinery + DA heads + its backbone bwd share)")
    ap.add_argument("--bf16_momentum", action="store_true",
                    help="sgd/daf probes: store the momentum accumulator "
                         "in bf16 (the --bf16_momentum train flag) — "
                         "measures the optimizer HBM saving in-program")
    ap.add_argument("--no_rpn_tgt", action="store_true",
                    help="daf probe ablation: drop the two RPN losses so "
                         "anchor-target DCEs away — its true in-program "
                         "cost by subtraction")
    args = ap.parse_args()
    if args.precision:
        # process-wide so EVERY probe honors it, not just the backbone one
        jax.config.update("jax_default_matmul_precision", args.precision)

    import dataclasses
    import os

    from __graft_entry__ import _make_batch
    from tllod_tpu.config import Config, cfg_from_file

    cfg = Config()
    yml = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "cfgs", "vgg16.yml")
    if os.path.exists(yml):
        cfg = cfg_from_file(cfg, yml)
    cfg = dataclasses.replace(cfg, ANCHOR_SCALES=(4, 8, 16, 32),
                              MAX_NUM_GT_BOXES=50)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    batched_probes = ("backbone", "eval", "evalfwd", "evalpost")
    (h, w), b = args.hw, (args.batch if args.probe in batched_probes else 1)
    src = _make_batch(b, h, w, domain=1, seed=0, n_boxes=15, max_gt=50)
    tgt = _make_batch(b, h, w, domain=0, seed=1, n_boxes=15, max_gt=50)

    if args.probe == "backbone":
        from tllod_tpu.models.backbones import VGG16Features
        net = VGG16Features(dtype=dtype)
        stages = (tuple(int(v) for v in args.stages.split(","))
                  if args.stages else (0, 5))
        from tllod_tpu.models.backbones import _VGG_BLOCKS
        init_ch = 3 if stages[0] == 0 else _VGG_BLOCKS[stages[0] - 1][0]
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((b, 128, 256, init_ch)),
                          stage_range=stages)["params"]

        @jax.jit
        def step(p, x):
            def loss(p):
                f = net.apply({"params": p}, x, stage_range=stages)
                return jnp.sum(f.astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        # stage ranges past block 0 consume the previous block's output:
        # spatial h/2^(lo-1) (pools run at block entry), channels of block lo-1
        if stages[0] == 0:
            x = jnp.asarray(src["im_data"])
        else:
            from tllod_tpu.models.backbones import _VGG_BLOCKS
            sc = 2 ** (stages[0] - 1)
            ch = _VGG_BLOCKS[stages[0] - 1][0]
            x = jnp.zeros((b, h // sc, w // sc, ch), jnp.float32)
        x = jax.device_put(x)
        ms = _timeit(lambda p: step(p, x), args.steps, params) * 1e3
        ips = 1e3 / ms * b
    elif args.probe in ("proposal", "anchortgt"):
        from tllod_tpu.models.rpn import anchor_target, proposal_layer
        from tllod_tpu.ops.anchors import generate_anchors, shift_anchors
        # VGG16 stride-16 feature grid for (h, w) via shape-only trace
        from tllod_tpu.models.backbones import VGG16Features
        net = VGG16Features()
        bp = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 256, 3)))["params"]
        fshape = jax.eval_shape(
            lambda p, x: net.apply({"params": p}, x), bp,
            jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)).shape
        fh, fw = int(fshape[1]), int(fshape[2])
        base_a = generate_anchors(base_size=cfg.FEAT_STRIDE[0],
                                  ratios=cfg.ANCHOR_RATIOS,
                                  scales=cfg.ANCHOR_SCALES)
        anchors = jnp.asarray(shift_anchors(fh, fw, cfg.FEAT_STRIDE[0],
                                            base_a))
        A = base_a.shape[0]
        rng_np = np.random.RandomState(0)
        im_info = jnp.asarray(src["im_info"])
        if args.probe == "proposal":
            rcfg = cfg.rpn_cfg(True)
            fg = jnp.asarray(rng_np.rand(b, fh, fw, A).astype(np.float32))
            deltas = jnp.asarray(
                (rng_np.randn(b, fh, fw, 4 * A) * 0.1).astype(np.float32))

            @jax.jit
            def step(fg, deltas):
                kw = ({"nms_block_size": args.block} if args.block else {})
                p = proposal_layer(
                    fg, deltas, im_info, anchors,
                    pre_nms_top_n=rcfg.RPN_PRE_NMS_TOP_N,
                    post_nms_top_n=rcfg.RPN_POST_NMS_TOP_N,
                    nms_thresh=rcfg.RPN_NMS_THRESH, **kw)
                return p.rois

            ms = _timeit(step, args.steps, fg, deltas) * 1e3
        else:
            gt = jnp.asarray(src["gt_boxes"])

            @jax.jit
            def step(gt, key):
                t = anchor_target(gt, im_info, anchors, cfg, key)
                return t.labels

            ms = _timeit(step, args.steps, gt, jax.random.PRNGKey(0)) * 1e3
        ips = 1e3 / ms * b
    elif args.probe in ("detector", "rpnhead"):
        from tllod_tpu.models.faster_rcnn import FasterRCNN
        det = FasterRCNN(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        small = _make_batch(b, 128, 256, domain=1, seed=0)
        params = det.init(rngs, small["im_data"], small["im_info"],
                          small["gt_boxes"], training=True)["params"]

        if args.probe == "detector":
            @jax.jit
            def step(p, rng, batch):
                def loss(p):
                    out = det.apply(
                        {"params": p}, batch["im_data"], batch["im_info"],
                        batch["gt_boxes"], training=True,
                        rngs={"sampling": rng, "dropout": rng})
                    return (out["rpn_loss_cls"] + out["rpn_loss_box"]
                            + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
                return jax.grad(loss)(p)

            batch = jax.device_put(src)
            rng = jax.random.PRNGKey(3)
            ms = _timeit(lambda p: step(p, rng, batch),
                         args.steps, params) * 1e3
        else:
            # precompute base features outside the timed region
            @jax.jit
            def feats(p, x):
                return det.apply({"params": p}, x, method="features")

            base = feats(params, jax.device_put(src["im_data"]))
            jax.block_until_ready(base)

            @jax.jit
            def step(p, rng, base, batch):
                def loss(p):
                    out = det.apply(
                        {"params": p}, base, batch["im_info"],
                        batch["gt_boxes"], training=True, supervised=True,
                        method="forward_from_features",
                        rngs={"sampling": rng, "dropout": rng})
                    return (out["rpn_loss_cls"] + out["rpn_loss_box"]
                            + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
                return jax.grad(loss)(p)

            batch = jax.device_put(src)
            rng = jax.random.PRNGKey(3)
            ms = _timeit(lambda p: step(p, rng, base, batch),
                         args.steps, params) * 1e3
        ips = 1e3 / ms * b
    elif args.probe == "roialign":
        # RoIAlign fwd+bwd alone at the train shape: 256 RoIs over the
        # stride-16 VGG feature map of (h, w). Gradient wrt the feature map
        # (the scatter-add bwd) is the expensive half.
        from tllod_tpu.ops.roi_align import roi_align_avg
        fh, fw = h // 16 + (h % 16 > 0), w // 16 + (w % 16 > 0)
        feat = jnp.asarray(np.random.RandomState(0)
                           .randn(b, fh, fw, 512).astype(np.float32), dtype)
        r = np.random.RandomState(1)
        n_rois = 256
        x1 = r.rand(n_rois) * (w - 64)
        y1 = r.rand(n_rois) * (h - 64)
        rois = np.stack([np.zeros(n_rois), x1, y1,
                         x1 + 16 + r.rand(n_rois) * 200,
                         y1 + 16 + r.rand(n_rois) * 150], axis=1)
        rois = jnp.asarray(rois.astype(np.float32))

        @jax.jit
        def step(feat):
            def loss(f):
                p = roi_align_avg(f, rois, out_size=7, spatial_scale=1 / 16.)
                return jnp.sum(p.astype(jnp.float32) ** 2)
            return jax.grad(loss)(feat)

        ms = _timeit(step, args.steps, feat) * 1e3
        ips = 1e3 / ms * b
    elif args.probe == "sgd":
        # Optimizer update alone on a DAF-sized (142M) tree: tx.update +
        # apply_updates given precomputed grads. HBM-bound — the floor is
        # ~5 tree-sized HBM passes (read g/m/p, write m/p) + the clip's
        # extra grad read.
        from tllod_tpu.methods.daf import DAFModel
        from tllod_tpu.utils.optim import make_sgd
        model = DAFModel(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        s0 = _make_batch(1, 128, 256, domain=1, seed=0)
        t0_ = _make_batch(1, 128, 256, domain=0, seed=1)
        params = model.init(rngs, s0, t0_, training=True)["params"]
        tx = make_sgd(0.002, clip_norm=10.0,
                      momentum_dtype=(jnp.bfloat16 if args.bf16_momentum
                                      else None))
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 1e-4), params)

        @jax.jit
        def step(params, opt_state, grads):
            import optax as _optax
            updates, opt_state = tx.update(grads, opt_state, params)
            return _optax.apply_updates(params, updates), opt_state

        jax.block_until_ready((params, opt_state, grads))
        ms = _timeit(lambda: step(params, opt_state, grads), args.steps) * 1e3
        ips = 1e3 / ms * 2 * b
    elif args.probe == "tgtpass":
        # The DA methods' target branch after the backbone: proposal layer
        # under the TEST RPN config + RoIAlign + box head on the post-NMS
        # RoIs, fwd+bwd (the instance-DA GRL pulls gradients through fc7
        # into the head and the feature map).
        from tllod_tpu.models.faster_rcnn import FasterRCNN
        det = FasterRCNN(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        small = _make_batch(b, 128, 256, domain=1, seed=0)
        params = det.init(rngs, small["im_data"], small["im_info"],
                          small["gt_boxes"], training=True)["params"]

        @jax.jit
        def feats(p, x):
            return det.apply({"params": p}, x, method="features")

        base = feats(params, jax.device_put(jnp.asarray(src["im_data"])))
        jax.block_until_ready(base)

        @jax.jit
        def step(p, rng, base, batch):
            def loss(p):
                out = det.apply(
                    {"params": p}, base, batch["im_info"],
                    batch["gt_boxes"], training=True, supervised=False,
                    method="forward_from_features",
                    rngs={"sampling": rng, "dropout": rng})
                return jnp.sum(out["pooled_feat"].astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        batch = jax.device_put(src)
        rng = jax.random.PRNGKey(3)
        ms = _timeit(lambda p: step(p, rng, base, batch),
                     args.steps, params) * 1e3
        ips = 1e3 / ms * b
    elif args.probe in ("eval", "evalfwd", "evalpost"):
        # the test-CLI hot loop (reference methods/DAF/DAF_test.py:255-317):
        #   eval     = detector fwd + on-device decode + per-class NMS
        #   evalfwd  = detector fwd only (conv/RPN/RoIAlign/head ceiling)
        #   evalpost = decode + per-class NMS only (fwd outputs precomputed)
        from tllod_tpu.models.faster_rcnn import FasterRCNN
        from tllod_tpu.train import postprocess_detections_batch
        det = FasterRCNN(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        small = _make_batch(b, 128, 256, domain=1, seed=0)
        params = det.init(rngs, small["im_data"], small["im_info"],
                          small["gt_boxes"], training=True)["params"]
        stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32)
        means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32)
        im = jax.device_put(jnp.asarray(src["im_data"]))
        info = jax.device_put(jnp.asarray(src["im_info"]))
        gtb = jax.device_put(jnp.asarray(src["gt_boxes"]))

        @jax.jit
        def fwd(p, im_data):
            return det.apply({"params": p}, im_data, info, gtb,
                             training=False)

        @jax.jit
        def post(out):
            return postprocess_detections_batch(
                out["rois"], out["cls_prob"], out["bbox_pred"], info,
                num_classes=9, stds=stds, means=means,
                nms_thresh=cfg.TEST.NMS, max_dets=100)

        if args.probe == "evalfwd":
            ms = _timeit(lambda p: fwd(p, im)["cls_prob"],
                         args.steps, params) * 1e3
        elif args.probe == "evalpost":
            o = fwd(params, im)
            out = {k: o[k] for k in ("rois", "cls_prob", "bbox_pred")}
            jax.block_until_ready(out)
            ms = _timeit(post, args.steps, out) * 1e3
        else:
            ms = _timeit(lambda p: post(fwd(p, im)), args.steps, params) * 1e3
        ips = 1e3 / ms * b
    else:  # daf
        from tllod_tpu.methods.daf import DAFModel, daf_loss
        from tllod_tpu.train import create_train_state, make_train_step
        from tllod_tpu.utils.optim import make_sgd
        model = DAFModel(num_classes=9, cfg=cfg, net="vgg16", dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        s0 = _make_batch(b, 128, 256, domain=1, seed=0)
        t0_ = _make_batch(b, 128, 256, domain=0, seed=1)
        params = model.init(rngs, s0, t0_, training=True)["params"]
        tx = make_sgd(0.002, clip_norm=10.0,
                      momentum_dtype=(jnp.bfloat16 if args.bf16_momentum
                                      else None))
        state = create_train_state(params, tx)

        def apply_fn(p, r, s, t):
            return model.apply({"params": p}, s, t, training=True, rngs=r)

        loss_fn = daf_loss
        if args.no_rpn_tgt:
            # drop the two RPN losses: XLA dead-code-eliminates the
            # anchor-target layer (overlaps + top_k sampling + encode) AND
            # both RPN loss reductions — whole-program subtraction gives
            # their true in-program cost (the isolated anchortgt probe is
            # dispatch-floored). Proposal/NMS can NOT be ablated this way:
            # the head consumes its RoIs.
            def loss_fn(out, lamda=0.1):
                det_l = out["rcnn_loss_cls"] + out["rcnn_loss_box"]
                return det_l + lamda * (
                    out["da_img_loss"] + out["da_ins_loss"]
                    + out["da_cst_loss"] + out["tgt_da_img_loss"]
                    + out["tgt_da_ins_loss"] + out["tgt_da_cst_loss"])
        if args.no_tgt:
            # drop the three target-domain terms: XLA dead-code-eliminates
            # the whole target branch (proposal NMS, RoIAlign, head, DA
            # heads on target) — but NOT the target half of the fused
            # [src; tgt] conv pass, which is one batched op
            def loss_fn(out, lamda=0.1):
                det_l = (out["rpn_loss_cls"] + out["rpn_loss_box"]
                         + out["rcnn_loss_cls"] + out["rcnn_loss_box"])
                return det_l + lamda * (out["da_img_loss"]
                                        + out["da_ins_loss"]
                                        + out["da_cst_loss"])
        if args.no_update:
            # grad-only step: keeps the clip-style global-norm read (one
            # full pass over the grads) but skips momentum/decay/apply —
            # full-step minus this isolates the optimizer's HBM cost
            import optax as _optax
            from tllod_tpu.train import TrainState

            def _grad_body(state, rng_, s_, t_):
                rng_ = jax.random.fold_in(rng_, state.step)
                sampling, dropout = jax.random.split(rng_)

                def compute(p):
                    out = apply_fn(p, {"sampling": sampling,
                                       "dropout": dropout}, s_, t_)
                    return loss_fn(out)

                loss, grads = jax.value_and_grad(compute)(state.params)
                m = {"loss": loss, "gnorm": _optax.global_norm(grads)}
                return TrainState(state.params, state.opt_state,
                                  state.step + 1), m

            def make_train_step(afn, lfn, tx_, donate=False):
                del afn, lfn, tx_, donate
                return jax.jit(_grad_body)

            def make_train_step_multi_override(afn, lfn, tx_, donate=False):
                del afn, lfn, tx_, donate

                def multi(state, rng_, ks_, kt_):
                    def body(st, args_):
                        return _grad_body(st, rng_, args_[0], args_[1])
                    return jax.lax.scan(body, state, (ks_, kt_))
                return jax.jit(multi)

        rng = jax.random.PRNGKey(3)
        s = jax.device_put(src)
        t = jax.device_put(tgt)
        if args.fused > 1:
            from tllod_tpu.train import make_train_step_multi
            if args.no_update:
                make_train_step_multi = make_train_step_multi_override
            k = args.fused
            stack = lambda batch: jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch)
            ks, kt = stack(s), stack(t)
            mstep = make_train_step_multi(apply_fn, loss_fn, tx,
                                          donate=False)
            state, m = mstep(state, rng, ks, kt)
            float(m["loss"][-1])
            n_calls = max(1, args.steps // k)
            t1 = time.perf_counter()
            for _ in range(n_calls):
                state, m = mstep(state, rng, ks, kt)
            float(m["loss"][-1])
            ms = (time.perf_counter() - t1) / (n_calls * k) * 1e3
        else:
            step = make_train_step(apply_fn, loss_fn, tx, donate=False)
            state, m = step(state, rng, s, t)
            float(m["loss"])
            t1 = time.perf_counter()
            for _ in range(args.steps):
                state, m = step(state, rng, s, t)
            float(m["loss"])
            ms = (time.perf_counter() - t1) / args.steps * 1e3
        ips = 1e3 / ms * 2 * b

    print(json.dumps({"probe": args.probe, "bf16": args.bf16,
                      "fused": args.fused,
                      "ms_per_step": round(ms, 2),
                      "images_per_sec": round(ips, 2)}))


if __name__ == "__main__":
    main()
