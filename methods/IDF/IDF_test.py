#!/usr/bin/env python
"""IDF evaluation entry point (reference ``methods/IDF/IDF_test.py``).

Unlike every other method, IDF tests with its OWN dual-branch model
(``IDF_test.py:157-164``): both branches run, fused invariant features feed
the shared RPN/head.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (DATASET_MAP, build_test_parser,  # noqa: E402
                    resolve_config)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tllod_tpu.data import combined_roidb  # noqa: E402
from tllod_tpu.data.evaluate import evaluate_detections, print_eval  # noqa: E402
from tllod_tpu.data.loader import EvalLoader  # noqa: E402
from tllod_tpu.methods.idf import IDFModel  # noqa: E402
from tllod_tpu.train import (collect_detections,  # noqa: E402
                             postprocess_detections_batch)
from tllod_tpu.utils.checkpoint import load_checkpoint, restore_into  # noqa: E402


def main():
    parser = build_test_parser("Evaluate an IDF network (TPU)")
    parser.add_argument("--gamma", default=5.0, type=float)
    parser.add_argument("--eta", default=1.0, type=float)
    args = parser.parse_args()
    cfg = resolve_config(args, training=False)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    split = {"test_s": "s_test", "test_t": "t_test"}.get(args.part, "t_test")
    dataset, roidb, _, _ = combined_roidb(ds[split], training=False,
                                          use_flipped=False)
    num_classes = dataset.num_classes
    model = IDFModel(num_classes=num_classes, cfg=cfg, net=args.net,
                     class_agnostic=args.class_agnostic, eta=args.eta,
                     gamma=args.gamma)

    dummy = {
        "im_data": np.zeros((1, 128, 128, 3), np.float32),
        "im_info": np.array([[128, 128, 1.0]], np.float32),
        "gt_boxes": np.zeros((1, cfg.MAX_NUM_GT_BOXES, 5), np.float32),
        "num_boxes": np.zeros((1,), np.int32),
        "domain": np.ones((1,), np.int32),
        "separation": np.zeros((1,), np.float32),
    }
    tgt_dummy = dict(dummy, domain=np.zeros((1,), np.int32))
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            dummy, tgt_dummy, training=True))["params"]

    ckpt = args.load_name or args.model_dir
    assert ckpt, "--load_name checkpoint path required"
    restored = load_checkpoint(ckpt)
    params = restore_into(template, restored["params"])

    stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32)
    means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32)

    @jax.jit
    def infer(params, im_data, im_info, gt_boxes):
        def fwd(mdl):
            feats, _, _ = mdl._dual_branch(im_data, True)
            return mdl.detector.forward_from_features(
                feats[2], im_info, gt_boxes, training=False,
                supervised=False)
        out = model.apply({"params": params}, method=fwd)
        return postprocess_detections_batch(
            out["rois"], out["cls_prob"], out["bbox_pred"], im_info,
            num_classes=num_classes, stds=stds, means=means,
            nms_thresh=cfg.TEST.NMS, max_dets=args.max_per_image,
            class_agnostic=args.class_agnostic)

    # Batched (--eval_bs) double-buffered loop, same shape as
    # eval_engine.run_detection: dispatch chunk k, collect chunk k-1 while
    # the device runs k and the loader decodes k+1.
    chunk = max(1, getattr(args, "eval_bs", 1))
    loader = EvalLoader(roidb, cfg)
    n = len(loader)
    all_boxes = [[[] for _ in range(n)] for _ in range(num_classes)]
    t0 = time.time()
    done = [0]

    def process(indices, out):
        boxes, scores, valid = (np.asarray(x) for x in out)
        for row, i in enumerate(indices):
            per_class = collect_detections(boxes[row], scores[row],
                                           valid[row],
                                           num_classes=num_classes,
                                           max_per_image=args.max_per_image)
            for c in range(1, num_classes):
                all_boxes[c][i] = per_class[c]
        prev, done[0] = done[0], done[0] + len(indices)
        if done[0] // 200 > prev // 200:
            print(f"im_detect: {done[0]}/{n} "
                  f"{done[0] / (time.time() - t0):.2f} im/s", flush=True)

    pending = None
    for indices, batch in loader.iter_chunks(chunk):
        out = infer(params,
                    jnp.asarray(batch["im_data"]),
                    jnp.asarray(batch["im_info"]),
                    jnp.asarray(batch["gt_boxes"]))
        if pending is not None:
            process(*pending)
        pending = (indices, out)
    if pending is not None:
        process(*pending)

    # honor per-dataset eval options (rbg-variant imdbs: year-based metric,
    # salted/cleaned results files) exactly like eval_engine.evaluate_model
    kw = dict(getattr(dataset, "eval_kwargs", {}) or {})
    kw.setdefault("use_07_metric", True)
    aps = evaluate_detections(
        dataset, all_boxes,
        os.path.join(args.output_dir, args.net, args.dataset), **kw)
    print_eval(aps)


if __name__ == "__main__":
    main()
