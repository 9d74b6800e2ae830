#!/usr/bin/env python
"""Vanilla Faster R-CNN evaluation
(reference ``methods/faster_rcnn/faster_rcnn_test.py``)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import DATASET_MAP, build_test_parser, resolve_config  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tllod_tpu.data import combined_roidb  # noqa: E402
from tllod_tpu.eval_engine import evaluate_model  # noqa: E402
from tllod_tpu.models.faster_rcnn import FasterRCNN  # noqa: E402
from tllod_tpu.utils.checkpoint import (detector_params,  # noqa: E402
                                        load_checkpoint, restore_into)


def main():
    args = build_test_parser("Evaluate a Faster R-CNN network (TPU)"
                             ).parse_args()
    cfg = resolve_config(args, training=False)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    split = {"test_s": "s_test", "test_t": "t_test"}.get(args.part, "t_test")
    dataset, roidb, _, _ = combined_roidb(ds[split], training=False,
                                          use_flipped=False)
    model = FasterRCNN(num_classes=dataset.num_classes, cfg=cfg,
                       net=args.net, class_agnostic=args.class_agnostic)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            np.zeros((1, 128, 128, 3), np.float32),
            np.array([[128, 128, 1.0]], np.float32),
            np.zeros((1, cfg.MAX_NUM_GT_BOXES, 5), np.float32),
            training=False))["params"]

    ckpt = args.load_name or args.model_dir
    assert ckpt, "--load_name checkpoint path required"
    restored = load_checkpoint(ckpt)
    params = restore_into(template, detector_params(restored["params"]))

    evaluate_model(model, params, dataset, roidb, cfg,
                   os.path.join(args.output_dir, args.net, args.dataset),
                   max_per_image=args.max_per_image,
                   class_agnostic=args.class_agnostic,
                   eval_batch=getattr(args, "eval_bs", 1))


if __name__ == "__main__":
    main()
