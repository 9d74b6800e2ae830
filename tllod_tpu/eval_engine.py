"""Evaluation engine: run the vanilla detector over a dataset → all_boxes →
VOC mAP (the reference's per-method ``*_test.py`` hot loop,
``methods/DAF/DAF_test.py:255-351``, as one reusable driver).

Training uses the method model; testing uses the VANILLA detector with the
method checkpoint's detector subtree — the reference's filtered state_dict
trick (``DAF_test.py:194``; SURVEY §1 "key architectural fact").
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tllod_tpu.config import Config
from tllod_tpu.data.evaluate import evaluate_detections, print_eval
from tllod_tpu.data.loader import EvalLoader
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.train import collect_detections, postprocess_detections


def run_detection(model: FasterRCNN, params, dataset, roidb, cfg: Config, *,
                  max_per_image: int = 100, score_thresh: float = 0.0,
                  class_agnostic: bool = False,
                  verbose_every: int = 200, vis: bool = False,
                  vis_dir: str = "", vis_thresh: float = 0.3) -> List[List]:
    """Run inference over ``roidb`` → all_boxes[class][image] arrays."""
    num_classes = dataset.num_classes
    stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32)
    means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32)
    loader = EvalLoader(roidb, cfg)

    @jax.jit
    def infer(params, im_data, im_info, gt_boxes):
        out = model.apply({"params": params}, im_data, im_info, gt_boxes,
                          training=False)
        return postprocess_detections(
            out["rois"], out["cls_prob"], out["bbox_pred"], im_info,
            num_classes=num_classes, stds=stds, means=means,
            nms_thresh=cfg.TEST.NMS, max_dets=max_per_image,
            class_agnostic=class_agnostic)

    n = len(loader)
    all_boxes: List[List] = [[[] for _ in range(n)]
                             for _ in range(num_classes)]
    t0 = time.time()
    for i, batch in enumerate(loader):
        boxes, scores, valid = infer(params,
                                     jnp.asarray(batch["im_data"]),
                                     jnp.asarray(batch["im_info"]),
                                     jnp.asarray(batch["gt_boxes"]))
        per_class = collect_detections(boxes, scores, valid,
                                       num_classes=num_classes,
                                       max_per_image=max_per_image,
                                       score_thresh=score_thresh)
        for c in range(1, num_classes):
            all_boxes[c][i] = per_class[c]
        if vis:
            # reference --vis flow (DAF_test.py:299-345)
            from tllod_tpu.utils.vis import save_detection_image
            save_detection_image(roidb[i]["image"], per_class,
                                 dataset.classes, vis_dir or ".",
                                 thresh=vis_thresh,
                                 img_id=roidb[i].get("img_id"))
        if verbose_every and (i + 1) % verbose_every == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"im_detect: {i + 1}/{n} {rate:.2f} im/s", flush=True)
    return all_boxes


def evaluate_model(model: FasterRCNN, params, dataset, roidb, cfg: Config,
                   output_dir: str, *, max_per_image: int = 100,
                   class_agnostic: bool = False,
                   vis: bool = False) -> Dict[str, float]:
    all_boxes = run_detection(model, params, dataset, roidb, cfg,
                              max_per_image=max_per_image,
                              class_agnostic=class_agnostic,
                              vis=vis, vis_dir=output_dir)
    if hasattr(dataset, "evaluate_detections"):
        # dataset-native protocol (COCO AP@[.5:.95], data/coco.py)
        return dataset.evaluate_detections(all_boxes, output_dir)
    if not hasattr(dataset, "annopath_template"):
        # no on-disk VOC devkit (imagenet/vg/union): in-memory VOC-style AP
        from tllod_tpu.data.evaluate import evaluate_detections_roidb
        aps = evaluate_detections_roidb(dataset, roidb, all_boxes,
                                        use_07_metric=True)
        print_eval(aps)
        return aps
    aps = evaluate_detections(dataset, all_boxes, output_dir,
                              use_07_metric=True)
    print_eval(aps)
    return aps
