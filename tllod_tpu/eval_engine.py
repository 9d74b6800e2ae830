"""Evaluation engine: run the vanilla detector over a dataset → all_boxes →
VOC mAP (the reference's per-method ``*_test.py`` hot loop,
``methods/DAF/DAF_test.py:255-351``, as one reusable driver).

Training uses the method model; testing uses the VANILLA detector with the
method checkpoint's detector subtree — the reference's filtered state_dict
trick (``DAF_test.py:194``; SURVEY §1 "key architectural fact").
"""

from __future__ import annotations

import functools
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
                  vis_dir: str = "", vis_thresh: float = 0.3,
                  mesh=None) -> List[List]:
    """Run inference over ``roidb`` → all_boxes[class][image] arrays.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh`` over axis "data"), images are
    evaluated ``mesh.size`` at a time with the batch dim sharded over the
    devices — each chip runs one image per step, XLA partitions the whole
    forward+postprocess by batch with no cross-device collectives. The
    reference has no multi-GPU eval (``*_test.py`` are single-stream); this
    is the TPU-native scale-out for it.
    """
    if mesh is not None and mesh.size > 1:
        return _run_detection_sharded(
            model, params, dataset, roidb, cfg, mesh,
            max_per_image=max_per_image, score_thresh=score_thresh,
            class_agnostic=class_agnostic, verbose_every=verbose_every,
            vis=vis, vis_dir=vis_dir, vis_thresh=vis_thresh)
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


def _run_detection_sharded(model: FasterRCNN, params, dataset, roidb,
                           cfg: Config, mesh, *, max_per_image: int,
                           score_thresh: float, class_agnostic: bool,
                           verbose_every: int, vis: bool, vis_dir: str,
                           vis_thresh: float) -> List[List]:
    """Data-parallel eval: ``mesh.size`` images per jitted step, batch dim
    sharded over the mesh, params replicated. Selects the same detections
    as the single-device loop, equal up to ~1e-6 float reassociation from
    batching (tested on an 8-device CPU mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tllod_tpu.train import postprocess_detections_batch

    num_classes = dataset.num_classes
    stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32)
    means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32)
    if jax.process_count() > 1:
        # Single-host only: indices here are global while fetch() gathers
        # only addressable shards, and device_put of host numpy onto a mesh
        # with non-addressable devices fails. Multi-host eval would need
        # per-process roidb slicing (not implemented — the reference has no
        # multi-host story to match either).
        raise NotImplementedError(
            "--shard_eval supports a single JAX process; run eval on one "
            "host or drop --shard_eval under jax.distributed.")
    loader = EvalLoader(roidb, cfg)
    d = mesh.size
    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(params, replicated)

    # On the emulated CPU mesh (n virtual devices on few cores) the default
    # per-dispatch cross-device rendezvous timeout can fire spuriously under
    # load and ABORT the process; give it slack there. Real TPU meshes keep
    # their platform defaults.
    opts = ({"xla_cpu_collective_call_terminate_timeout_seconds": 600}
            if jax.default_backend() == "cpu" else None)

    @functools.partial(jax.jit, compiler_options=opts)
    def infer(params, im_data, im_info, gt_boxes):
        out = model.apply({"params": params}, im_data, im_info, gt_boxes,
                          training=False)
        return postprocess_detections_batch(
            out["rois"], out["cls_prob"], out["bbox_pred"], im_info,
            num_classes=num_classes, stds=stds, means=means,
            nms_thresh=cfg.TEST.NMS, max_dets=max_per_image,
            class_agnostic=class_agnostic)

    def fetch(x) -> np.ndarray:
        """Batch-dim-sharded device array → host, one shard at a time.

        A global ``np.asarray`` on a sharded array goes through an XLA
        rendezvous across all devices — on an oversubscribed host (the
        8-virtual-device CPU test mesh on one core) that rendezvous can
        time out and abort the process. Per-shard copies avoid that.
        (Single-host only — guarded above; with multiple processes this
        would silently return just the local shards.)
        """
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    n = len(loader)
    all_boxes: List[List] = [[[] for _ in range(n)]
                             for _ in range(num_classes)]
    done = 0
    t0 = time.time()
    for indices, batch in loader.iter_chunks(d):
        boxes, scores, valid = infer(
            params,
            jax.device_put(batch["im_data"], batch_sharding),
            jax.device_put(batch["im_info"], batch_sharding),
            jax.device_put(batch["gt_boxes"], batch_sharding))
        boxes, scores, valid = fetch(boxes), fetch(scores), fetch(valid)
        for row, i in enumerate(indices):
            per_class = collect_detections(boxes[row], scores[row],
                                           valid[row],
                                           num_classes=num_classes,
                                           max_per_image=max_per_image,
                                           score_thresh=score_thresh)
            for c in range(1, num_classes):
                all_boxes[c][i] = per_class[c]
            if vis:
                from tllod_tpu.utils.vis import save_detection_image
                save_detection_image(roidb[i]["image"], per_class,
                                     dataset.classes, vis_dir or ".",
                                     thresh=vis_thresh,
                                     img_id=roidb[i].get("img_id"))
        done += len(indices)
        if verbose_every and done % verbose_every < len(indices):
            rate = done / (time.time() - t0)
            print(f"im_detect: {done}/{n} {rate:.2f} im/s "
                  f"({d} devices)", flush=True)
    return all_boxes


def evaluate_model(model: FasterRCNN, params, dataset, roidb, cfg: Config,
                   output_dir: str, *, max_per_image: int = 100,
                   class_agnostic: bool = False,
                   vis: bool = False, mesh=None) -> Dict[str, float]:
    all_boxes = run_detection(model, params, dataset, roidb, cfg,
                              max_per_image=max_per_image,
                              class_agnostic=class_agnostic,
                              vis=vis, vis_dir=output_dir, mesh=mesh)
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
