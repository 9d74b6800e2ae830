"""Evaluation engine: run the vanilla detector over a dataset → all_boxes →
VOC mAP (the reference's per-method ``*_test.py`` hot loop,
``methods/DAF/DAF_test.py:255-351``, as one reusable driver).

Training uses the method model; testing uses the VANILLA detector with the
method checkpoint's detector subtree — the reference's filtered state_dict
trick (``DAF_test.py:194``; SURVEY §1 "key architectural fact").

TPU-native deviations from the reference loop (which is eager, per-image,
single-GPU):

  * images are padded into ≤4 static shape buckets so the jitted program
    compiles a bounded number of times (``data/loader.py:EvalLoader``);
  * ``eval_batch`` images run per dispatch (vmapped forward+postprocess) —
    batching amortizes per-dispatch overhead and keeps the head matmuls
    MXU-shaped; the reference processes strictly one image at a time;
  * the loop runs one chunk ahead of the host: chunk i+1 is dispatched
    before chunk i's results are fetched, so host-side JPEG decode and
    detection collection overlap device compute (double buffering);
  * with a ``mesh``, the batch dim is sharded over the devices — XLA
    partitions the whole program by batch with no cross-device collectives.
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
from tllod_tpu.train import collect_detections, postprocess_detections_batch


def run_detection(model: FasterRCNN, params, dataset, roidb, cfg: Config, *,
                  max_per_image: int = 100, score_thresh: float = 0.0,
                  class_agnostic: bool = False,
                  verbose_every: int = 200, vis: bool = False,
                  vis_dir: str = "", vis_thresh: float = 0.3,
                  mesh=None, eval_batch: int = 1) -> List[List]:
    """Run inference over ``roidb`` → all_boxes[class][image] arrays.

    ``eval_batch`` is the per-step image count on a single device. With
    ``mesh`` (a 1-D ``jax.sharding.Mesh`` over axis "data"), each step runs
    ``mesh.size * eval_batch`` images with the batch dim sharded over the
    devices. The reference has no multi-GPU eval (``*_test.py`` are
    single-stream); this is the TPU-native scale-out for it.
    """
    if jax.process_count() > 1:
        # Multi-host eval (no reference counterpart — its *_test.py are
        # single-stream): each process detects a strided roidb slice on its
        # OWN addressable devices, then the pickled detections ride a
        # process_allgather so every process holds the global all_boxes
        # (tllod_tpu/parallel/multihost.py).
        from tllod_tpu.parallel.multihost import (allgather_bytes,
                                                  merge_detections,
                                                  pack_detections,
                                                  shard_roidb)

        pid, pcount = jax.process_index(), jax.process_count()
        local_roidb, local_idx = shard_roidb(roidb, pid, pcount)
        local_mesh = None
        if mesh is not None and len(jax.local_devices()) > 1:
            from jax.sharding import Mesh
            local_mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
        print(f"multi-host eval: process {pid}/{pcount} takes "
              f"{len(local_roidb)}/{len(roidb)} images on "
              f"{len(jax.local_devices())} local devices")
        local_boxes = run_detection(
            model, params, dataset, local_roidb, cfg,
            max_per_image=max_per_image, score_thresh=score_thresh,
            class_agnostic=class_agnostic, verbose_every=verbose_every,
            vis=vis, vis_dir=vis_dir, vis_thresh=vis_thresh,
            mesh=local_mesh, eval_batch=eval_batch)
        parts = allgather_bytes(pack_detections(
            local_idx, local_boxes, dataset.num_classes))
        return merge_detections(parts, dataset.num_classes, len(roidb))

    sharded = mesh is not None and mesh.size > 1
    chunk = max(1, eval_batch) * (mesh.size if sharded else 1)

    num_classes = dataset.num_classes
    stds = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_STDS, jnp.float32)
    means = jnp.asarray(cfg.TRAIN.BBOX_NORMALIZE_MEANS, jnp.float32)
    loader = EvalLoader(roidb, cfg)

    opts = None
    put = jax.device_put
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Single-process from here on: multi-process runs were dispatched
        # to per-process local meshes above, so every device in `mesh` is
        # addressable and host numpy device_puts are legal.
        axis = mesh.axis_names[0]
        batch_sharding = NamedSharding(mesh, P(axis))
        params = jax.device_put(params, NamedSharding(mesh, P()))
        put = functools.partial(jax.device_put, device=batch_sharding)
        # On the emulated CPU mesh (n virtual devices on few cores) the
        # default per-dispatch cross-device rendezvous timeout can fire
        # spuriously under load and ABORT the process; give it slack there.
        # Real TPU meshes keep their platform defaults.
        if jax.default_backend() == "cpu":
            opts = {"xla_cpu_collective_call_terminate_timeout_seconds": 600}

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
        """Device results → host.

        For sharded arrays, copy one shard at a time: a global
        ``np.asarray`` goes through an XLA rendezvous across all devices —
        on an oversubscribed host (the 8-virtual-device CPU test mesh on
        one core) that rendezvous can time out and abort the process.
        (Single-host only — guarded above; with multiple processes this
        would silently return just the local shards.)
        """
        if not sharded:
            return np.asarray(x)
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    n = len(loader)
    all_boxes: List[List] = [[[] for _ in range(n)]
                             for _ in range(num_classes)]
    state = {"done": 0, "t0": time.time()}

    def process(indices, boxes, scores, valid):
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
                # reference --vis flow (DAF_test.py:299-345)
                from tllod_tpu.utils.vis import save_detection_image
                save_detection_image(roidb[i]["image"], per_class,
                                     dataset.classes, vis_dir or ".",
                                     thresh=vis_thresh,
                                     img_id=roidb[i].get("img_id"))
        prev = state["done"]
        state["done"] += len(indices)
        if verbose_every and state["done"] // verbose_every > \
                prev // verbose_every:
            rate = state["done"] / (time.time() - state["t0"])
            tag = (f" ({mesh.size} devices x bs {chunk // mesh.size})"
                   if sharded else
                   (f" (bs {chunk})" if chunk > 1 else ""))
            print(f"im_detect: {state['done']}/{n} {rate:.2f} im/s{tag}",
                  flush=True)

    # Double-buffered loop: dispatch chunk k, then process chunk k-1 while
    # the device runs k and the loader decodes k+1 on the host.
    pending = None
    for indices, batch in loader.iter_chunks(chunk):
        out = infer(params,
                    put(batch["im_data"]),
                    put(batch["im_info"]),
                    put(batch["gt_boxes"]))
        if pending is not None:
            process(pending[0], *pending[1])
        pending = (indices, out)
    if pending is not None:
        process(pending[0], *pending[1])
    return all_boxes


def evaluate_model(model: FasterRCNN, params, dataset, roidb, cfg: Config,
                   output_dir: str, *, max_per_image: int = 100,
                   class_agnostic: bool = False,
                   vis: bool = False, mesh=None,
                   eval_batch: int = 1) -> Dict[str, float]:
    all_boxes = run_detection(model, params, dataset, roidb, cfg,
                              max_per_image=max_per_image,
                              class_agnostic=class_agnostic,
                              vis=vis, vis_dir=output_dir, mesh=mesh,
                              eval_batch=eval_batch)
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
    # per-dataset eval options (rbg-variant imdbs: year-based metric,
    # salted results files, cleanup — set by the factory)
    kw = dict(getattr(dataset, "eval_kwargs", {}) or {})
    kw.setdefault("use_07_metric", True)
    aps = evaluate_detections(dataset, all_boxes, output_dir, **kw)
    print_eval(aps)
    return aps
