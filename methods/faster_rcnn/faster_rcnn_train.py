#!/usr/bin/env python
"""Vanilla (source-only) Faster R-CNN training — the supervised baseline
(reference ``methods/faster_rcnn/faster_rcnn_train.py``)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (DATASET_MAP, MetricLogger, build_train_parser,  # noqa: E402
                    resolve_config, setup_parallelism, stack_batches)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tllod_tpu.data import DetectionLoader, combined_roidb  # noqa: E402
from tllod_tpu.models.faster_rcnn import FasterRCNN, detection_loss  # noqa: E402
from tllod_tpu.parallel.mesh import shard_batch  # noqa: E402
from tllod_tpu.train import create_train_state, make_train_step  # noqa: E402
from tllod_tpu.utils.checkpoint import (resume_train_state,  # noqa: E402
                                        save_checkpoint)
from tllod_tpu.utils.optim import build_optimizer  # noqa: E402
from tllod_tpu.zoo import load_pretrained_backbone  # noqa: E402


def main():
    args = build_train_parser("Train a Faster R-CNN network (TPU)"
                              ).parse_args()
    print("Called with args:", args)
    cfg = resolve_config(args)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    dataset, roidb, _, _ = combined_roidb(ds["s_imdb"])
    print(f"{len(roidb)} roidb entries")

    loader = DetectionLoader(roidb, cfg, batch_size=args.batch_size,
                             domain=1, seed=cfg.RNG_SEED,
                           num_workers=args.num_workers)
    model = FasterRCNN(num_classes=dataset.num_classes, cfg=cfg,
                       net=args.net, class_agnostic=args.class_agnostic)

    it = iter(loader)
    batch0 = next(it)
    params = model.init(
        {"params": jax.random.PRNGKey(cfg.RNG_SEED),
         "sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch0["im_data"], batch0["im_info"], batch0["gt_boxes"],
        training=True)["params"]
    params = load_pretrained_backbone(params, args.net)

    steps_per_epoch = len(loader)
    schedule, tx = build_optimizer(args, cfg, steps_per_epoch)
    state = create_train_state(params, tx)

    output_dir = os.path.join(args.save_dir, args.net, args.dataset)
    os.makedirs(output_dir, exist_ok=True)
    step = 0
    if args.resume:
        ckpt = os.path.join(
            output_dir, f"faster_rcnn_{args.checksession}_"
                        f"{args.checkepoch}_{args.checkpoint}")
        state, ckpt_epoch, step = resume_train_state(state, ckpt)
        args.start_epoch = ckpt_epoch + 1
        print(f"resumed from {ckpt} (epoch {ckpt_epoch}, step {step})")

    mesh, state, spatial = setup_parallelism(args, state)

    def apply_fn(params, rngs, batch):
        return model.apply({"params": params}, batch["im_data"],
                           batch["im_info"], batch["gt_boxes"],
                           training=True, rngs=rngs)

    train_step = make_train_step(apply_fn, detection_loss, tx)
    fuse = max(1, getattr(args, "fuse_steps", 1))
    train_multi = None
    if fuse > 1:
        from tllod_tpu.train import make_train_step_multi
        train_multi = make_train_step_multi(apply_fn, detection_loss, tx)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    logger = MetricLogger(args.disp_interval)

    for epoch in range(args.start_epoch, args.max_epochs + 1):
        todo = steps_per_epoch
        if args.max_steps:
            todo = min(todo, max(0, args.max_steps - step))
        while todo > 0:
            if train_multi is not None and todo >= fuse:
                batchK = stack_batches(it, fuse, mesh, spatial)
                state, metricsK = train_multi(state, rng, batchK)
                step += fuse
                todo -= fuse
                logger.update_many(step, epoch, lambda s=step: schedule(s),
                                   metricsK, fuse)
            else:
                batch = shard_batch(next(it), mesh, spatial=spatial)
                state, metrics = train_step(state, rng, batch)
                step += 1
                todo -= 1
                logger.update(step, epoch,
                              lambda s=step: schedule(s), metrics)
            if args.max_steps and step >= args.max_steps:
                break
        done = ((args.max_steps and step >= args.max_steps)
                or epoch == args.max_epochs)
        if done or epoch % max(1, getattr(args, "save_epoch_interval",
                                          1)) == 0:
            save_checkpoint(
                os.path.join(output_dir,
                             f"faster_rcnn_{args.session}_{epoch}_{step}"),
                params=state.params, opt_state=state.opt_state, step=step,
                epoch=epoch, session=args.session,
                meta={"pooling_mode": cfg.POOLING_MODE,
                      "class_agnostic": args.class_agnostic})
            print(f"saved checkpoint for epoch {epoch}")
        if done:
            break


if __name__ == "__main__":
    main()
