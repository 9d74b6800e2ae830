#!/usr/bin/env python
"""IDF stage-⑤ training entry point (reference ``methods/IDF/IDF_train.py``).

Pipeline prerequisites (see ``IDF_train.sh``): ① CycleGAN-translated source
images on disk, ② a source-only detector, ③ pseudo labels via
``tools/generate_pseudo_labels.py``, ④ mosaics via
``tools/mosaic_augment.py``. This script trains the dual-branch model on the
fake-source split + pseudo-labeled target split.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (DATASET_MAP, MetricLogger,  # noqa: E402
                    build_train_parser, resolve_config)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tllod_tpu.data import DetectionLoader, combined_roidb  # noqa: E402
from tllod_tpu.data.factory import register_dataset, data_dir  # noqa: E402
from tllod_tpu.data.voc import CLASS_SETS, VOCDetection  # noqa: E402
from tllod_tpu.methods.idf import IDFModel, idf_loss  # noqa: E402
from tllod_tpu.parallel.mesh import shard_batch  # noqa: E402
from tllod_tpu.train import create_train_state, make_train_step  # noqa: E402
from tllod_tpu.utils.checkpoint import (resume_train_state,  # noqa: E402
                                        save_checkpoint)
from tllod_tpu.utils.optim import build_optimizer  # noqa: E402
from tllod_tpu.zoo import load_pretrained_backbone  # noqa: E402


def main():
    parser = build_train_parser("Train an IDF network (TPU)")
    parser.add_argument("--gamma", default=5.0, type=float,
                        help="focal gamma (reference --gamma)")
    parser.add_argument("--ef", action="store_true",
                        help="use EFocalLoss instead of FocalLoss")
    parser.add_argument("--eta", default=1.0, type=float,
                        help="GRL strength")
    parser.add_argument("--s_imdb", default=None, type=str,
                        help="fake-source (CycleGAN) split name")
    parser.add_argument("--t_imdb", default=None, type=str,
                        help="pseudo-labeled target split name")
    parser.add_argument("--t_annotations", default="Annotations_pseudo",
                        type=str, help="target annotation subdir")
    parser.add_argument("--t_split", default="train_t", type=str,
                        help="target image-set name (e.g. train_t_aug = "
                             "pseudo-labeled images + stage-④ mosaics)")
    parser.add_argument("--sep_epoch", default=3, type=int,
                        help="epoch from which separation losses activate "
                             "(reference IDF_train.py:255)")
    args = parser.parse_args()
    print("Called with args:", args)
    cfg = resolve_config(args)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    s_name = args.s_imdb or ds["s_imdb"]
    t_name = args.t_imdb or (ds["t_imdb"] + "_pseudo")
    if args.t_imdb is None:
        # register the pseudo-labeled target split: same images as train_t
        # but annotations from the pseudo-label dir
        def _ctor():
            root = os.path.join(data_dir(), "cityscape", "VOC2007")
            d = VOCDetection(t_name, root, args.t_split,
                             CLASS_SETS["cityscape"])
            d.annotation_dir = args.t_annotations
            orig = d.annotation_path
            d.annotation_path = lambda idx: os.path.join(
                d.root, args.t_annotations, idx + ".xml")
            del orig
            return d
        register_dataset(t_name, _ctor)

    s_ds, s_roidb, _, _ = combined_roidb(s_name)
    t_ds, t_roidb, _, _ = combined_roidb(t_name)
    print(f"source {len(s_roidb)} target(pseudo) {len(t_roidb)} entries")

    s_loader = DetectionLoader(s_roidb, cfg, batch_size=args.batch_size,
                               domain=1, seed=cfg.RNG_SEED,
                           num_workers=args.num_workers)
    t_loader = DetectionLoader(t_roidb, cfg, batch_size=args.batch_size,
                               domain=0, seed=cfg.RNG_SEED + 1,
                           num_workers=args.num_workers)

    model = IDFModel(num_classes=s_ds.num_classes, cfg=cfg, net=args.net,
                     class_agnostic=args.class_agnostic, eta=args.eta,
                     gamma=args.gamma, efocal=args.ef)

    s_it, t_it = iter(s_loader), iter(t_loader)
    src0, tgt0 = next(s_it), next(t_it)
    src0["separation"] = np.zeros((1,), np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(cfg.RNG_SEED),
         "sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        src0, tgt0, training=True)["params"]
    # both branches start from the same pretrained weights (shared init,
    # reference lib/IDF/vgg16.py:270-291)
    params = load_pretrained_backbone(params, args.net,
                                      subtree=("detector", "backbone"))
    params = load_pretrained_backbone(params, args.net,
                                      subtree=("backbone_b",),
                                      head_subtree=("detector", "head"))
    params = load_pretrained_backbone(params, args.net,
                                      subtree=("backbone_b",),
                                      head_subtree=("head_aux",))

    steps_per_epoch = min(len(s_loader), len(t_loader))
    schedule, tx = build_optimizer(args, cfg, steps_per_epoch)
    state = create_train_state(params, tx)

    def apply_fn(p, rngs, src, tgt):
        return model.apply({"params": p}, src, tgt, training=True, rngs=rngs)

    train_step = make_train_step(apply_fn, idf_loss, tx)
    fuse = max(1, getattr(args, "fuse_steps", 1))
    train_multi = None
    if fuse > 1:
        # the per-epoch separation gate rides in each batch (traced scalar),
        # so the fused scan reads each step's own value
        from tllod_tpu.train import make_train_step_multi
        train_multi = make_train_step_multi(apply_fn, idf_loss, tx)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    logger = MetricLogger(args.disp_interval)
    output_dir = os.path.join(args.save_dir, args.net, args.dataset)
    os.makedirs(output_dir, exist_ok=True)

    step = 0
    if args.resume:
        ckpt = os.path.join(
            output_dir, f"idf_{args.checksession}_"
                        f"{args.checkepoch}_{args.checkpoint}")
        state, ckpt_epoch, step = resume_train_state(state, ckpt)
        args.start_epoch = ckpt_epoch + 1
        print(f"resumed from {ckpt} (epoch {ckpt_epoch}, step {step})")

    from common import setup_parallelism
    mesh, state, spatial = setup_parallelism(args, state)

    def write_records(step_i: int, epoch: int, metrics_row: dict) -> None:
        # per-run txt records (reference IDF_train.py:399-415):
        # record_loss.txt = every named loss, record_dist.txt = the six
        # per-block branch distances
        head = (f"[session {args.session}][epoch {epoch:2d}]"
                f"[iter {step_i:4d}/{steps_per_epoch:4d}] ")
        losses = {k: v for k, v in metrics_row.items()
                  if not k.startswith("dist")}
        dists = {k: v for k, v in metrics_row.items()
                 if k.startswith("dist")}
        with open(os.path.join(output_dir, "record_loss.txt"), "a") as f:
            f.write(head + ", ".join(
                f"{k}: {float(v):.4f}"
                for k, v in sorted(losses.items())) + "\n")
        with open(os.path.join(output_dir, "record_dist.txt"), "a") as f:
            f.write(head + ", ".join(
                f"{k}: {float(v):.4f}"
                for k, v in sorted(dists.items())) + "\n")

    for epoch in range(args.start_epoch, args.max_epochs + 1):
        sep = 1.0 if epoch >= args.sep_epoch else 0.0

        def with_sep(it, sep=sep):
            while True:
                src = next(it)
                src["separation"] = np.full((src["im_data"].shape[0],), sep,
                                            np.float32)
                yield src
        s_it_sep = with_sep(s_it)
        todo = steps_per_epoch
        if args.max_steps:
            todo = min(todo, max(0, args.max_steps - step))
        while todo > 0:
            if train_multi is not None and todo >= fuse:
                from common import stack_batches
                srcK = stack_batches(s_it_sep, fuse, mesh, spatial)
                tgtK = stack_batches(t_it, fuse, mesh, spatial)
                state, metricsK = train_multi(state, rng, srcK, tgtK)
                step += fuse
                todo -= fuse
                logger.update_many(step, epoch, lambda s=step: schedule(s),
                                   metricsK, fuse)
                for i in range(fuse):
                    si = step - fuse + i + 1
                    if si % args.disp_interval == 0:
                        write_records(si, epoch,
                                      {k: v[i] for k, v in metricsK.items()})
            else:
                src = shard_batch(next(s_it_sep), mesh, spatial=spatial)
                tgt = shard_batch(next(t_it), mesh, spatial=spatial)
                state, metrics = train_step(state, rng, src, tgt)
                step += 1
                todo -= 1
                logger.update(step, epoch,
                              lambda s=step: schedule(s), metrics)
                if step % args.disp_interval == 0:
                    write_records(step, epoch, metrics)
            if args.max_steps and step >= args.max_steps:
                break
        done = ((args.max_steps and step >= args.max_steps)
                or epoch == args.max_epochs)
        if done or epoch % max(1, getattr(args, "save_epoch_interval",
                                          1)) == 0:
            save_checkpoint(
                os.path.join(output_dir,
                             f"idf_{args.session}_{epoch}_{step}"),
                params=state.params, opt_state=state.opt_state, step=step,
                epoch=epoch, session=args.session,
                meta={"pooling_mode": cfg.POOLING_MODE,
                      "class_agnostic": args.class_agnostic})
            print(f"saved checkpoint for epoch {epoch}")
        if done:
            break


if __name__ == "__main__":
    main()
