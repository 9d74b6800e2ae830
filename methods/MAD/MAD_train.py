#!/usr/bin/env python
"""MAD training entry point (reference ``methods/MAD/MAD_train.py``):
domain-generalized training on two source views with multi-view adversarial
autoencoders and an epoch-ramped loss weight.

``--dataset cityscape`` uses train_s as both views (distinct shuffle
streams); ``--dataset dg_union`` composes the reference's
SourceSet_TargetSet_CoSet imdb names from ``--S1_Set/--S2_Set/--T_Set/...``
(MAD_train.py:286-293) and resolves them through the DG union label space
(``tllod_tpu/data/union.py``); ``--s1_imdb/--s2_imdb`` give explicit names.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (DATASET_MAP, MetricLogger,  # noqa: E402
                    build_train_parser, resolve_config)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tllod_tpu.data import DetectionLoader, combined_roidb  # noqa: E402
from tllod_tpu.methods.mad import MADModel, mad_loss  # noqa: E402
from tllod_tpu.parallel.mesh import shard_batch  # noqa: E402
from tllod_tpu.train import create_train_state, make_train_step  # noqa: E402
from tllod_tpu.utils.checkpoint import (resume_train_state,  # noqa: E402
                                        save_checkpoint)
from tllod_tpu.utils.optim import build_optimizer  # noqa: E402
from tllod_tpu.zoo import load_pretrained_backbone  # noqa: E402


def main():
    parser = build_train_parser("Train a MAD network (TPU)")
    parser.add_argument("--s1_imdb", default=None, type=str)
    parser.add_argument("--s2_imdb", default=None, type=str)
    # dg_union flags (reference MAD_train.py:142-181): two source sets + a
    # held-out target, each named {Set}_{other}_{other2}_{Type}_{Year}_{Part}
    # and resolved against the DG union label space (data/union.py)
    parser.add_argument("--S1_Set", default="cityscape", type=str)
    parser.add_argument("--S1_Part", default="train", type=str)
    parser.add_argument("--S1_Type", default="s1", type=str)
    parser.add_argument("--S2_Set", default="cityscape", type=str)
    parser.add_argument("--S2_Part", default="train", type=str)
    parser.add_argument("--S2_Type", default="s1", type=str)
    parser.add_argument("--T_Set", default="cityscape", type=str)
    parser.add_argument("--T_Part", default="test", type=str)
    parser.add_argument("--T_Type", default="s1", type=str)
    parser.add_argument("--DataYear", default="2007", type=str)
    # upstream-compat flags (MAD_train.py:128-180): --loadname names the
    # resume checkpoint inside save_dir; --log_flag gates the extra txt
    # logs (mapped to the JSONL metrics sink); --mode selects the
    # train/test entry inside upstream's single script; --DaraType (sic)
    # is parsed upstream but never used.
    parser.add_argument("--loadname", default=None, type=str,
                        help="with --r: checkpoint name under save_dir "
                             "(reference MAD_train.py:481)")
    parser.add_argument("--log_flag", action="store_true",
                        help="alias of --use_tfb (upstream txt loss logs)")
    parser.add_argument("--mode", default="train_model",
                        choices=("train_model", "test_model"))
    parser.add_argument("--DaraType", dest="DataType", default="s1",
                        type=str, help="parsed but unused upstream "
                                       "(MAD_train.py:176); accepted for "
                                       "script compatibility")
    args = parser.parse_args()
    if args.mode == "test_model":
        raise SystemExit("--mode test_model: use methods/MAD/MAD_test.py "
                         "(this repo splits upstream's single script)")
    if args.log_flag:
        args.use_tfboard = True
    print("Called with args:", args)
    cfg = resolve_config(args)
    np.random.seed(cfg.RNG_SEED)

    if args.dataset == "dg_union":
        # reference MAD_train.py:286-292 name composition
        s1_name = "_".join([args.S1_Set, args.T_Set, args.S2_Set,
                            args.S1_Type, args.DataYear, args.S1_Part])
        s2_name = "_".join([args.S2_Set, args.T_Set, args.S1_Set,
                            args.S2_Type, args.DataYear, args.S2_Part])
    elif args.s1_imdb and args.s2_imdb:
        s1_name, s2_name = args.s1_imdb, args.s2_imdb
    else:
        ds = DATASET_MAP[args.dataset]
        s1_name = s2_name = ds["s_imdb"]
    s1_ds, s1_roidb, _, _ = combined_roidb(s1_name)
    s2_ds, s2_roidb, _, _ = combined_roidb(s2_name)
    assert s1_ds.classes == s2_ds.classes, (
        "source views must share one label space — use the dg_union naming "
        f"for heterogeneous sets ({s1_ds.classes} vs {s2_ds.classes})")
    print(f"s1 {len(s1_roidb)} s2 {len(s2_roidb)} roidb entries, "
          f"{s1_ds.num_classes} classes")

    l1 = DetectionLoader(s1_roidb, cfg, batch_size=args.batch_size,
                         domain=1, seed=cfg.RNG_SEED,
                           num_workers=args.num_workers)
    l2 = DetectionLoader(s2_roidb, cfg, batch_size=args.batch_size,
                         domain=0, seed=cfg.RNG_SEED + 7,
                           num_workers=args.num_workers)

    model = MADModel(num_classes=s1_ds.num_classes, cfg=cfg, net=args.net,
                     class_agnostic=args.class_agnostic)
    it1, it2 = iter(l1), iter(l2)
    b1, b2 = next(it1), next(it2)
    params = model.init(
        {"params": jax.random.PRNGKey(cfg.RNG_SEED),
         "sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        b1, b2, training=True)["params"]
    params = load_pretrained_backbone(params, args.net,
                                      subtree=("detector", "backbone"))

    steps_per_epoch = min(len(l1), len(l2))
    schedule, tx = build_optimizer(args, cfg, steps_per_epoch)
    state = create_train_state(params, tx)

    def apply_fn(p, rngs, s1, s2):
        out = model.apply({"params": p}, s1, s2, training=True, rngs=rngs)
        # epoch-ramped loss weight rides in the batch (traced scalar) — this
        # is also what lets --fuse_steps scan it: each fused step reads its
        # own batch's epoch value
        out["epoch"] = s1["epoch"][0]
        return out

    mad_loss_fn = lambda out: mad_loss(out, out["epoch"])  # noqa: E731
    train_step = make_train_step(apply_fn, mad_loss_fn, tx)
    fuse = max(1, getattr(args, "fuse_steps", 1))
    train_multi = None
    if fuse > 1:
        from tllod_tpu.train import make_train_step_multi
        train_multi = make_train_step_multi(apply_fn, mad_loss_fn, tx)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    logger = MetricLogger(args.disp_interval)
    output_dir = os.path.join(args.save_dir, args.net, args.dataset)
    os.makedirs(output_dir, exist_ok=True)

    step = 0
    if args.resume:
        ckpt = os.path.join(
            output_dir, args.loadname or
            f"mad_{args.checksession}_{args.checkepoch}_{args.checkpoint}")
        state, ckpt_epoch, step = resume_train_state(state, ckpt)
        args.start_epoch = ckpt_epoch + 1
        print(f"resumed from {ckpt} (epoch {ckpt_epoch}, step {step})")

    from common import setup_parallelism
    mesh, state, spatial = setup_parallelism(args, state)

    for epoch in range(args.start_epoch, args.max_epochs + 1):
        def with_epoch(it, epoch=None):
            # inject the epoch weight into each view-1 batch (the traced
            # scalar mad_loss ramps on) before sharding/stacking
            while True:
                s1 = next(it)
                s1["epoch"] = np.full((s1["im_data"].shape[0],), epoch,
                                      np.float32)
                yield s1
        it1e = with_epoch(it1, epoch=epoch)
        todo = steps_per_epoch
        if args.max_steps:
            todo = min(todo, max(0, args.max_steps - step))
        while todo > 0:
            if train_multi is not None and todo >= fuse:
                from common import stack_batches
                s1K = stack_batches(it1e, fuse, mesh, spatial)
                s2K = stack_batches(it2, fuse, mesh, spatial)
                state, metricsK = train_multi(state, rng, s1K, s2K)
                step += fuse
                todo -= fuse
                logger.update_many(step, epoch, lambda s=step: schedule(s),
                                   metricsK, fuse)
            else:
                s1 = shard_batch(next(it1e), mesh, spatial=spatial)
                s2 = shard_batch(next(it2), mesh, spatial=spatial)
                state, metrics = train_step(state, rng, s1, s2)
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
                             f"mad_{args.session}_{epoch}_{step}"),
                params=state.params, opt_state=state.opt_state, step=step,
                epoch=epoch, session=args.session,
                meta={"pooling_mode": cfg.POOLING_MODE,
                      "class_agnostic": args.class_agnostic})
            print(f"saved checkpoint for epoch {epoch}")
        if done:
            break


if __name__ == "__main__":
    main()
