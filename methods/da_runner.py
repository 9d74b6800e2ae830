"""Generic two-stream (source+target) DA training/eval runner.

Every UDAOD method's train script in the reference is the same 450-line loop
with a different model class and loss combination (SURVEY §2.4). This runner
factors that once; per-method entry points stay as thin wrappers that keep
the reference's public script surface.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np

from common import (DATASET_MAP, MetricLogger, build_test_parser,
                    build_train_parser, resolve_config)

from tllod_tpu.data import DetectionLoader, combined_roidb
from tllod_tpu.models.faster_rcnn import FasterRCNN
from tllod_tpu.parallel.mesh import shard_batch
from tllod_tpu.train import create_train_state, make_train_step
from tllod_tpu.utils.checkpoint import (detector_params, load_checkpoint,
                                        restore_into, resume_train_state,
                                        save_checkpoint)
from tllod_tpu.utils.optim import build_optimizer
from tllod_tpu.zoo import load_pretrained_backbone


def run_da_training(method_name: str, model_ctor: Callable,
                    loss_builder: Callable, args,
                    extra_model_kwargs: Optional[dict] = None,
                    extra_backbone_subtrees: tuple = ()) -> None:
    """model_ctor(num_classes, cfg, net, class_agnostic, **kw) → nn.Module
    with ``__call__(src, tgt, training=...)``; loss_builder(args) → fn(out).
    """
    print("Called with args:", args)
    from common import maybe_init_distributed
    maybe_init_distributed()
    cfg = resolve_config(args)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    s_ds, s_roidb, _, _ = combined_roidb(ds["s_imdb"])
    t_ds, t_roidb, _, _ = combined_roidb(ds["t_imdb"])
    print(f"source {len(s_roidb)} target {len(t_roidb)} roidb entries")

    # multi-process: each process streams a strided roidb shard and feeds
    # its 1/P slice of the global batch (mesh.place_global assembles the
    # global arrays; XLA psums the gradients over the full device mesh)
    pcount, pid = jax.process_count(), jax.process_index()
    local_bs = args.batch_size
    if pcount > 1:
        if args.batch_size % pcount != 0:
            raise ValueError(f"--bs {args.batch_size} must be divisible by "
                             f"the {pcount} processes")
        local_bs = args.batch_size // pcount
        from tllod_tpu.parallel.multihost import shard_roidb
        s_roidb, _ = shard_roidb(s_roidb, pid, pcount)
        t_roidb, _ = shard_roidb(t_roidb, pid, pcount)
        print(f"process {pid}: {len(s_roidb)} source / {len(t_roidb)} "
              f"target roidb entries, local bs {local_bs}")

    s_loader = DetectionLoader(s_roidb, cfg, batch_size=local_bs,
                               domain=1, seed=cfg.RNG_SEED,
                           num_workers=args.num_workers)
    t_loader = DetectionLoader(t_roidb, cfg, batch_size=local_bs,
                               domain=0, seed=cfg.RNG_SEED + 1,
                           num_workers=args.num_workers)

    import jax.numpy as jnp
    model = model_ctor(num_classes=s_ds.num_classes, cfg=cfg, net=args.net,
                       class_agnostic=args.class_agnostic,
                       dtype=(jnp.bfloat16 if getattr(args, "bf16", False)
                              else jnp.float32),
                       **(extra_model_kwargs or {}))

    s_it, t_it = iter(s_loader), iter(t_loader)
    src0, tgt0 = next(s_it), next(t_it)
    params = model.init(
        {"params": jax.random.PRNGKey(cfg.RNG_SEED),
         "sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        src0, tgt0, training=True)["params"]
    params = load_pretrained_backbone(params, args.net,
                                      subtree=("detector", "backbone"))
    for sub in extra_backbone_subtrees:
        # e.g. ATF's ancillary branch starts as a copy of the pretrained
        # backbone (reference lib/ATF/vgg16.py:48 deepcopy)
        params = load_pretrained_backbone(params, args.net, subtree=sub,
                                          head_subtree=("detector", "head"))

    steps_per_epoch = min(len(s_loader), len(t_loader))
    schedule, tx = build_optimizer(args, cfg, steps_per_epoch)
    state = create_train_state(params, tx)

    output_dir = os.path.join(args.save_dir, args.net, args.dataset)
    os.makedirs(output_dir, exist_ok=True)
    step = 0
    if args.resume:
        ckpt_path = os.path.join(
            output_dir, f"{method_name}_{args.checksession}_"
                        f"{args.checkepoch}_{args.checkpoint}")
        state, ckpt_epoch, step = resume_train_state(state, ckpt_path)
        args.start_epoch = ckpt_epoch + 1
        print(f"resumed from {ckpt_path} (epoch {ckpt_epoch}, step {step})")

    from common import setup_parallelism, stack_batches
    mesh, state, spatial = setup_parallelism(args, state)

    def apply_fn(params, rngs, src, tgt):
        return model.apply({"params": params}, src, tgt, training=True,
                           rngs=rngs)

    train_step = make_train_step(apply_fn, loss_builder(args), tx)
    fuse = max(1, getattr(args, "fuse_steps", 1))
    train_multi = None
    if fuse > 1:
        from tllod_tpu.train import make_train_step_multi
        train_multi = make_train_step_multi(apply_fn, loss_builder(args), tx)
    rng = jax.random.PRNGKey(cfg.RNG_SEED)
    logger = MetricLogger(
        args.disp_interval,
        jsonl_path=(os.path.join(output_dir, "metrics.jsonl")
                    if args.use_tfboard else None))
    profiler = None
    if getattr(args, "profile", 0):
        from common import StepProfiler
        profiler = StepProfiler(os.path.join(output_dir, "profile"),
                                args.profile)

    for epoch in range(args.start_epoch, args.max_epochs + 1):
        todo = steps_per_epoch
        if args.max_steps:
            todo = min(todo, max(0, args.max_steps - step))
        while todo > 0:
            if train_multi is not None and todo >= fuse:
                # K steps in one dispatch; metrics come back stacked (K,)
                srcK = stack_batches(s_it, fuse, mesh, spatial)
                tgtK = stack_batches(t_it, fuse, mesh, spatial)
                state, metricsK = train_multi(state, rng, srcK, tgtK)
                if profiler is not None:
                    for i in range(fuse):
                        profiler.tick(step + i + 1)
                step += fuse
                todo -= fuse
                logger.update_many(step, epoch, lambda s=step: schedule(s),
                                   metricsK, fuse)
            else:
                src = shard_batch(next(s_it), mesh, spatial=spatial)
                tgt = shard_batch(next(t_it), mesh, spatial=spatial)
                state, metrics = train_step(state, rng, src, tgt)
                step += 1
                todo -= 1
                if profiler is not None:
                    profiler.tick(step)
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
                             f"{method_name}_{args.session}_{epoch}_{step}"),
                params=state.params, opt_state=state.opt_state, step=step,
                epoch=epoch, session=args.session,
                meta={"pooling_mode": cfg.POOLING_MODE,
                      "class_agnostic": args.class_agnostic})
            print(f"saved checkpoint for epoch {epoch}")
        if done:
            break


def run_da_eval(args) -> dict:
    """Evaluate the detector subtree of any DA checkpoint on the chosen
    split (the reference's per-method *_test.py, which all use the vanilla
    detector — SURVEY §1)."""
    from tllod_tpu.eval_engine import evaluate_model

    cfg = resolve_config(args, training=False)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    split = {"test_s": "s_test", "test_t": "t_test",
             "test_all": "all_test"}.get(args.part, "t_test")
    if split not in ds:   # e.g. test_all where no _all split is registered
        split = "t_test"
    dataset, roidb, _, _ = combined_roidb(ds[split], training=False,
                                          use_flipped=False)
    print(f"{len(roidb)} roidb entries for {ds[split]}")

    model = FasterRCNN(num_classes=dataset.num_classes, cfg=cfg,
                       net=args.net, class_agnostic=args.class_agnostic)
    # structure/shape template only — eval_shape traces without compiling
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
    print(f"load checkpoint {ckpt}")
    restored = load_checkpoint(ckpt)
    params = restore_into(template, detector_params(restored["params"]))

    mesh = None
    if getattr(args, "shard_eval", False) and len(jax.devices()) > 1:
        from tllod_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"sharded eval over {mesh.size} devices")

    return evaluate_model(
        model, params, dataset, roidb, cfg,
        os.path.join(args.output_dir, args.net, args.dataset),
        max_per_image=args.max_per_image,
        class_agnostic=args.class_agnostic,
        vis=getattr(args, "vis", False), mesh=mesh,
        eval_batch=getattr(args, "eval_bs", 1))
