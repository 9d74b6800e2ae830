#!/usr/bin/env python
"""End-to-end learning proof (VERDICT r2 item 1): overfit a synthetic
VOC-format dataset through the REAL training CLI, then evaluate with the
REAL eval engine on the training images and require mAP near 1.0.

This exercises the full production path — XML → roidb → bucketed loader →
jitted train step (method model, GRL, optimizer masks, LR schedule) →
orbax checkpoint → detector-subset restore → bucketed eval → VOC AP — and
proves the assembled gradient flow trains in the right direction, which
per-op oracle parity cannot show.

Dataset design: 128×256 images, dark noisy background, each object a solid
class-colored rectangle (class↔color bijection), 3 objects/image, 16
images/split. ``test_s`` lists the SAME images as ``train_s`` so
``--part test_s`` evaluates on the training set (the overfit check);
``train_t``/``test_t`` are a disjoint "target" render of the same kind.

Usage (repo root, TPU or CPU):
  python tools/overfit_synth.py --method daf --steps 400
  python tools/overfit_synth.py --method mad --steps 400
Writes/updates OVERFIT.json at the repo root and exits nonzero if the
final mAP is below --min_map (default 0.85).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLASSES = ("person", "rider", "car", "truck", "bus", "train",
           "motorcycle", "bicycle")
# class ↔ color bijection (BGR-ish spread colors, all far from background)
COLORS = [(230, 40, 40), (40, 230, 40), (40, 40, 230), (230, 230, 40),
          (230, 40, 230), (40, 230, 230), (240, 150, 60), (150, 60, 240)]


def make_dataset(root: str, n: int = 16, seed: int = 0) -> None:
    import cv2

    voc = os.path.join(root, "cityscape", "VOC2007")
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(voc, sub), exist_ok=True)

    def render_split(split: str, seed: int):
        rng = np.random.RandomState(seed)
        names = []
        h, w = 128, 256
        for i in range(n):
            name = f"{split}_{i:03d}"
            im = (rng.rand(h, w, 3) * 40).astype(np.uint8)  # dark noise bg
            objs = []
            for _ in range(3):
                cls = rng.randint(len(CLASSES))
                bw = 30 + rng.randint(30)
                bh = 24 + rng.randint(24)
                x1 = rng.randint(0, w - bw - 1)
                y1 = rng.randint(0, h - bh - 1)
                cv2.rectangle(im, (x1, y1), (x1 + bw, y1 + bh),
                              COLORS[cls], -1)
                objs.append((CLASSES[cls], x1, y1, x1 + bw, y1 + bh))
            cv2.imwrite(os.path.join(voc, "JPEGImages", name + ".jpg"), im)
            xml = "".join(
                f"<object><name>{c}</name><difficult>0</difficult><bndbox>"
                f"<xmin>{a + 1}</xmin><ymin>{b + 1}</ymin>"
                f"<xmax>{cx + 1}</xmax><ymax>{cy + 1}</ymax>"
                f"</bndbox></object>" for c, a, b, cx, cy in objs)
            with open(os.path.join(voc, "Annotations", name + ".xml"),
                      "w") as f:
                f.write(f"<annotation><size><width>{w}</width>"
                        f"<height>{h}</height></size>{xml}</annotation>")
            names.append(name)
        return names

    train_s = render_split("train_s", seed)
    train_t = render_split("train_t", seed + 1)
    for split, names in (("train_s", train_s), ("train_t", train_t),
                         ("test_s", train_s),   # overfit eval = train imgs
                         ("test_t", train_t)):
        with open(os.path.join(voc, "ImageSets", "Main", split + ".txt"),
                  "w") as f:
            f.write("\n".join(names) + "\n")
    print(f"synth overfit dataset at {voc}: {n} imgs/split, "
          f"test_s == train_s")


SET_CFGS = ["TRAIN.SCALES", "(128,)", "TEST.SCALES", "(128,)",
            "TRAIN.RPN_PRE_NMS_TOP_N", "600",
            "TRAIN.RPN_POST_NMS_TOP_N", "64",
            "TRAIN.BATCH_SIZE", "32", "TRAIN.RPN_BATCHSIZE", "64",
            "TEST.RPN_PRE_NMS_TOP_N", "300", "TEST.RPN_POST_NMS_TOP_N", "64",
            "ANCHOR_SCALES", "[2,4,8]", "MAX_NUM_GT_BOXES", "10"]

TRAIN_CLI = {"faster_rcnn": "methods/faster_rcnn/faster_rcnn_train.py",
             "daf": "methods/DAF/DAF_train.py",
             "mad": "methods/MAD/MAD_train.py",
             "atf": "methods/ATF/ATF_train.py",
             "maf": "methods/MAF/MAF_train.py",
             "us_daf": "methods/US_DAF/US_DAF_train.py",
             "idf": "methods/IDF/IDF_train.py",
             "pa_atf": "methods/PA_ATF/PA_ATF_train.py",
             "pt_maf": "methods/PT_MAF/PT_MAF_train.py"}
# Canonical per-method hyperparameters from the reference .sh recipes —
# used when --lr is not given explicitly.  ATF/PA-ATF train at 1e-3
# (``/root/reference/methods/ATF/ATF_train.sh`` / ``PA_ATF_train.sh``; the
# first ATF overfit attempt at DAF's 2e-3 diverged — adversarial image-DA
# blowup, mAP 0.11), PA-ATF additionally runs λ=0.7 β=0.1.
METHOD_LR = {"atf": 1e-3, "pa_atf": 1e-3}
# ATF overfits with the DA trade-off turned down to λ=0.01 (a reference CLI
# knob, ``methods/ATF/ATF_train.py:105``).  At the canonical λ=0.1 the
# 16-image adversarial game runs away — the feature side saturates the
# image discriminators (tgt_da_img BCE spikes to 35) and detection never
# converges (two honest failures recorded: lr 2e-3 → mAP 0.110, lr 1e-3 →
# mAP 0.038).  With λ=0.01 the same program converges to 0.977; the
# instability is a tiny-data regime artifact of the min-max objective, not
# a program bug (ATF's loss terms are pinned against the reference in
# tests/test_golden_methods.py).
METHOD_EXTRA = {"atf": ["--lamda", "0.01"],
                "pa_atf": ["--lamda", "0.7", "--beta", "0.1"]}
# PA-ATF's partial-alignment mask head (5x5 s3 -> 2x2 pool -> 3x3 s2, all
# VALID — faithful to ``lib/PA_ATF/faster_rcnn.py:69-103``, designed for
# 600-px inputs) needs shortest side ≥ 320 or the conv4/conv5 taps collapse
# to zero-size spatial dims. Appended AFTER SET_CFGS so the later pair wins.
METHOD_SET = {"pa_atf": ["TRAIN.SCALES", "(320,)", "TEST.SCALES", "(320,)"]}

TEST_CLI = {"faster_rcnn": "methods/faster_rcnn/faster_rcnn_test.py",
            "daf": "methods/DAF/DAF_test.py",
            "mad": "methods/MAD/MAD_test.py",
            "atf": "methods/ATF/ATF_test.py",
            "maf": "methods/MAF/MAF_test.py",
            "us_daf": "methods/US_DAF/US_DAF_test.py",
            "idf": "methods/IDF/IDF_test.py",
            "pa_atf": "methods/PA_ATF/PA_ATF_test.py",
            "pt_maf": "methods/PT_MAF/PT_MAF_test.py"}


def train_source_teacher(args, env, log, out_name, steps=None):
    """Source-only Faster R-CNN (IDF stage ②; PT-MAF's teacher —
    ``/root/reference/methods/PT_MAF/PT_MAF_train.py:253-262`` loads a
    pretrained source detector). Returns the checkpoint path."""
    steps = steps or args.steps
    epochs = max(1, (steps + 15) // 16)
    s_dir = os.path.join(args.root, out_name)
    rc = run([sys.executable, "methods/faster_rcnn/faster_rcnn_train.py",
              "--dataset", "cityscape", "--net", args.net, "--bs", "1",
              "--lr", str(args.lr), "--lr_decay_step", "1000",
              "--epochs", str(epochs), "--max_steps", str(steps),
              "--disp_interval", "50", "--save_epoch_interval", "1000",
              "--save_dir", s_dir, "--set"] + SET_CFGS, env, log)
    if rc != 0:
        sys.exit(f"source-only teacher training failed rc={rc} (see {log})")
    ck_dir = os.path.join(s_dir, args.net, "cityscape")
    ckpts = sorted((f for f in os.listdir(ck_dir)
                    if re.match(r"faster_rcnn_\d+_\d+_\d+$", f)),
                   key=lambda f: int(f.rsplit("_", 1)[1]))
    return os.path.join(ck_dir, ckpts[-1])


def run_idf_pipeline(args, env, save_dir, log):
    """IDF stages ②→④ (the prerequisites of the stage-⑤ CLI): source-only
    detector → pseudo-label XMLs on train_t → offline mosaics → combined
    target split ``train_t_aug``. Returns the extra stage-⑤ train flags.
    Reference pipeline: ``/root/reference/methods/IDF/IDF_train.sh:1-17``
    (stage ① CycleGAN is external there too — the synthetic source split
    plays the translated images)."""
    s2_ckpt = train_source_teacher(args, env, log, "out_idf_stage2")

    rc = run([sys.executable, "tools/generate_pseudo_labels.py",
              "--dataset", "cityscape", "--part", "train_t",
              "--net", args.net, "--load_name", s2_ckpt,
              "--threshold", "0.7", "--output_dir",
              os.path.join(args.root, "eval_idf_s3"),
              "--set"] + SET_CFGS, env, log)
    if rc != 0:
        sys.exit(f"idf stage-3 pseudo labels failed rc={rc} (see {log})")

    voc = os.path.join(args.root, "cityscape", "VOC2007")
    rc = run([sys.executable, "tools/mosaic_augment.py", "--root", voc,
              "--split", "train_t", "--annotations", "Annotations_pseudo",
              "--num", "8", "--width", "512", "--height", "256"],
             env, log)
    if rc != 0:
        sys.exit(f"idf stage-4 mosaic failed rc={rc} (see {log})")

    sets = os.path.join(voc, "ImageSets", "Main")
    names = []
    for split in ("train_t", "train_t_mosaic"):
        p = os.path.join(sets, split + ".txt")
        if os.path.exists(p):
            names += [x.strip() for x in open(p) if x.strip()]
    # only images that actually got pseudo labels
    names = [n for n in names if os.path.exists(
        os.path.join(voc, "Annotations_pseudo", n + ".xml"))]
    assert names, "stage 3 produced no pseudo-labeled images"
    with open(os.path.join(sets, "train_t_aug.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return ["--t_split", "train_t_aug", "--sep_epoch", "3"]


def run(cmd, env, log_path):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    with open(log_path, "a") as log:
        res = subprocess.run(cmd, cwd=REPO, env=env, stdout=log,
                             stderr=subprocess.STDOUT)
    print(f"  rc={res.returncode} in {time.time() - t0:.0f}s "
          f"(log {log_path})", flush=True)
    return res.returncode


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="daf", choices=sorted(TRAIN_CLI))
    ap.add_argument("--net", default="vgg16",
                    help="backbone (us_daf's published setting is res101)")
    ap.add_argument("--root", default="/tmp/overfit_data")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: the method's canonical reference lr")
    ap.add_argument("--min_map", type=float, default=0.85)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--extra", action="append", default=[],
                    help="extra train-CLI flag token (repeatable), e.g. "
                         "--extra=--lamda --extra=0.01")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "cityscape", "VOC2007",
                                       "ImageSets", "Main", "test_s.txt")):
        make_dataset(args.root)

    env = dict(os.environ)
    env["TLLOD_DATA_DIR"] = args.root
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tllod_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    m = args.method
    if args.lr is None:
        args.lr = METHOD_LR.get(m, 2e-3)
    save_dir = os.path.join(args.root, f"out_{m}_{args.net}"
                            if args.net != "vgg16" else f"out_{m}")
    log = os.path.join(args.root, f"{m}.log")
    epochs = max(1, (args.steps + 15) // 16)   # 16 imgs/split, bs 1
    if not args.skip_train:
        extra = []
        if m == "idf":
            extra = run_idf_pipeline(args, env, save_dir, log)
        elif m == "pt_maf":
            # PT-MAF requires a trained source-only teacher
            # (methods/PT_MAF/PT_MAF_train.py --teacher_ckpt)
            teacher = train_source_teacher(args, env, log,
                                           "out_pt_maf_teacher")
            extra = ["--teacher_ckpt", teacher]
        extra += METHOD_EXTRA.get(m, []) + args.extra
        rc = run([sys.executable, TRAIN_CLI[m], "--dataset", "cityscape",
                  "--net", args.net, "--bs", "1", "--lr", str(args.lr),
                  "--lr_decay_step", "1000", "--epochs", str(epochs),
                  "--max_steps", str(args.steps), "--disp_interval", "20",
                  # each epoch save fetches ~1 GB over the TPU tunnel
                  # (~5 min on this host) — only the final one matters here
                  "--save_epoch_interval", "1000",
                  "--save_dir", save_dir, "--set"] + SET_CFGS
                 + METHOD_SET.get(m, []) + extra,
                 env, log)
        if rc != 0:
            sys.exit(f"{m} training failed rc={rc} (see {log})")

    ckpts = sorted(
        (f for f in os.listdir(os.path.join(save_dir, args.net,
                                            "cityscape"))
         if re.match(rf"{m}_\d+_\d+_\d+$", f)),
        key=lambda f: int(f.rsplit("_", 1)[1]))
    assert ckpts, f"no checkpoints under {save_dir}"
    ckpt = os.path.join(save_dir, args.net, "cityscape", ckpts[-1])

    eval_log = os.path.join(args.root, f"{m}_eval.log")
    open(eval_log, "w").close()
    rc = run([sys.executable, TEST_CLI[m], "--dataset", "cityscape",
              "--part", "test_s", "--net", args.net,
              "--load_name", ckpt,
              "--output_dir", os.path.join(args.root, f"eval_{m}"),
              "--set"] + SET_CFGS + METHOD_SET.get(m, []), env, eval_log)
    if rc != 0:
        sys.exit(f"{m} eval failed rc={rc} (see {eval_log})")

    text = open(eval_log).read()
    mm = re.findall(r"Mean AP = ([0-9.]+)", text)
    assert mm, f"no Mean AP in {eval_log}"
    final_map = float(mm[-1])

    results = {}
    out_path = os.path.join(REPO, "OVERFIT.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    key = m if args.net == "vgg16" else f"{m}_{args.net}"
    extra_flags = METHOD_EXTRA.get(m, []) + args.extra
    results[key] = {"steps": args.steps, "lr": args.lr, "net": args.net,
                  **({"extra": " ".join(extra_flags)} if extra_flags else {}),
                  "train_map_overfit": final_map,
                  "checkpoint": ckpt,
                  "backend": "tpu" if "tpu" in text.lower() or
                             "axon" in text.lower() else "cpu"}
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{m}: overfit mAP on training images = {final_map:.4f} "
          f"(threshold {args.min_map}) → {out_path}")
    sys.exit(0 if final_map >= args.min_map else 1)


if __name__ == "__main__":
    main()
