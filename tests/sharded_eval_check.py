"""Standalone sharded-vs-single-device eval parity check.

Run as ``python tests/sharded_eval_check.py <workdir>`` in a process whose
environment forces an 8-device CPU host platform (see
``test_sharded_eval.py``, which launches it via
``__graft_entry__._subprocess_env`` so the XLA flags are set at process
start — the only moment they take effect on this container). Exits 0 on
parity, nonzero with a message otherwise.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from tllod_tpu.config import Config  # noqa: E402


def tiny_cfg():
    c = Config()
    train = dataclasses.replace(
        c.TRAIN, RPN_PRE_NMS_TOP_N=300, RPN_POST_NMS_TOP_N=50,
        BATCH_SIZE=32, RPN_BATCHSIZE=32, BG_THRESH_LO=0.0)
    test = dataclasses.replace(
        c.TEST, RPN_PRE_NMS_TOP_N=150, RPN_POST_NMS_TOP_N=20, SCALES=(64,))
    return dataclasses.replace(
        c, TRAIN=train, TEST=test, POOLING_MODE="align",
        ANCHOR_SCALES=(1, 2, 4), MAX_NUM_GT_BOXES=8)


class FakeDataset:
    num_classes = 4
    classes = ("__background__", "a", "b", "c")


def main(workdir: str) -> int:
    import cv2
    import jax

    from tllod_tpu.eval_engine import run_detection
    from tllod_tpu.models.faster_rcnn import FasterRCNN
    from tllod_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(3)
    cfg = tiny_cfg()
    dataset = FakeDataset()
    # 5 images, one bucket, 8 devices → one sharded step with repeat-padding
    roidb = []
    for i in range(5):
        p = os.path.join(workdir, f"se{i}.jpg")
        cv2.imwrite(p, (rng.rand(64, 128, 3) * 255).astype(np.uint8))
        roidb.append({"image": p, "height": 64, "width": 128})

    model = FasterRCNN(num_classes=dataset.num_classes, cfg=cfg, net="vgg16")
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        np.zeros((1, 64, 128, 3), np.float32),
        np.array([[64, 128, 1.0]], np.float32),
        np.zeros((1, cfg.MAX_NUM_GT_BOXES, 5), np.float32),
        training=False)["params"]

    single = run_detection(model, params, dataset, roidb, cfg,
                           verbose_every=0)
    # single-device batched path (--eval_bs): same detections as per-image
    batched = run_detection(model, params, dataset, roidb, cfg,
                            verbose_every=0, eval_batch=3)
    for c in range(1, dataset.num_classes):
        for i in range(len(roidb)):
            if single[c][i].shape != batched[c][i].shape or not np.allclose(
                    single[c][i], batched[c][i], rtol=1e-5, atol=1e-4):
                print(f"FAIL: eval_batch mismatch class {c} image {i}")
                return 5
    mesh = make_mesh()
    if mesh.size != 8:
        print(f"FAIL: expected 8 devices, got {mesh.size}")
        return 2
    sharded = run_detection(model, params, dataset, roidb, cfg,
                            verbose_every=0, mesh=mesh)

    for c in range(1, dataset.num_classes):
        for i in range(len(roidb)):
            if single[c][i].shape != sharded[c][i].shape:
                print(f"FAIL: shape mismatch class {c} image {i}: "
                      f"{single[c][i].shape} vs {sharded[c][i].shape}")
                return 3
            # same detections; values equal up to the float reassociation
            # that batching/vmap introduces (~1e-6)
            if not np.allclose(single[c][i], sharded[c][i],
                               rtol=1e-5, atol=1e-4):
                print(f"FAIL: value mismatch class {c} image {i}")
                return 4
    # composed: mesh sharding AND per-device batching (--shard_eval
    # --eval_bs 2 → chunks of 16 over 5 images, heavy tail padding)
    both = run_detection(model, params, dataset, roidb, cfg,
                         verbose_every=0, mesh=mesh, eval_batch=2)
    for c in range(1, dataset.num_classes):
        for i in range(len(roidb)):
            if single[c][i].shape != both[c][i].shape or not np.allclose(
                    single[c][i], both[c][i], rtol=1e-5, atol=1e-4):
                print(f"FAIL: shard+eval_bs mismatch class {c} image {i}")
                return 6
    print("sharded eval parity OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
