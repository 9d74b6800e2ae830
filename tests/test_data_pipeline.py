"""Data layer end-to-end: synthetic VOC dataset → loader batches → eval."""

import os

import numpy as np
import pytest

from tllod_tpu.config import Config
from tllod_tpu.data.evaluate import evaluate_detections
from tllod_tpu.data.loader import DetectionLoader, EvalLoader
from tllod_tpu.data.roidb import (append_flipped, combined_roidb,
                                  rank_roidb_ratio)
from tllod_tpu.data.voc import VOCDetection
from tllod_tpu.data.voc_eval import voc_ap

CLASSES = ("__background__", "widget", "gadget")


def _make_voc(tmpdir, n_images=4, w=160, h=96, seed=0):
    import cv2
    rng = np.random.RandomState(seed)
    root = str(tmpdir)
    for sub in ("JPEGImages", "Annotations", os.path.join("ImageSets",
                                                          "Main")):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    names, gts = [], {}
    for i in range(n_images):
        name = f"img_{i:03d}"
        names.append(name)
        im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        boxes = []
        for b in range(2):
            x1 = int(rng.rand() * (w - 40))
            y1 = int(rng.rand() * (h - 40))
            x2, y2 = x1 + 25 + int(rng.rand() * 10), y1 + 25 + int(
                rng.rand() * 10)
            cls = CLASSES[1 + rng.randint(2)]
            boxes.append((cls, x1 + 1, y1 + 1, x2 + 1, y2 + 1))  # 1-based VOC
            im[y1:y2, x1:x2] = (255, 0, 0) if cls == "widget" else (0, 255, 0)
        gts[name] = boxes
        cv2.imwrite(os.path.join(root, "JPEGImages", name + ".jpg"), im)
        objs = "".join(
            f"<object><name>{c}</name><difficult>0</difficult><bndbox>"
            f"<xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax>"
            f"<ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2 in boxes)
        xml = (f"<annotation><size><width>{w}</width><height>{h}</height>"
               f"<depth>3</depth></size>{objs}</annotation>")
        with open(os.path.join(root, "Annotations", name + ".xml"), "w") as f:
            f.write(xml)
    with open(os.path.join(root, "ImageSets", "Main", "train.txt"),
              "w") as f:
        f.write("\n".join(names) + "\n")
    return root, names, gts


@pytest.fixture
def voc(tmp_path):
    root, names, gts = _make_voc(tmp_path)
    ds = VOCDetection("synthetic_train", root, "train", CLASSES)
    return ds, names, gts


def test_parse_and_flip(voc):
    ds, names, gts = voc
    roidb = ds.gt_roidb()
    assert len(roidb) == len(names)
    e = roidb[0]
    assert e["boxes"].shape[1] == 4 and len(e["gt_classes"]) == 2
    # 0-based conversion
    name = names[0]
    want = np.array([[b[1] - 1, b[2] - 1, b[3] - 1, b[4] - 1]
                     for b in gts[name]], np.float32)
    np.testing.assert_allclose(e["boxes"], want)

    flipped = append_flipped(roidb)
    assert len(flipped) == 2 * len(roidb)
    f = flipped[len(roidb)]
    assert f["flipped"]
    np.testing.assert_allclose(f["boxes"][:, 0],
                               e["width"] - e["boxes"][:, 2] - 1)


def test_loader_shapes_and_domain(voc):
    ds, _, _ = voc
    roidb = ds.gt_roidb()
    rank_roidb_ratio(roidb)
    cfg = Config()
    loader = DetectionLoader(roidb, cfg, domain=0, pad_multiple=100)
    it = iter(loader)
    seen = set()
    for _ in range(6):
        b = next(it)
        assert b["im_data"].ndim == 4 and b["im_data"].shape[3] == 3
        assert b["im_data"].shape[1] % 100 == 0
        assert b["im_info"].shape == (1, 3)
        h, w, scale = b["im_info"][0]
        assert min(h, w) == cfg.TRAIN.SCALES[0]  # short side 600
        assert b["gt_boxes"].shape == (1, cfg.MAX_NUM_GT_BOXES, 5)
        assert b["num_boxes"][0] == 2
        assert (b["domain"] == 0).all()
        # gt inside image
        g = b["gt_boxes"][0, :2]
        assert g[:, 2].max() <= w and g[:, 3].max() <= h
        assert (g[:, 4] >= 1).all()
        seen.add(round(float(scale), 4))
    assert seen == {round(600.0 / 96.0, 4)}


def test_eval_loader(voc):
    ds, _, _ = voc
    roidb = ds.gt_roidb()
    cfg = Config()
    batches = list(EvalLoader(roidb, cfg))
    assert len(batches) == len(roidb)
    assert all(b["im_info"][0, 0] == 600 for b in batches)


def test_voc_eval_perfect_detections(voc, tmp_path):
    ds, names, gts = voc
    # detections == ground truth at confidence 0.9 → AP == 1 for every class
    all_boxes = [[[] for _ in names] for _ in CLASSES]
    for i, name in enumerate(names):
        for c_i, cls in enumerate(CLASSES):
            dets = [(x1 - 1, y1 - 1, x2 - 1, y2 - 1, 0.9)
                    for c, x1, y1, x2, y2 in gts[name] if c == cls]
            all_boxes[c_i][i] = np.array(dets, np.float32).reshape(-1, 5)
    aps = evaluate_detections(ds, all_boxes, str(tmp_path / "eval"),
                              use_07_metric=True)
    assert aps["mAP"] > 0.99


def test_voc_eval_misses_lower_ap(voc, tmp_path):
    ds, names, gts = voc
    all_boxes = [[[] for _ in names] for _ in CLASSES]
    for i, name in enumerate(names):
        for c_i, cls in enumerate(CLASSES):
            dets = [(x1 - 1, y1 - 1, x2 - 1, y2 - 1, 0.9)
                    for c, x1, y1, x2, y2 in gts[name] if c == cls]
            if i % 2 == 0:
                dets = []  # miss everything on half the images
            all_boxes[c_i][i] = np.array(dets, np.float32).reshape(-1, 5)
    aps = evaluate_detections(ds, all_boxes, str(tmp_path / "eval"),
                              use_07_metric=True)
    assert 0.1 < aps["mAP"] < 1.0


def test_voc_ap_metrics():
    rec = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    prec = np.array([1.0, 1.0, 0.8, 0.7, 0.6])
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    ap_auc = voc_ap(rec, prec, use_07_metric=False)
    assert 0 < ap_auc <= 1 and 0 < ap07 <= 1
    # value from executing the reference voc_ap on this curve (includes the
    # reference's np.arange floating-point threshold quirk at t=0.4)
    np.testing.assert_allclose(ap07, 0.8272727272727273, rtol=1e-9)
    np.testing.assert_allclose(ap_auc, np.trapezoid(
        np.concatenate(([1.0], prec)), np.concatenate(([0.0], rec))),
        atol=0.06)
