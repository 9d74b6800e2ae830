"""COCO bbox protocol (data/coco_eval.py) against hand-computed oracles
mirroring pycocotools semantics (reference lib/pycocotools/cocoeval.py)."""

import numpy as np

from tllod_tpu.data.coco_eval import (IOU_THRS, evaluate_coco, evaluate_img,
                                      iou_xywh)


def g(x, y, w, h, crowd=0):
    return {"bbox": [x, y, w, h], "area": float(w * h), "iscrowd": crowd}


def d(x, y, w, h, score):
    return {"bbox": [x, y, w, h], "score": score}


def test_iou_xywh_basic_and_crowd():
    dts = np.array([[0, 0, 10, 10]], float)
    gts = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    ious = iou_xywh(dts, gts, np.array([0, 0]))
    assert np.isclose(ious[0, 0], 1.0)
    assert np.isclose(ious[0, 1], 25.0 / 175.0)
    # crowd: intersection / det area
    ious_c = iou_xywh(dts, gts, np.array([0, 1]))
    assert np.isclose(ious_c[0, 1], 25.0 / 100.0)


def test_perfect_detection_ap_1():
    gts = {(1, 1): [g(10, 10, 20, 20)]}
    dts = {(1, 1): [d(10, 10, 20, 20, 0.9)]}
    out = evaluate_coco(gts, dts, [1], [1])
    assert np.isclose(out["stats"]["AP"], 1.0)
    assert np.isclose(out["stats"]["AP50"], 1.0)
    assert np.isclose(out["stats"]["AR_100"], 1.0)
    # 20x20 box is small (<32^2): small AP defined, large undefined (-1)
    assert np.isclose(out["stats"]["AP_small"], 1.0)
    assert out["stats"]["AP_large"] == -1.0


def test_iou_half_only_matches_t50():
    # det covers exactly half the gt → IoU 0.5: TP at t=0.5, FP above
    gts = {(1, 1): [g(0, 0, 10, 20)]}
    dts = {(1, 1): [d(0, 0, 10, 10, 0.9)]}
    out = evaluate_coco(gts, dts, [1], [1])
    assert np.isclose(out["stats"]["AP50"], 1.0)
    assert np.isclose(out["stats"]["AP75"], 0.0)
    assert np.isclose(out["stats"]["AP"], 0.1)   # 1 of 10 thresholds


def test_duplicate_detection_is_fp():
    gts = {(1, 1): [g(0, 0, 10, 10)]}
    dts = {(1, 1): [d(0, 0, 10, 10, 0.9), d(0, 0, 10, 10, 0.8)]}
    out = evaluate_coco(gts, dts, [1], [1])
    # precision: [1, 1/2] at recall [1, 1] → interpolated p=1 at all recalls
    assert np.isclose(out["stats"]["AP50"], 1.0)


def test_crowd_match_is_ignored_not_fp():
    # one real gt + one crowd region; second det falls on the crowd
    gts = {(1, 1): [g(0, 0, 10, 10), g(50, 50, 40, 40, crowd=1)]}
    dts = {(1, 1): [d(0, 0, 10, 10, 0.9), d(55, 55, 20, 20, 0.8)]}
    out = evaluate_coco(gts, dts, [1], [1])
    # crowd IoU = 400/400 = 1 → matched to ignored gt → ignored, so the
    # remaining curve is a perfect single TP
    assert np.isclose(out["stats"]["AP"], 1.0)


def test_unmatched_det_is_fp_lowers_precision():
    gts = {(1, 1): [g(0, 0, 10, 10)]}
    # false positive scored ABOVE the true positive
    dts = {(1, 1): [d(100, 100, 10, 10, 0.95), d(0, 0, 10, 10, 0.9)]}
    out = evaluate_coco(gts, dts, [1], [1])
    # curve: fp then tp → precision at recall 1.0 is 1/2; q = 0.5 everywhere
    assert np.isclose(out["stats"]["AP50"], 0.5)


def test_max_dets_1_takes_top_scoring_only():
    gts = {(1, 1): [g(0, 0, 10, 10), g(100, 100, 10, 10)]}
    dts = {(1, 1): [d(100, 100, 10, 10, 0.9), d(0, 0, 10, 10, 0.8)]}
    out = evaluate_coco(gts, dts, [1], [1])
    assert np.isclose(out["stats"]["AR_1"], 0.5)
    assert np.isclose(out["stats"]["AR_100"], 1.0)


def test_area_ranges_partition():
    # large gt (100x100=10000 > 96^2) and small gt (10x10)
    gts = {(1, 1): [g(0, 0, 100, 100), g(200, 200, 10, 10)]}
    dts = {(1, 1): [d(0, 0, 100, 100, 0.9)]}   # only the large one found
    out = evaluate_coco(gts, dts, [1], [1])
    assert np.isclose(out["stats"]["AP_large"], 1.0)
    assert np.isclose(out["stats"]["AP_small"], 0.0)
    assert out["stats"]["AP_medium"] == -1.0
    assert np.isclose(out["stats"]["AR_100"], 0.5)


def test_evaluate_img_ignored_gt_cannot_steal_real_match():
    # det overlaps an in-range gt at 0.6 and an out-of-range (ignored) gt
    # at 0.9: cocoeval keeps the real match once found (break rule), so the
    # det is a TP at t=0.5, not ignored.
    gt = [g(0, 0, 10, 10), {"bbox": [0, 0, 200, 200], "area": 4e4,
                            "iscrowd": 0}]
    dt = [d(0, 2, 10, 10, 0.9)]   # IoU vs gt0 = 8/12 ≈ 0.667
    res = evaluate_img([dict(x) for x in gt], [dict(x) for x in dt],
                       (0.0, 32.0 ** 2), 100)
    t50 = int(np.where(np.isclose(IOU_THRS, 0.5))[0][0])
    assert res["dt_matches"][t50, 0] == 1
    assert not res["dt_ignore"][t50, 0]


def test_missed_class_contributes_zero_not_excluded():
    # two categories, one with no detections at all
    gts = {(1, 1): [g(0, 0, 50, 50)], (1, 2): [g(60, 60, 50, 50)]}
    dts = {(1, 1): [d(0, 0, 50, 50, 0.9)]}
    out = evaluate_coco(gts, dts, [1, 2], [1])
    assert np.isclose(out["stats"]["AP"], 0.5)
