"""Crop-to-ratio transform and COCO-json dataset reader."""

import json
import os

import numpy as np

from tllod_tpu.data.coco import COCODetection
from tllod_tpu.data.transforms import crop_to_ratio


def test_crop_to_ratio_wide(rng):
    im = rng.rand(100, 400, 3).astype(np.float32)  # ratio 4 → crop width
    gt = np.array([[150, 20, 260, 80]], np.float32)
    out, g = crop_to_ratio(im, gt, 2.0, rng)
    assert out.shape[1] == 200 and out.shape[0] == 100
    # gt stays inside and keeps its extent
    assert 0 <= g[0, 0] <= g[0, 2] <= 199
    assert g[0, 2] - g[0, 0] == 110  # fully covered (box 110 < crop 200)


def test_crop_to_ratio_tall(rng):
    im = rng.rand(400, 100, 3).astype(np.float32)  # ratio 0.25 → crop height
    gt = np.array([[10, 150, 80, 260]], np.float32)
    out, g = crop_to_ratio(im, gt, 0.5, rng)
    assert out.shape[0] == 200 and out.shape[1] == 100
    assert 0 <= g[0, 1] <= g[0, 3] <= 199


def test_coco_reader(tmp_path, rng):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    data = {
        "images": [{"id": 7, "file_name": "a.jpg", "width": 100,
                    "height": 80},
                   {"id": 9, "file_name": "b.jpg", "width": 60,
                    "height": 60}],
        "categories": [{"id": 3, "name": "cat"}, {"id": 11, "name": "dog"}],
        "annotations": [
            {"image_id": 7, "category_id": 3, "bbox": [10, 10, 30, 20],
             "iscrowd": 0},
            {"image_id": 7, "category_id": 11, "bbox": [50, 30, 40, 45],
             "iscrowd": 0},
            {"image_id": 7, "category_id": 3, "bbox": [0, 0, 5, 5],
             "iscrowd": 1},  # crowd → dropped
            {"image_id": 9, "category_id": 11, "bbox": [5, 5, 20, 20],
             "iscrowd": 0},
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(data))
    ds = COCODetection("coco_test", str(img_dir), str(ann))
    assert ds.classes == ("__background__", "cat", "dog")
    roidb = ds.gt_roidb()
    assert len(roidb) == 2
    assert len(roidb[0]["boxes"]) == 2          # crowd excluded
    np.testing.assert_allclose(roidb[0]["boxes"][0], [10, 10, 39, 29])
    assert roidb[0]["gt_classes"].tolist() == [1, 2]
    # clipping to image bounds
    np.testing.assert_allclose(roidb[0]["boxes"][1], [50, 30, 89, 74])
    assert roidb[1]["gt_classes"].tolist() == [2]
