"""Pipeline-tool regression tests: mosaic augmentation (IDF stage ④),
pseudo-label XML writing (stage ③), and the JSONL metrics sink
(``--use_tfb``) — previously only exercised by manual e2e drives."""

import json
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def test_make_mosaic_boxes_stay_in_quadrants():
    from tools.mosaic_augment import make_mosaic

    rng = np.random.RandomState(0)
    images, annos = [], []
    for i in range(4):
        im = np.full((80, 120, 3), i * 40, np.uint8)
        images.append(im)
        annos.append([("car", 10.0, 10.0, 60.0, 50.0)])
    canvas, objs = make_mosaic(images, annos, 200, 160, rng)
    assert canvas.shape == (160, 200, 3)
    assert canvas.dtype == np.uint8
    for cls, x1, y1, x2, y2 in objs:
        assert cls == "car"
        # 1-based VOC coords inside the canvas, non-degenerate
        assert 1 <= x1 < x2 <= 200 and 1 <= y1 < y2 <= 160
    # slivers dropped, so len(objs) <= 4; at least one quadrant's box
    # should survive with boxes covering half each source image
    assert 1 <= len(objs) <= 4


def test_write_voc_xml_roundtrip(tmp_path):
    from tools.generate_pseudo_labels import write_voc_xml

    p = str(tmp_path / "x.xml")
    write_voc_xml(p, "x.jpg", 120, 80,
                  [("car", 11, 12, 60, 50), ("person", 1, 2, 30, 40)])
    tree = ET.parse(p)
    size = tree.find("size")
    assert int(size.find("width").text) == 120
    assert int(size.find("height").text) == 80
    objs = tree.findall("object")
    assert [o.find("name").text for o in objs] == ["car", "person"]
    bb = objs[0].find("bndbox")
    assert [int(bb.find(t).text) for t in
            ("xmin", "ymin", "xmax", "ymax")] == [11, 12, 60, 50]


def test_metric_logger_jsonl(tmp_path):
    """--use_tfb: per-interval averaged scalars land in metrics.jsonl
    (the reference's optional tensorboardX scalars)."""
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "methods")))
    import jax.numpy as jnp
    from common import MetricLogger

    path = str(tmp_path / "metrics.jsonl")
    lg = MetricLogger(2, jsonl_path=path)
    for step in range(1, 5):
        lg.update(step, 1, lambda: 0.01,
                  {"loss": jnp.float32(step), "fg_cnt": jnp.float32(8)})
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    assert [r["step"] for r in recs] == [2, 4]
    assert recs[0]["loss"] == 1.5 and recs[1]["loss"] == 3.5  # interval avg
    assert recs[0]["lr"] == 0.01

    # fused path: one update_many covering steps 5..6 crosses the boundary
    lg.update_many(6, 1, lambda: 0.01,
                   {"loss": jnp.asarray([5.0, 6.0], jnp.float32),
                    "fg_cnt": jnp.asarray([8.0, 8.0], jnp.float32)}, 2)
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    assert recs[-1]["step"] == 6 and recs[-1]["loss"] == 5.5
