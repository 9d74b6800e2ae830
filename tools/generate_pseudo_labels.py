#!/usr/bin/env python
"""IDF pipeline stage ③: pseudo-label generation.

Runs a trained detector over a target split and writes VOC XML annotations
for detections above a confidence threshold — reimplementing the reference's
``faster_rcnn_test.py --savelabel`` path + ``lib/IDF/xml_create.py:8``
(``methods/IDF/IDF_train.sh:9-10``).

Usage:
  python tools/generate_pseudo_labels.py --dataset cityscape --part train_t \\
      --net vgg16 --load_name <ckpt> --out_dir <dir> --threshold 0.7
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET
from xml.dom import minidom

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "methods")))


def write_voc_xml(path: str, image_name: str, width: int, height: int,
                  objects) -> None:
    """objects: iterable of (class_name, x1, y1, x2, y2) in 1-based VOC
    coords (reference ``xml_create.py:8-115`` layout)."""
    ann = ET.Element("annotation")
    ET.SubElement(ann, "folder").text = "VOC2007"
    ET.SubElement(ann, "filename").text = image_name
    size = ET.SubElement(ann, "size")
    ET.SubElement(size, "width").text = str(width)
    ET.SubElement(size, "height").text = str(height)
    ET.SubElement(size, "depth").text = "3"
    ET.SubElement(ann, "segmented").text = "0"
    for cls, x1, y1, x2, y2 in objects:
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = cls
        ET.SubElement(obj, "pose").text = "Unspecified"
        ET.SubElement(obj, "truncated").text = "0"
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(int(round(x1)))
        ET.SubElement(bb, "ymin").text = str(int(round(y1)))
        ET.SubElement(bb, "xmax").text = str(int(round(x2)))
        ET.SubElement(bb, "ymax").text = str(int(round(y2)))
    pretty = minidom.parseString(ET.tostring(ann)).toprettyxml(indent="  ")
    with open(path, "w") as f:
        f.write(pretty)


def main():
    from common import DATASET_MAP, build_test_parser, resolve_config
    import jax
    import numpy as np
    from PIL import Image

    from tllod_tpu.data import combined_roidb
    from tllod_tpu.eval_engine import run_detection
    from tllod_tpu.models.faster_rcnn import FasterRCNN
    from tllod_tpu.utils.checkpoint import (detector_params, load_checkpoint,
                                            restore_into)

    parser = build_test_parser("Generate pseudo-label XML annotations")
    parser.add_argument("--threshold", default=0.7, type=float,
                        help="confidence threshold for pseudo labels")
    parser.add_argument("--out_dir", default=None, type=str,
                        help="output Annotations dir (default: alongside "
                             "the dataset as Annotations_pseudo)")
    args = parser.parse_args()
    cfg = resolve_config(args, training=False)
    np.random.seed(cfg.RNG_SEED)

    ds = DATASET_MAP[args.dataset]
    split_key = {"train_t": "t_imdb", "test_t": "t_test",
                 "test_s": "s_test"}.get(args.part, "t_imdb")
    dataset, roidb, _, _ = combined_roidb(ds[split_key], training=False,
                                          use_flipped=False)

    model = FasterRCNN(num_classes=dataset.num_classes, cfg=cfg,
                       net=args.net, class_agnostic=args.class_agnostic)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "sampling": jax.random.PRNGKey(1)},
            np.zeros((1, 128, 128, 3), np.float32),
            np.array([[128, 128, 1.0]], np.float32),
            np.zeros((1, cfg.MAX_NUM_GT_BOXES, 5), np.float32),
            training=False))["params"]
    restored = load_checkpoint(args.load_name or args.model_dir)
    params = restore_into(template, detector_params(restored["params"]))

    all_boxes = run_detection(model, params, dataset, roidb, cfg,
                              max_per_image=args.max_per_image,
                              class_agnostic=args.class_agnostic)

    out_dir = args.out_dir or os.path.join(dataset.root,
                                           "Annotations_pseudo")
    os.makedirs(out_dir, exist_ok=True)
    n_boxes = 0
    for i, index in enumerate(dataset.image_index):
        with Image.open(dataset.image_path(index)) as im:
            w, h = im.size
        objects = []
        for c in range(1, dataset.num_classes):
            dets = all_boxes[c][i]
            for k in range(len(dets)):
                if dets[k, 4] >= args.threshold:
                    # 0-based detections → 1-based VOC coords
                    objects.append((dataset.classes[c],
                                    dets[k, 0] + 1, dets[k, 1] + 1,
                                    dets[k, 2] + 1, dets[k, 3] + 1))
        n_boxes += len(objects)
        write_voc_xml(os.path.join(out_dir, index + ".xml"),
                      index + dataset.image_ext, w, h, objects)
    print(f"wrote {len(dataset.image_index)} pseudo-label files "
          f"({n_boxes} boxes ≥ {args.threshold}) to {out_dir}")


if __name__ == "__main__":
    main()
