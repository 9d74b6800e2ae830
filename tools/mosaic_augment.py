#!/usr/bin/env python
"""IDF pipeline stage ④: offline Mosaic augmentation.

YOLOv4-style 4-image mosaic over a VOC-format dataset (reimplements the
capability of ``lib/IDF/Mosaic.py:216-470`` + ``Mosaic_cfg.py``): sample 4
images, scale/crop each into one quadrant around a random center point,
remap and clip their (pseudo-)gt boxes, drop slivers, and write new
JPEG + XML pairs plus an image-set file that can be concatenated with the
original split.

Usage:
  python tools/mosaic_augment.py --root <VOC2007 dir> --split train_t \\
      --annotations Annotations_pseudo --num 2000 --out_prefix mosaic
"""

from __future__ import annotations

import argparse
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
from tools.generate_pseudo_labels import write_voc_xml  # noqa: E402


def _load_ann(path):
    tree = ET.parse(path)
    objs = []
    for obj in tree.findall("object"):
        bb = obj.find("bndbox")
        objs.append((obj.find("name").text,
                     float(bb.find("xmin").text), float(bb.find("ymin").text),
                     float(bb.find("xmax").text), float(bb.find("ymax").text)))
    return objs


def make_mosaic(images, annos, out_w, out_h, rng, min_side=8):
    """Compose 4 (image, boxes) pairs into one mosaic canvas."""
    import cv2

    canvas = np.full((out_h, out_w, 3), 114, np.uint8)
    # random center in the middle 50% (reference uses jittered split point)
    cx = int(out_w * (0.25 + 0.5 * rng.rand()))
    cy = int(out_h * (0.25 + 0.5 * rng.rand()))
    quads = [(0, 0, cx, cy), (cx, 0, out_w, cy),
             (0, cy, cx, out_h), (cx, cy, out_w, out_h)]
    out_objs = []
    for (x1q, y1q, x2q, y2q), im, objs in zip(quads, images, annos):
        qw, qh = x2q - x1q, y2q - y1q
        if qw <= 0 or qh <= 0:
            continue
        h, w = im.shape[:2]
        scale = max(qw / w, qh / h)
        rw, rh = int(np.ceil(w * scale)), int(np.ceil(h * scale))
        resized = cv2.resize(im, (rw, rh), interpolation=cv2.INTER_LINEAR)
        ox = rng.randint(0, max(rw - qw, 0) + 1)
        oy = rng.randint(0, max(rh - qh, 0) + 1)
        canvas[y1q:y2q, x1q:x2q] = resized[oy:oy + qh, ox:ox + qw]
        for cls, bx1, by1, bx2, by2 in objs:
            nx1 = bx1 * scale - ox + x1q
            ny1 = by1 * scale - oy + y1q
            nx2 = bx2 * scale - ox + x1q
            ny2 = by2 * scale - oy + y1q
            nx1, nx2 = np.clip([nx1, nx2], x1q, x2q - 1)
            ny1, ny2 = np.clip([ny1, ny2], y1q, y2q - 1)
            if nx2 - nx1 >= min_side and ny2 - ny1 >= min_side:
                out_objs.append((cls, nx1 + 1, ny1 + 1, nx2 + 1, ny2 + 1))
    return canvas, out_objs


def main():
    import cv2

    p = argparse.ArgumentParser(description="Offline mosaic augmentation")
    p.add_argument("--root", required=True,
                   help="VOC-format dataset root (contains JPEGImages/...)")
    p.add_argument("--split", default="train_t")
    p.add_argument("--annotations", default="Annotations",
                   help="annotation subdir (e.g. Annotations_pseudo)")
    p.add_argument("--num", default=1000, type=int,
                   help="number of mosaics to generate")
    p.add_argument("--width", default=2048, type=int)
    p.add_argument("--height", default=1024, type=int)
    p.add_argument("--out_prefix", default="mosaic")
    p.add_argument("--seed", default=3, type=int)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    with open(os.path.join(args.root, "ImageSets", "Main",
                           args.split + ".txt")) as f:
        names = [x.strip() for x in f if x.strip()]
    names = [n for n in names
             if os.path.exists(os.path.join(args.root, args.annotations,
                                            n + ".xml"))]
    assert len(names) >= 4, "need at least 4 annotated images"

    out_names = []
    for i in range(args.num):
        picks = rng.choice(len(names), 4, replace=False)
        images, annos = [], []
        for j in picks:
            im = cv2.imread(os.path.join(args.root, "JPEGImages",
                                         names[j] + ".jpg"))
            objs = _load_ann(os.path.join(args.root, args.annotations,
                                          names[j] + ".xml"))
            # convert 1-based VOC to 0-based for remapping
            images.append(im)
            annos.append([(c, x1 - 1, y1 - 1, x2 - 1, y2 - 1)
                          for c, x1, y1, x2, y2 in objs])
        canvas, objs = make_mosaic(images, annos, args.width, args.height,
                                   rng)
        if not objs:
            continue
        name = f"{args.out_prefix}_{i:05d}"
        cv2.imwrite(os.path.join(args.root, "JPEGImages", name + ".jpg"),
                    canvas)
        write_voc_xml(os.path.join(args.root, args.annotations,
                                   name + ".xml"),
                      name + ".jpg", args.width, args.height, objs)
        out_names.append(name)

    setfile = os.path.join(args.root, "ImageSets", "Main",
                           f"{args.split}_{args.out_prefix}.txt")
    with open(setfile, "w") as f:
        f.write("\n".join(out_names) + "\n")
    print(f"generated {len(out_names)} mosaics; image set: {setfile}")


if __name__ == "__main__":
    main()
