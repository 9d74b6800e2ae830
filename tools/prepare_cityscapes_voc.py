"""Convert standard Cityscapes + Foggy Cityscapes downloads into the
VOC-format layout this repo's loaders (and the reference's prepared
dataset, ``lib/datasets/cityscape.py:75-78``) expect.

Inputs (the two official cityscapes.com packages, unpacked anywhere):

  --cityscapes_root  dir containing ``leftImg8bit/{train,val}/<city>/*.png``
                     and ``gtFine/{train,val}/<city>/*_gtFine_polygons.json``
  --foggy_root       dir containing ``leftImg8bit_foggy/{train,val}/<city>/
                     *_leftImg8bit_foggy_beta_<β>.png`` (defaults to
                     --cityscapes_root; the foggy package unpacks alongside)

Output under ``$TLLOD_DATA_DIR`` (or --out):

  cityscape/VOC2007/JPEGImages/*.jpg      clear + foggy frames
  cityscape/VOC2007/Annotations/*.xml     boxes from gtFine instance polygons
  cityscape/VOC2007/ImageSets/Main/{train_s,train_t,test_s,test_t}.txt

Conventions (matching the DA-Faster/DAF setup the reference trains on —
SURVEY §6, ``methods/DAF/DAF_train.sh``):

  train_s = clear train (2975), train_t = foggy train at β=0.02,
  test_s  = clear val (500),    test_t  = foggy val at β=0.02.

Boxes are the tightest axis-aligned rectangles around the gtFine polygons
of the 8 DA-detection classes (person, rider, car, truck, bus, train,
motorcycle, bicycle); ``group`` variants (e.g. "cargroup") map to their
class, matching the common Cityscapes→VOC converters. Coordinates are
written 1-based (VOC XML convention; the reader subtracts 1 —
``data/voc.py:119-122``).

Usage:
  python tools/prepare_cityscapes_voc.py \
      --cityscapes_root /data/cityscapes [--foggy_root /data/cityscapes] \
      [--out $TLLOD_DATA_DIR] [--beta 0.02] [--symlink]

After this, the full reproduction is:
  bash methods/DAF/DAF_train.sh && bash methods/DAF/DAF_test.sh
(expected: mAP 32.3 ± 0.5 on test_t with the caffe VGG16 init —
BASELINE.md).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

CLASSES = ("person", "rider", "car", "truck", "bus", "train",
           "motorcycle", "bicycle")


def polygons_to_boxes(json_path: str):
    """gtFine polygon file → [(cls, x1, y1, x2, y2), ...] (0-based, px)."""
    with open(json_path) as f:
        ann = json.load(f)
    w, h = int(ann["imgWidth"]), int(ann["imgHeight"])
    boxes = []
    for obj in ann.get("objects", []):
        label = obj["label"]
        if label.endswith("group"):      # "cargroup" → "car" etc.
            label = label[:-len("group")]
        if label not in CLASSES:
            continue
        xs = [p[0] for p in obj["polygon"]]
        ys = [p[1] for p in obj["polygon"]]
        x1 = max(0, min(xs))
        y1 = max(0, min(ys))
        x2 = min(w - 1, max(xs))
        y2 = min(h - 1, max(ys))
        if x2 <= x1 or y2 <= y1:
            continue
        boxes.append((label, x1, y1, x2, y2))
    return w, h, boxes


def write_xml(path: str, name: str, w: int, h: int, boxes) -> None:
    objs = "".join(
        f"  <object><name>{c}</name><difficult>0</difficult><bndbox>"
        f"<xmin>{int(x1) + 1}</xmin><ymin>{int(y1) + 1}</ymin>"
        f"<xmax>{int(x2) + 1}</xmax><ymax>{int(y2) + 1}</ymax>"
        f"</bndbox></object>\n"
        for c, x1, y1, x2, y2 in boxes)
    with open(path, "w") as f:
        f.write(f"<annotation>\n  <filename>{name}.jpg</filename>\n"
                f"  <size><width>{w}</width><height>{h}</height>"
                f"<depth>3</depth></size>\n{objs}</annotation>\n")


def put_image(src_png: str, dst_jpg: str, symlink: bool) -> None:
    if os.path.exists(dst_jpg):
        return
    if symlink:
        # keeps .jpg name the reader expects; cv2.imread decodes by content,
        # not extension, so a png behind a .jpg symlink loads fine
        os.symlink(os.path.abspath(src_png), dst_jpg)
        return
    import cv2
    im = cv2.imread(src_png)
    if im is None:
        raise RuntimeError(f"unreadable image {src_png}")
    cv2.imwrite(dst_jpg, im, [cv2.IMWRITE_JPEG_QUALITY, 95])


def convert_split(frames, ann_root, out_root, split_name, suffix,
                  symlink) -> int:
    """frames: list of (png_path, city, base) where base is the
    ``<city>_<seq>_<frame>`` stem; suffix distinguishes foggy twins."""
    names = []
    for png, city, base in frames:
        name = base + suffix
        jpath = os.path.join(ann_root, city,
                             base + "_gtFine_polygons.json")
        if not os.path.exists(jpath):
            print(f"  WARN no gtFine for {base}, skipped", file=sys.stderr)
            continue
        w, h, boxes = polygons_to_boxes(jpath)
        write_xml(os.path.join(out_root, "Annotations", name + ".xml"),
                  name, w, h, boxes)
        put_image(png, os.path.join(out_root, "JPEGImages", name + ".jpg"),
                  symlink)
        names.append(name)
    with open(os.path.join(out_root, "ImageSets", "Main",
                           split_name + ".txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"{split_name}: {len(names)} images")
    return len(names)


def find_frames(img_root: str, subset: str, pattern: str):
    out = []
    for png in sorted(glob.glob(os.path.join(img_root, subset, "*",
                                             pattern))):
        city = os.path.basename(os.path.dirname(png))
        base = "_".join(os.path.basename(png).split("_")[:3])
        out.append((png, city, base))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Cityscapes/Foggy → VOC-format 'cityscape' dataset")
    ap.add_argument("--cityscapes_root", required=True)
    ap.add_argument("--foggy_root", default=None,
                    help="defaults to --cityscapes_root")
    ap.add_argument("--out", default=os.environ.get("TLLOD_DATA_DIR", "data"))
    ap.add_argument("--beta", default="0.02",
                    help="foggy attenuation coefficient (0.005|0.01|0.02)")
    ap.add_argument("--symlink", action="store_true",
                    help="symlink images instead of re-encoding to jpg")
    args = ap.parse_args()

    foggy_root = args.foggy_root or args.cityscapes_root
    out_root = os.path.join(args.out, "cityscape", "VOC2007")
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(out_root, sub), exist_ok=True)

    ann = os.path.join(args.cityscapes_root, "gtFine")
    clear = os.path.join(args.cityscapes_root, "leftImg8bit")
    foggy = os.path.join(foggy_root, "leftImg8bit_foggy")
    fog_pat = f"*_leftImg8bit_foggy_beta_{args.beta}.png"

    n = 0
    n += convert_split(find_frames(clear, "train", "*_leftImg8bit.png"),
                       os.path.join(ann, "train"), out_root, "train_s",
                       "_source", args.symlink)
    n += convert_split(find_frames(foggy, "train", fog_pat),
                       os.path.join(ann, "train"), out_root, "train_t",
                       "_target", args.symlink)
    n += convert_split(find_frames(clear, "val", "*_leftImg8bit.png"),
                       os.path.join(ann, "val"), out_root, "test_s",
                       "_source", args.symlink)
    n += convert_split(find_frames(foggy, "val", fog_pat),
                       os.path.join(ann, "val"), out_root, "test_t",
                       "_target", args.symlink)
    if n == 0:
        sys.exit("no images converted — check --cityscapes_root/--foggy_root "
                 "layout (need leftImg8bit/, gtFine/, leftImg8bit_foggy/)")
    print(f"done: {n} images under {out_root}\n"
          f"train/eval with TLLOD_DATA_DIR={args.out}")


if __name__ == "__main__":
    main()
