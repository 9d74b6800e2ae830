"""Create a synthetic VOC-format cityscape-style dataset (for e2e smoke runs
without real data): usage: python tools/make_synth_voc.py <TLLOD_DATA_DIR>"""
import os, sys
import numpy as np
import cv2

CLASSES = ("person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle")

def make_split(root, split, n, seed):
    rng = np.random.RandomState(seed)
    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    names = []
    for i in range(n):
        name = f"{split}_{i:03d}"
        names.append(name)
        h, w = 128, 256
        im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        objs = ""
        for b in range(2):
            x1 = int(rng.rand() * (w - 60)); y1 = int(rng.rand() * (h - 60))
            x2 = x1 + 30 + int(rng.rand() * 20); y2 = y1 + 30 + int(rng.rand() * 20)
            cls = CLASSES[rng.randint(len(CLASSES))]
            cv2.rectangle(im, (x1, y1), (x2, y2), (int(rng.rand()*255),)*3, -1)
            objs += (f"<object><name>{cls}</name><difficult>0</difficult><bndbox>"
                     f"<xmin>{x1+1}</xmin><ymin>{y1+1}</ymin><xmax>{x2+1}</xmax>"
                     f"<ymax>{y2+1}</ymax></bndbox></object>")
        cv2.imwrite(os.path.join(root, "JPEGImages", name + ".jpg"), im)
        with open(os.path.join(root, "Annotations", name + ".xml"), "w") as f:
            f.write(f"<annotation><size><width>{w}</width><height>{h}</height>"
                    f"<depth>3</depth></size>{objs}</annotation>")
    with open(os.path.join(root, "ImageSets", "Main", split + ".txt"), "w") as f:
        f.write("\n".join(names) + "\n")

root = os.path.join(sys.argv[1], "cityscape", "VOC2007")
for split, n, seed in (("train_s", 4, 0), ("train_t", 4, 1), ("test_t", 4, 2)):
    make_split(root, split, n, seed)
print("synthetic dataset at", root)
