"""ImageNet / Visual Genome readers + expanded factory registrations
(VERDICT r1 items 2/5/6) on synthetic on-disk layouts."""

import os

import numpy as np
import pytest

from tllod_tpu.data.factory import get_dataset, list_datasets
from tllod_tpu.data.imagenet import ImageNetDetection
from tllod_tpu.data.vg import VGDetection, vg_eval


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def _xml(objs, w=100, h=80, name_tag="name"):
    body = "".join(
        f"<object><{name_tag}>{n}</{name_tag}>"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
        f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox>"
        + "".join(f"<attribute>{a}</attribute>" for a in attrs)
        + "</object>"
        for n, b, attrs in objs)
    return (f"<annotation><size><width>{w}</width><height>{h}</height>"
            f"</size>{body}</annotation>")


# ---------------------------------------------------------------- imagenet

@pytest.fixture
def imagenet_root(tmp_path):
    root = tmp_path / "ILSVRC"
    _write(str(root / "devkit" / "data" / "map_vid.txt"),
           "n0001 1 airplane\nn0002 2 antelope\nn0003 3 bear\n")
    _write(str(root / "ImageSets" / "val.txt"), "im1 1\nim2 2\n")
    _write(str(root / "Annotations" / "val" / "im1.xml"),
           _xml([("n0001", (10, 10, 50, 40), ()),
                 ("n0003", (5, 5, 20, 20), ()),
                 ("n9999", (1, 1, 9, 9), ())]))   # unknown wnid → skipped
    _write(str(root / "Annotations" / "val" / "im2.xml"), _xml([]))
    return str(root)


def test_imagenet_reader(imagenet_root):
    ds = ImageNetDetection("imagenet_val_test", imagenet_root, "val")
    assert ds.classes[:4] == ("__background__", "airplane", "antelope",
                              "bear")
    assert ds.image_index == ["im1", "im2"]
    roidb = ds.gt_roidb()
    assert len(roidb) == 2
    assert roidb[0]["gt_classes"].tolist() == [1, 3]   # unknown wnid dropped
    np.testing.assert_allclose(roidb[0]["boxes"][0], [10, 10, 50, 40])
    assert roidb[0]["width"] == 100 and roidb[0]["height"] == 80
    assert roidb[0]["image"].endswith(
        os.path.join("Data", "val", "im1.JPEG"))
    assert len(roidb[1]["boxes"]) == 0


# ---------------------------------------------------------------- vg

@pytest.fixture
def vg_root(tmp_path):
    root = tmp_path
    meta = root / "genome"
    _write(str(meta / "150-50-50" / "objects_vocab.txt"),
           "man,person\ncar,automobile\ntree\n")
    _write(str(meta / "150-50-50" / "attributes_vocab.txt"),
           "red\ntall,high\n")
    _write(str(meta / "train.txt"),
           "VG_100K/71.jpg xml/71.xml\nVG_100K_2/72.jpg xml/72.xml\n"
           "VG_100K/73.jpg xml/73.xml\n")
    _write(str(meta / "xml" / "71.xml"),
           _xml([("man", (4, 4, 40, 40), ("red",)),
                 ("automobile", (50, 10, 90, 60), ("tall", "blue")),
                 ("zebra", (0, 0, 10, 10), ())]))
    _write(str(meta / "xml" / "72.xml"),
           _xml([("zebra", (0, 0, 10, 10), ())]))   # no in-vocab objects
    # degenerate box → whole-image fallback (reference vg.py:236-242 quirk)
    _write(str(meta / "xml" / "73.xml"),
           _xml([("tree", (60, 50, 20, 10), ())], w=100, h=80))
    return str(root)


def test_vg_reader(vg_root):
    ds = VGDetection("vg_test", vg_root, "150-50-50", "train")
    assert ds.classes == ("__background__", "man", "car", "tree")
    # alias maps to canonical index; image 72 excluded (no vocab objects)
    assert ds.image_index == [71, 73]
    assert ds._id_to_dir[71] == "VG_100K"
    roidb = ds.gt_roidb()
    assert roidb[0]["gt_classes"].tolist() == [1, 2]
    # attributes: canonical + alias resolve, unknown dropped
    assert roidb[0]["gt_attributes"][0, 0] == 1
    assert roidb[0]["gt_attributes"][1, 0] == 2
    # degenerate box replaced by whole-image coords (y2 = width-1 quirk)
    np.testing.assert_allclose(roidb[1]["boxes"][0], [0, 0, 99, 99])


def test_vg_split_limits(vg_root):
    ds = VGDetection("vg_mini", vg_root, "150-50-50", "minitrain")
    assert ds.image_index == [71, 73]   # minitrain = first 1000 of train


def test_vg_eval_roundtrip(vg_root, tmp_path):
    ds = VGDetection("vg_e", vg_root, "150-50-50", "train")
    roidb = ds.gt_roidb()
    det = tmp_path / "dets.txt"
    det.write_text("71 0.9 4 4 40 40\n73 0.8 0 0 99 99\n")
    rec, prec, ap, _, npos = vg_eval(str(det), roidb, ds.image_index, 1)
    assert npos == 1            # one "man" gt
    assert np.isclose(ap, 1.0)  # exact hit; the 73 det is a class-1 FP after


# ---------------------------------------------------------------- factory

def test_factory_registrations_exist():
    names = list_datasets()
    for required in ("watercolor_2007_train", "watercolor_2007_test",
                     "VOC_2007_train_trainval", "VOC_2012_train_trainval",
                     "VOC_2007_train_test", "clipart_2007_train",
                     "clipart_2007_test", "clipart_train", "clipart_test",
                     "cs_2007_train_fg", "coco_2014_train",
                     "coco_2014_minival", "imagenet_train", "imagenet_val",
                     "vg_150-50-50_minitrain", "vg_1600-400-20_train"):
        assert required in names, required


def test_factory_watercolor_classes(tmp_path, monkeypatch):
    monkeypatch.setenv("TLLOD_DATA_DIR", str(tmp_path))
    _write(str(tmp_path / "watercolor" / "VOC2007" / "ImageSets" / "Main"
               / "train.txt"), "w1\n")
    ds = get_dataset("watercolor_2007_train")
    assert ds.classes == ("__background__", "bicycle", "bird", "car", "cat",
                          "dog", "person")


def test_factory_clipart_class_splits(tmp_path, monkeypatch):
    """US-DAF clipart: train uses the target 15-class list, test the source
    15-class list (reference lib/US_DAF/pascal_voc_clipart*.py)."""
    monkeypatch.setenv("TLLOD_DATA_DIR", str(tmp_path))
    for split in ("train", "test"):
        _write(str(tmp_path / "clipart" / "VOC2007" / "ImageSets" / "Main"
                   / f"{split}.txt"), "c1\n")
    train = get_dataset("clipart_2007_train")
    test = get_dataset("clipart_2007_test")
    assert "pottedplant" in train.classes and "aeroplane" not in train.classes
    assert "aeroplane" in test.classes and "pottedplant" not in test.classes


# ---------------------------------------------------------------- DG union

def test_union_classes_intersection_sorted():
    from tllod_tpu.data.union import union_classes
    cls = union_classes("cityscape", "voc", "bdd100k")
    assert cls[0] == "__background__"
    assert cls == tuple(sorted(cls))
    assert set(cls) == {"__background__", "person", "car", "bus", "train",
                        "motor", "bike"}
    # kitti ∩ sim10k: only car survives
    assert set(union_classes("kitti", "sim10k")) == {"__background__", "car"}


def test_parse_union_name():
    from tllod_tpu.data.union import parse_union_name
    spec = parse_union_name("cityscape_voc_bdd100k_s1_2007_train_s")
    assert spec is not None
    assert spec["main"] == "cityscape" and spec["split"] == "train_s"
    assert spec["subdir"] == "cityscape_s1"
    assert parse_union_name("cityscape_2007_train_s") is None
    assert parse_union_name("nosuch_voc_bdd100k_s1_2007_train") is None


def test_union_dataset_synonym_remap(tmp_path, monkeypatch):
    """Raw annotation names (bicycle/motorcycle/tram/cyclist) land in the
    canonical union space; out-of-space objects are dropped
    (reference lib/MAD/dgunionlable.py:337-366)."""
    monkeypatch.setenv("TLLOD_DATA_DIR", str(tmp_path))
    from tllod_tpu.data.factory import get_dataset

    root = tmp_path / "cityscape_s1" / "VOC2007"
    _write(str(root / "ImageSets" / "Main" / "train.txt"), "u1\n")
    _write(str(root / "Annotations" / "u1.xml"),
           _xml([("bicycle", (2, 2, 30, 30), ()),
                 ("motorcycle", (5, 5, 25, 25), ()),
                 ("tram", (40, 10, 90, 60), ()),
                 ("traffic sign", (1, 1, 9, 9), ())]))  # not in intersection
    ds = get_dataset("cityscape_voc_bdd100k_s1_2007_train")
    roidb = ds.gt_roidb()
    names = [ds.classes[c] for c in roidb[0]["gt_classes"]]
    assert names == ["bike", "motor", "train"]


def test_evaluate_detections_roidb_in_memory():
    from tllod_tpu.data.evaluate import evaluate_detections_roidb

    class DS:
        num_classes = 3
        classes = ("__background__", "a", "b")

    roidb = [
        {"img_id": "i0", "boxes": np.array([[10, 10, 50, 50]], np.float32),
         "gt_classes": np.array([1]), "gt_ishard": np.array([0])},
        {"img_id": "i1", "boxes": np.array([[5, 5, 25, 25],
                                            [40, 40, 80, 80]], np.float32),
         "gt_classes": np.array([2, 1]), "gt_ishard": np.array([0, 0])},
    ]
    all_boxes = [[], [None, None], [None, None]]
    # class 1: both gts hit exactly
    all_boxes[1][0] = np.array([[10, 10, 50, 50, 0.9]], np.float32)
    all_boxes[1][1] = np.array([[40, 40, 80, 80, 0.8]], np.float32)
    # class 2: one miss (far away)
    all_boxes[2][0] = np.zeros((0, 5), np.float32)
    all_boxes[2][1] = np.array([[100, 100, 120, 120, 0.7]], np.float32)
    aps = evaluate_detections_roidb(DS(), roidb, all_boxes,
                                    use_07_metric=False)
    assert np.isclose(aps["a"], 1.0)
    assert np.isclose(aps["b"], 0.0)
    assert np.isclose(aps["mAP"], 0.5)


# ------------------------------------------------------- rbg-variant imdb

def test_voc_rbg_variant(tmp_path, monkeypatch):
    """``voc_rbg_*`` names (lib/datasets/pascal_voc_rbg.py): difficult
    objects excluded from the roidb, salted+cleaned results files,
    07-metric only for year < 2010 — all via options on the generic reader."""
    monkeypatch.setenv("TLLOD_DATA_DIR", str(tmp_path))
    root = tmp_path / "VOCdevkit2007" / "VOC2007"
    _write(str(root / "ImageSets" / "Main" / "test.txt"), "r1\n")
    xml = ("<annotation><size><width>100</width><height>80</height></size>"
           "<object><name>car</name><difficult>0</difficult>"
           "<bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax>"
           "<ymax>40</ymax></bndbox></object>"
           "<object><name>car</name><difficult>1</difficult>"
           "<bndbox><xmin>60</xmin><ymin>10</ymin><xmax>90</xmax>"
           "<ymax>40</ymax></bndbox></object></annotation>")
    _write(str(root / "Annotations" / "r1.xml"), xml)

    assert "voc_rbg_2007_test" in list_datasets()
    plain = get_dataset("voc_2007_test")
    rbg = get_dataset("voc_rbg_2007_test")
    assert len(plain.gt_roidb()[0]["boxes"]) == 2      # difficult kept
    assert len(rbg.gt_roidb()[0]["boxes"]) == 1        # difficult dropped
    assert rbg.eval_kwargs["use_07_metric"] is True    # 2007 < 2010
    root12 = tmp_path / "VOCdevkit2012" / "VOC2012"
    _write(str(root12 / "ImageSets" / "Main" / "test.txt"), "r1\n")
    assert get_dataset(
        "voc_rbg_2012_test").eval_kwargs["use_07_metric"] is False


def test_voc_rbg_salted_cleanup(tmp_path, monkeypatch):
    """Salted comp-id results files are removed after scoring."""
    import glob

    from tllod_tpu.data.evaluate import evaluate_detections

    monkeypatch.setenv("TLLOD_DATA_DIR", str(tmp_path))
    root = tmp_path / "VOCdevkit2007" / "VOC2007"
    _write(str(root / "ImageSets" / "Main" / "test.txt"), "r1\n")
    _write(str(root / "Annotations" / "r1.xml"), _xml(
        [("car", (10, 10, 50, 40), ())]))
    rbg = get_dataset("voc_rbg_2007_test")
    all_boxes = [[] for _ in rbg.classes]
    for c in range(1, rbg.num_classes):
        all_boxes[c] = [np.zeros((0, 5), np.float32)]
    all_boxes[rbg.classes.index("car")] = [
        np.array([[9.0, 9.0, 49.0, 39.0, 0.9]], np.float32)]
    out = str(tmp_path / "out")
    aps = evaluate_detections(rbg, all_boxes, out, **rbg.eval_kwargs)
    assert aps["car"] > 0.9
    assert not glob.glob(os.path.join(out, "comp4_*det*"))   # cleaned up
