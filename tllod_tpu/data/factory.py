"""Dataset factory: name → VOCDetection.

Replaces the reference's lambda registry (``lib/datasets/factory.py:22-67``),
keeping the same public names (``cityscape_2007_train_s``, ``voc_2007_trainval``
...) so entry-point ``--dataset`` flags resolve identically. Roots default to
``$TLLOD_DATA_DIR`` (reference: ``cfg.DATA_DIR``, ``lib/model/utils/
config.py:272``) and every split maps onto the generic VOC-format reader.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

from tllod_tpu.data.voc import CLASS_SETS, VOCDetection

_REGISTRY: Dict[str, Callable[[], VOCDetection]] = {}


def data_dir() -> str:
    return os.environ.get("TLLOD_DATA_DIR", "data")


def register_dataset(name: str, ctor: Callable[[], VOCDetection]) -> None:
    _REGISTRY[name] = ctor


def _voc_ctor(name, subdir, year, split, class_set):
    def ctor():
        root = os.path.join(data_dir(), subdir, "VOC" + year)
        return VOCDetection(name, root, split, CLASS_SETS[class_set],
                            cache_dir=os.path.join(data_dir(), "cache"))
    return ctor


def _register_defaults() -> None:
    # Cityscapes/Foggy VOC-format splits (reference factory.py:28-31):
    # train_s = source (clear), train_t = target (foggy), test_* likewise.
    for year in ("2007",):
        for split in ("train_s", "train_t", "train_all", "test_s", "test_t",
                      "test_all"):
            name = f"cityscape_{year}_{split}"
            register_dataset(name,
                             _voc_ctor(name, "cityscape", year, split,
                                       "cityscape"))
    # Pascal VOC (reference factory.py:36-40)
    for year in ("2007", "2012"):
        for split in ("train", "val", "trainval", "test"):
            name = f"voc_{year}_{split}"
            register_dataset(name,
                             _voc_ctor(name, "VOCdevkit" + year, year, split,
                                       "voc"))
    # US-DAF UniDAOD splits (reference lib/US_DAF/factory.py usage)
    for year in ("2007", "2012"):
        name = f"voc_us_{year}_trainval"
        register_dataset(name, _voc_ctor(name, "VOCdevkit" + year, year,
                                         "trainval", "voc_us_daf_source"))
    register_dataset(
        "clipart_us_trainval",
        _voc_ctor("clipart_us_trainval", "clipart", "2007", "trainval",
                  "clipart_us_daf_target"))


_register_defaults()


def get_dataset(name: str) -> VOCDetection:
    """Instantiate a registered dataset (reference ``get_imdb``,
    ``factory.py:69-74``)."""
    if name not in _REGISTRY:
        raise KeyError(f"Unknown dataset: {name!r}. "
                       f"Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def list_datasets():
    return sorted(_REGISTRY)
