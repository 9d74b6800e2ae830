"""Config merge semantics + checkpoint save/restore round trip."""

import dataclasses

import jax
import numpy as np
import pytest

from tllod_tpu.config import Config, cfg_from_file, cfg_from_list
from tllod_tpu.utils.checkpoint import (detector_params, load_checkpoint,
                                        restore_into, save_checkpoint)


def test_yaml_merge(tmp_path):
    yml = tmp_path / "t.yml"
    yml.write_text(
        "TRAIN:\n  BATCH_SIZE: 256\n  LEARNING_RATE: 0.01\n"
        "POOLING_MODE: align\nANCHOR_SCALES: [4, 8, 16, 32]\n")
    cfg = cfg_from_file(Config(), str(yml))
    assert cfg.TRAIN.BATCH_SIZE == 256
    assert cfg.TRAIN.LEARNING_RATE == 0.01
    assert cfg.POOLING_MODE == "align"
    assert cfg.ANCHOR_SCALES == (4, 8, 16, 32)
    # untouched keys keep defaults
    assert cfg.TRAIN.RPN_BATCHSIZE == Config().TRAIN.RPN_BATCHSIZE


def test_yaml_unknown_key_rejected(tmp_path):
    yml = tmp_path / "bad.yml"
    yml.write_text("TRAIN:\n  NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(Config(), str(yml))


def test_cfg_from_list():
    cfg = cfg_from_list(Config(), ["TRAIN.RPN_POST_NMS_TOP_N", "500",
                                   "ANCHOR_RATIOS", "[0.5,1,2]",
                                   "POOLING_MODE", "align"])
    assert cfg.TRAIN.RPN_POST_NMS_TOP_N == 500
    assert cfg.ANCHOR_RATIOS == (0.5, 1, 2)
    assert cfg.POOLING_MODE == "align"
    with pytest.raises(ValueError):
        cfg_from_list(Config(), ["TRAIN.BATCH_SIZE", "'abc'"])


def test_config_hashable_and_immutable():
    cfg = Config()
    hash(cfg)  # jit static-arg requirement
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.POOLING_MODE = "pool"  # type: ignore


def test_checkpoint_roundtrip_and_subset_restore(tmp_path):
    params = {
        "detector": {"backbone": {"conv": {"kernel": np.ones((3, 3, 4, 8),
                                                             np.float32)}},
                     "cls_score": {"bias": np.arange(5, dtype=np.float32)}},
        "img_da": {"conv1": {"kernel": np.full((1, 1, 8, 2), 2.0,
                                               np.float32)}},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params=params, step=42, epoch=3, session=1,
                    meta={"pooling_mode": "align"})
    restored = load_checkpoint(path)
    assert int(restored["step"]) == 42 and int(restored["epoch"]) == 3
    np.testing.assert_array_equal(
        restored["params"]["img_da"]["conv1"]["kernel"],
        params["img_da"]["conv1"]["kernel"])

    # detector-only restore drops DA subtrees (the filtered state_dict trick)
    det_template = jax.tree_util.tree_map(np.zeros_like, params["detector"])
    det = restore_into(det_template, detector_params(restored["params"]))
    np.testing.assert_array_equal(det["cls_score"]["bias"],
                                  params["detector"]["cls_score"]["bias"])

    # shape mismatch raises
    bad = jax.tree_util.tree_map(np.zeros_like, params["detector"])
    bad["cls_score"]["bias"] = np.zeros(7, np.float32)
    with pytest.raises(ValueError):
        restore_into(bad, detector_params(restored["params"]))
