"""Pretrained backbone weight conversion (torch caffe .pth → flax pytree).

The reference trains from caffe-pretrained VGG16/ResNet101 state dicts
(``lib/model/faster_rcnn/vgg16.py:26,34-38``, ``resnet.py:222,231-236``);
matching the published mAPs requires the same initialization. This converter
maps torchvision-layout state dicts onto our NHWC flax trees:

  conv:  (O, I, kh, kw) → (kh, kw, I, O)
  dense: (O, I)         → (I, O)
  bn:    weight/bias/running_mean/running_var → scale/bias/mean/var (FrozenBN)

The fc6 flatten order matches because our box head flattens pooled features
in (C, H, W) order (see ``VGG16Head``).

Weights are looked up under ``$TLLOD_PRETRAINED_DIR`` (default
``pretrained_model/``, the reference's directory name). If the file is
missing, the random init is kept and a warning printed — everything still
runs, mAP parity just needs the weights present.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

# torchvision VGG16 feature indices → our conv names (backbones._VGG_BLOCKS)
_VGG_FEATURE_MAP = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}

_RESNET_STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def pretrained_dir() -> str:
    return os.environ.get("TLLOD_PRETRAINED_DIR", "pretrained_model")


def _load_torch_state_dict(path: str):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_vgg16(sd) -> Tuple[dict, dict]:
    """→ (backbone params, head params) for VGG16Features/VGG16Head."""
    backbone = {}
    for idx, name in _VGG_FEATURE_MAP.items():
        backbone[name] = {
            "kernel": _conv(sd[f"features.{idx}.weight"]),
            "bias": sd[f"features.{idx}.bias"],
        }
    head = {
        "fc6": {"kernel": _dense(sd["classifier.0.weight"]),
                "bias": sd["classifier.0.bias"]},
        "fc7": {"kernel": _dense(sd["classifier.3.weight"]),
                "bias": sd["classifier.3.bias"]},
    }
    return backbone, head


def _bn(sd, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"]}


def convert_resnet(sd, depth: int) -> Tuple[dict, dict]:
    """→ (backbone params [conv1..layer3], head params [layer4])."""
    backbone = {"conv1": {"kernel": _conv(sd["conv1.weight"])},
                "bn1": _bn(sd, "bn1")}
    stages = _RESNET_STAGES[depth]

    def block(stage: int, i: int) -> dict:
        p = f"layer{stage}.{i}"
        out = {}
        for c in (1, 2, 3):
            out[f"conv{c}"] = {"kernel": _conv(sd[f"{p}.conv{c}.weight"])}
            out[f"bn{c}"] = _bn(sd, f"{p}.bn{c}")
        if f"{p}.downsample.0.weight" in sd:
            out["downsample_conv"] = {
                "kernel": _conv(sd[f"{p}.downsample.0.weight"])}
            out["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
        return out

    for stage in (1, 2, 3):
        for i in range(stages[stage - 1]):
            backbone[f"layer{stage}_{i}"] = block(stage, i)
    if "layer4.0.conv1.weight" in sd:
        head = {f"layer4_{i}": block(4, i) for i in range(stages[3])}
    else:
        head = None  # feature-extractor-only state dict
    return backbone, head


def _set_subtree(params: dict, path: Sequence[str], value: dict) -> dict:
    """Return a copy of ``params`` with the subtree at ``path`` replaced
    (shape-checked leaf by leaf)."""
    import jax

    def check(old, new):
        old_l = jax.tree_util.tree_leaves(old)
        new_l = jax.tree_util.tree_leaves(new)
        assert len(old_l) == len(new_l), \
            f"leaf count mismatch at {'/'.join(path)}"

    node = params
    for p in path[:-1]:
        node = node[p]
    check(node[path[-1]], value)

    def rebuild(d, keys, val):
        if not keys:
            return val
        out = dict(d)
        out[keys[0]] = rebuild(d[keys[0]], keys[1:], val)
        return out

    return rebuild(params, list(path), value)


def _cast_like(template: dict, new: dict):
    import jax
    return jax.tree_util.tree_map(
        lambda t, n: np.asarray(n, dtype=np.asarray(t).dtype).reshape(
            np.asarray(t).shape), template, new)


def load_pretrained_backbone(params: dict, net: str, *,
                             subtree: Sequence[str] = ("backbone",),
                             head_subtree: Optional[Sequence[str]] = None,
                             path: Optional[str] = None) -> dict:
    """Fill the backbone (and box-head) subtrees of ``params`` from a caffe
    .pth file. ``subtree`` is the path of the backbone module inside
    ``params`` (e.g. ("detector", "backbone")); the head sits beside it.
    """
    fname = {"vgg16": "vgg16_caffe.pth", "res50": "resnet50_caffe.pth",
             "res101": "resnet101_caffe.pth",
             "res152": "resnet152_caffe.pth"}[net]
    path = path or os.path.join(pretrained_dir(), fname)
    if not os.path.exists(path):
        print(f"WARNING: pretrained weights not found at {path}; "
              f"keeping random init")
        return params
    print(f"Loading pretrained weights from {path}")
    sd = _load_torch_state_dict(path)
    if net == "vgg16":
        backbone, head = convert_vgg16(sd)
    else:
        backbone, head = convert_resnet(sd, int(net[3:]))

    head_subtree = head_subtree or tuple(subtree[:-1]) + ("head",)
    node = params
    for p in subtree:
        node = node[p]
    backbone = _cast_like(node, backbone)
    params = _set_subtree(params, subtree, backbone)
    if head is None:
        return params
    node = params
    for p in head_subtree:
        node = node[p]
    head = _cast_like(node, head)
    return _set_subtree(params, head_subtree, head)
