"""Backbones: VGG16 and ResNet-50/101/152 feature extractors + box heads.

Functional flax rebuilds of the reference backbone wiring
(``lib/model/faster_rcnn/vgg16.py:20-66``, ``lib/model/faster_rcnn/
resnet.py:105-288``), NHWC end-to-end so convs map directly onto the MXU:

  * VGG16: 13 convs, last maxpool dropped → stride 16, 512 ch; the first two
    conv blocks (torch layers 0-9) are frozen (``vgg16.py:46-47``) — realized
    here as a ``stop_gradient`` at the block boundary (prunes the backward
    exactly like ``requires_grad=False``) plus an optimizer mask.
  * ResNet: conv1..layer3 as features (1024 ch, stride 16), layer4 as head;
    ALL BatchNorms permanently frozen (``resnet.py:261-284`` ``set_bn_fix`` +
    eval-mode ``train()`` override) — here BN is an affine constant fold
    (FrozenBN), the mathematically identical TPU-native form; ``FIXED_BLOCKS``
    freezes the conv prefix the same way.
  * Feature taps: the forward can return (c3, c4, c5) pyramid levels, which
    is how MAF/ATF/PT-MAF split the backbone (``lib/MAF/vgg16.py:43-45``)
    without the reference's nn.Sequential surgery.

Dropout in the VGG head follows torchvision's classifier (two Dropout(0.5)
between the FC layers), active in training like torch-0.4.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision VGG16 conv plan: (out_channels, convs per block)
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    """conv1_1 .. conv5_3, maxpools after blocks 1-4 (pool5 dropped).

    ``frozen_blocks=2`` freezes conv1/conv2 (reference ``vgg16.py:46-47``
    fixes torch feature layers 0-9). Returns the last feature map, or the
    (c3, c4, c5) taps when ``return_taps`` — c3/c4/c5 are the conv3_3 /
    conv4_3 / conv5_3 outputs (strides 4/8/16), the split points MAF uses.
    """

    frozen_blocks: int = 2
    dtype: jnp.dtype = jnp.float32
    width: float = 1.0   # channel multiplier (vgg16_thin dryrun variant)

    @nn.compact
    def __call__(self, x, *, return_taps: bool = False,
                 stage_range: tuple = (0, 5)):
        """``stage_range=(lo, hi)`` runs conv blocks [lo, hi) only — IDF
        interleaves cross-branch attention between blocks
        (``lib/IDF/faster_rcnn.py:61-101``), so branch stages must be
        callable separately; params are created per-stage on first use and
        shared across invocations."""
        lo, hi = stage_range
        taps = []
        for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            ch = max(8, int(ch * self.width))
            if not (lo <= bi < hi):
                continue
            if bi > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if bi + 1 == self.frozen_blocks:
                x = jax.lax.stop_gradient(x)
            if bi >= 2:
                taps.append(x)
        return tuple(taps) if return_taps else x


class VGG16Head(nn.Module):
    """fc6/fc7 ("classifier" minus its final Linear — reference
    ``vgg16.py:40``). Input is (R, P, P, C) pooled features; the flatten uses
    (C, H, W) ordering so converted torch weights apply unchanged."""

    dtype: jnp.dtype = jnp.float32
    dim: int = 4096      # fc width (vgg16_thin dryrun variant shrinks it)

    @nn.compact
    def __call__(self, pooled, *, deterministic: bool = True):
        r = pooled.shape[0]
        x = pooled.transpose(0, 3, 1, 2).reshape(r, -1)   # (R, C*P*P)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return x


class FrozenBN(nn.Module):
    """BatchNorm folded to a frozen affine transform.

    The reference freezes every BN's parameters AND keeps them in eval mode
    (``resnet.py:261-284``), i.e. y = gamma·(x-mean)/sqrt(var+eps) + beta with
    all four fixed. Keeping the four buffers (instead of prefolding) preserves
    checkpoint-parity with torch state dicts; ``stop_gradient`` makes them
    mathematically constant.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        gamma, beta, mean, var = map(jax.lax.stop_gradient,
                                     (gamma, beta, mean, var))
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        return (x.astype(self.dtype) * scale + (beta - mean * scale)).astype(
            x.dtype)


class Bottleneck(nn.Module):
    """ResNet bottleneck block (1x1 → 3x3 → 1x1, expansion 4).

    ``conv3`` is ZERO-initialized: with every BN frozen to an affine
    constant (the reference's permanent-eval BN, see :class:`FrozenBN`)
    nothing controls activation variance at random init, so ~30 stacked
    residual adds make a random-init ResNet-101 emit features with
    std ≈ 2e3 and the unclipped reference optimizer (clip is vgg16-only,
    ``lib/trainval_net.py`` parity) diverges to NaN within steps. Zeroing
    the last conv makes each block the identity at init — the weight-level
    analog of torchvision's ``zero_init_residual`` (whose BN-gamma form is
    unavailable here exactly because BN is frozen). Restoring pretrained
    weights overwrites it, so finetuning parity is untouched; only
    from-scratch trainability changes (diagnosed in round 4:
    OVERFIT.json ``us_daf_res101`` NaN).
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBN(self.planes, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(self.planes, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv3")(y)
        y = FrozenBN(self.planes * 4, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBN(self.planes * 4, dtype=self.dtype,
                                name="downsample_bn")(residual)
        return nn.relu(y + residual)


# layers per stage for each depth (reference resnet.py:186-218).
# 14 is a test-only thin variant (1 bottleneck/stage): the identical
# FrozenBN / fixed_blocks / zero-init-conv3 code path at CI-friendly
# compile cost (tests/test_learning.py::test_res_backbone_learns).
RESNET_STAGES = {14: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                 152: (3, 8, 36, 3)}


class ResNetFeatures(nn.Module):
    """conv1 + layer1..layer3 → (B, H/16, W/16, 1024).

    ``fixed_blocks`` follows cfg.RESNET.FIXED_BLOCKS (reference
    ``resnet.py:253-259``): 1 freezes conv1+layer1 (the default), 2 adds
    layer2, 3 adds layer3. conv1/bn1 are always frozen.
    """

    depth: int = 101
    fixed_blocks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_taps: bool = False):
        stages = RESNET_STAGES[self.depth]
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBN(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = jax.lax.stop_gradient(x)  # conv1/bn1 always frozen

        taps = []
        for stage_i, planes in enumerate((64, 128, 256)):
            stride = 1 if stage_i == 0 else 2
            for blk in range(stages[stage_i]):
                x = Bottleneck(planes, stride=stride if blk == 0 else 1,
                               downsample=(blk == 0), dtype=self.dtype,
                               name=f"layer{stage_i + 1}_{blk}")(x)
            if stage_i + 1 <= self.fixed_blocks:
                x = jax.lax.stop_gradient(x)
            taps.append(x)
        return tuple(taps) if return_taps else x


class ResNetHead(nn.Module):
    """layer4 + global average pool (reference ``resnet.py:286-288``)."""

    depth: int = 101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled, *, deterministic: bool = True):
        del deterministic  # no dropout in the resnet head
        x = pooled
        for blk in range(RESNET_STAGES[self.depth][3]):
            x = Bottleneck(512, stride=2 if blk == 0 else 1,
                           downsample=(blk == 0), dtype=self.dtype,
                           name=f"layer4_{blk}")(x)
        return x.mean(axis=(1, 2))


def backbone_dims(net: str) -> Tuple[int, int]:
    """(feature_channels, head_dim) without constructing modules — for
    callers inside flax ``setup`` that only need the widths."""
    return {"vgg16": (512, 4096), "vgg16_thin": (128, 512),
            "res14": (1024, 2048), "res50": (1024, 2048),
            "res101": (1024, 2048), "res152": (1024, 2048)}[net]


def backbone_for(net: str, dtype=jnp.float32
                 ) -> Tuple[nn.Module, nn.Module, int, int]:
    """Factory: name → (features, head, feature_channels, head_dim).

    Mirrors the reference's per-backbone subclasses (``vgg16.py``,
    ``resnet.py:220-236``): vgg16 → 512-ch features / 4096-d head,
    res50/101/152 → 1024-ch features / 2048-d head.
    """
    if net == "vgg16":
        return (VGG16Features(dtype=dtype), VGG16Head(dtype=dtype), 512, 4096)
    if net == "vgg16_thin":
        # width-reduced variant: identical graph/sharding structure at 1/16th
        # the parameter bytes — used by the multi-chip dryrun so the 8-device
        # emulated-CPU check isn't dominated by replicating 0.5 GB of params
        return (VGG16Features(dtype=dtype, width=0.25),
                VGG16Head(dtype=dtype, dim=512), 128, 512)
    if net in ("res14", "res50", "res101", "res152"):
        depth = int(net[3:])
        return (ResNetFeatures(depth=depth, dtype=dtype),
                ResNetHead(depth=depth, dtype=dtype), 1024, 2048)
    raise ValueError(f"unknown backbone {net!r}")
