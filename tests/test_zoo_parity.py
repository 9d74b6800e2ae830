"""Weight-converter parity: a torch VGG16 feature stack with random weights
must produce (numerically) the same outputs as our NHWC flax backbone after
zoo conversion — including the fc6 flatten-order contract. This is the test
that guards the classic silent way to lose 2-5 mAP (SURVEY §7 hard parts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tllod_tpu.models.backbones import VGG16Features, VGG16Head  # noqa: E402
from tllod_tpu.zoo import convert_vgg16  # noqa: E402

# torchvision vgg16 'features' plan: (channels, convs per block)
_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _torch_vgg16_features():
    layers = []
    in_ch = 3
    for ch, n in _PLAN:
        for _ in range(n):
            layers += [tnn.Conv2d(in_ch, ch, 3, padding=1), tnn.ReLU()]
            in_ch = ch
        layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


def _state_dict_like_torchvision(feats, fc6, fc7):
    sd = {}
    conv_idx = [i for i, m in enumerate(feats) if isinstance(m, tnn.Conv2d)]
    for i in conv_idx:
        sd[f"features.{i}.weight"] = feats[i].weight.detach()
        sd[f"features.{i}.bias"] = feats[i].bias.detach()
    sd["classifier.0.weight"] = fc6.weight.detach()
    sd["classifier.0.bias"] = fc6.bias.detach()
    sd["classifier.3.weight"] = fc7.weight.detach()
    sd["classifier.3.bias"] = fc7.bias.detach()
    return {k: v.numpy() for k, v in sd.items()}


def test_vgg16_conversion_forward_parity(rng):
    torch.manual_seed(0)
    feats = _torch_vgg16_features().eval()
    fc6 = tnn.Linear(512 * 7 * 7, 4096)
    fc7 = tnn.Linear(4096, 4096)
    sd = _state_dict_like_torchvision(feats, fc6, fc7)

    backbone_params, head_params = convert_vgg16(sd)

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        # reference drops the final maxpool (vgg16.py:43): run layers [:-1]
        t_out = feats[:-1](torch.from_numpy(
            x.transpose(0, 3, 1, 2)))                       # (1, 512, 4, 6)
    j_out = VGG16Features().apply({"params": backbone_params},
                                  jnp.asarray(x))           # (1, 4, 6, 512)
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out.numpy(), rtol=2e-4, atol=2e-4)

    # head: torch flattens NCHW (C,H,W); our head transposes to match
    pooled = rng.randn(5, 7, 7, 512).astype(np.float32)
    with torch.no_grad():
        t_flat = torch.from_numpy(
            pooled.transpose(0, 3, 1, 2)).reshape(5, -1)
        t_fc7 = tF.relu(fc7(tF.relu(fc6(t_flat))))
    j_fc7 = VGG16Head().apply({"params": head_params}, jnp.asarray(pooled),
                              deterministic=True)
    # two 25088/4096-deep matmuls accumulate ~3e-3 reduction-order noise
    np.testing.assert_allclose(np.asarray(j_fc7), t_fc7.numpy(),
                               rtol=1e-2, atol=5e-3)


class _TBottleneck(tnn.Module):
    """torchvision Bottleneck (expansion 4)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = tF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return tF.relu(y + r)


def _torch_resnet50_prefix():
    """conv1..layer3 with torchvision names (what convert_resnet reads)."""
    mods = tnn.ModuleDict()
    mods["conv1"] = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    mods["bn1"] = tnn.BatchNorm2d(64)
    layers = {}
    inplanes = 64
    for stage, (planes, n, stride) in enumerate(
            ((64, 3, 1), (128, 4, 2), (256, 6, 2)), start=1):
        blocks = []
        for i in range(n):
            s = stride if i == 0 else 1
            ds = None
            if i == 0:
                ds = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes * 4, 1, stride=s,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4))
            blocks.append(_TBottleneck(inplanes, planes, s, ds))
            inplanes = planes * 4
        layers[f"layer{stage}"] = tnn.Sequential(*blocks)
    return mods, layers


def test_resnet50_conversion_forward_parity(rng):
    from tllod_tpu.models.backbones import ResNetFeatures
    from tllod_tpu.zoo import convert_resnet

    torch.manual_seed(1)
    mods, layers = _torch_resnet50_prefix()
    # randomize BN buffers so FrozenBN folding is actually exercised
    sd = {}
    model = tnn.ModuleDict(dict(mods, **layers)).eval()
    for name, m in model.named_modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    for k, v in model.state_dict().items():
        if "num_batches" in k:
            continue
        # torchvision flattens downsample as layerX.i.downsample.0/.1
        sd[k] = v.numpy()

    backbone, _head = convert_resnet(sd, 50)

    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = tF.relu(model["bn1"](model["conv1"](t)))
        t = tF.max_pool2d(t, 3, stride=2, padding=1)
        for stage in ("layer1", "layer2", "layer3"):
            t = model[stage](t)
    j = ResNetFeatures(depth=50).apply({"params": backbone}, jnp.asarray(x))
    # 13 bottlenecks of reduction-order noise: allow ~1e-2 absolute
    np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2),
                               t.numpy(), rtol=2e-2, atol=1e-2)
