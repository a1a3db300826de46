"""Weight-converter parity: torch ResNet-50 / VGG-16 -> flax, same outputs.

torchvision is not installed in this image, so the torch side is a minimal
reimplementation of the standard architectures with torchvision's state-dict
naming (conv1, bn1, layerX.Y.convZ, downsample.0/1, features.N) — random
weights, converted, compared end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from forge_tpu.nn.resnet import ResNet50Features
from forge_tpu.models.perceptual import VGG16Blocks
from forge_tpu.utils.convert_torch import (
    convert_resnet50_features,
    convert_vgg16_blocks,
)


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(out + r)


class TorchResNet50Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def test_resnet50_conversion_parity():
    torch.manual_seed(0)
    tm = TorchResNet50Trunk().eval()
    # randomize BN stats so eval mode is a real test
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet50_features(sd)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    ref = ref.transpose(0, 2, 3, 1)

    m = ResNet50Features(stride_surgery=False)
    out = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-4)


def _torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M"]
    layers = []
    in_c = 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_c, v, 3, padding=1), tnn.ReLU(inplace=True)]
            in_c = v
    return tnn.Sequential(*layers)


def test_vgg16_conversion_parity():
    torch.manual_seed(1)
    feats = _torch_vgg16_features().eval()
    sd = {f"features.{k}": v.detach().numpy() for k, v in feats.state_dict().items()}
    params = convert_vgg16_blocks(sd)

    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # reference block outputs: features[:4], [4:9], [9:16], [16:23]
    refs = []
    h = xt
    for a, b in [(0, 4), (4, 9), (9, 16), (16, 23)]:
        for i in range(a, b):
            h = feats[i](h)
        refs.append(h.detach().numpy().transpose(0, 2, 3, 1))

    m = VGG16Blocks()
    outs = m.apply({"params": params}, jnp.asarray(x))
    assert len(outs) == 4
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-4, rtol=1e-4)
