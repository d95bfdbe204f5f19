"""Minimal timm 0.5.4 API shim: `timm.create_model(name)`.

Only the surface the reference touches is provided
(reference transfuser.py:380-488, late_fusion.py, latentTF.py,
geometric_fusion.py):

- regnety_032 / resnet34 / resnet18 with timm 0.5.4 module naming
  (``stem.conv``/``stem.bn``/``s{K}.b{J}.conv{1,2,3}.{conv,bn}``/
  ``se.fc{1,2}``/``downsample`` for regnet; ``conv1/bn1/layer{1..4}`` for
  resnet), because the reference's "surgery" aliases those exact
  attributes and reference checkpoints carry those exact state-dict keys.
- ``feature_info``: list of {'num_chs': C} dicts indexed 0..4
  (stem + 4 stages) as the reference reads it.
- BatchNormAct semantics: timm regnet BN modules apply their activation
  inside ``bn`` (the reference comments "The Relu is part of the batch
  norm here" and sets act1 to an empty Sequential).

``pretrained=True`` initializes randomly (no network in this
environment); parity tests load converted state dicts anyway, so
pretrained weights are irrelevant to the oracle.

This file replicates PUBLIC timm architecture definitions (timm 0.5.4
regnet.py / resnet.py) from their published structure; it contains no
code from /root/reference.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BatchNormAct2d(nn.BatchNorm2d):
    """BN with fused activation, state-dict-identical to plain BN."""

    def __init__(self, num_features, act=True):
        super().__init__(num_features)
        self._act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self._act else x


class ConvBnAct(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size, stride,
                              (kernel_size - 1) // 2, groups=groups,
                              bias=False)
        self.bn = BatchNormAct2d(out_ch, act=act)

    def forward(self, x):
        return self.bn(self.conv(x))


class SEModule(nn.Module):
    """timm SEModule: fc1 -> relu -> fc2 -> sigmoid gate."""

    def __init__(self, channels, rd_channels):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class RegNetBottleneck(nn.Module):
    """timm regnet Bottleneck, bottleneck_ratio=1, se_ratio=0.25."""

    def __init__(self, in_ch, out_ch, stride, group_width):
        super().__init__()
        groups = out_ch // group_width
        self.conv1 = ConvBnAct(in_ch, out_ch, 1)
        self.conv2 = ConvBnAct(out_ch, out_ch, 3, stride=stride,
                               groups=groups)
        self.se = SEModule(out_ch, int(round(in_ch * 0.25)))
        self.conv3 = ConvBnAct(out_ch, out_ch, 1, act=False)
        if stride != 1 or in_ch != out_ch:
            self.downsample = ConvBnAct(in_ch, out_ch, 1, stride=stride,
                                        act=False)
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x
        x = self.conv3(self.se(self.conv2(self.conv1(x))))
        if self.downsample is not None:
            shortcut = self.downsample(shortcut)
        return F.relu(x + shortcut)


class _Stage(nn.Module):
    def __init__(self, depth, in_ch, out_ch, group_width):
        super().__init__()
        self._depth = depth
        for bi in range(depth):
            setattr(self, f"b{bi + 1}",
                    RegNetBottleneck(in_ch if bi == 0 else out_ch, out_ch,
                                     2 if bi == 0 else 1, group_width))

    def forward(self, x):
        for bi in range(self._depth):
            x = getattr(self, f"b{bi + 1}")(x)
        return x


class _Head(nn.Module):
    def __init__(self, in_ch, num_classes=1000):
        super().__init__()
        self.global_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(in_ch, num_classes)

    def forward(self, x):
        return self.fc(torch.flatten(self.global_pool(x), 1))


class RegNetY(nn.Module):
    """timm 0.5.4 RegNetY trunk+head with timm naming."""

    def __init__(self, depths, widths, group_width, stem_width=32):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv = nn.Conv2d(3, stem_width, 3, 2, 1, bias=False)
        self.stem.bn = BatchNormAct2d(stem_width, act=True)
        in_ch = stem_width
        for si, (d, w) in enumerate(zip(depths, widths)):
            setattr(self, f"s{si + 1}", _Stage(d, in_ch, w, group_width))
            in_ch = w
        self.head = _Head(in_ch)
        self.feature_info = [dict(num_chs=stem_width)] + [
            dict(num_chs=w) for w in widths]

    def forward_features(self, x):
        x = self.stem.bn(self.stem.conv(x))
        for si in range(4):
            x = getattr(self, f"s{si + 1}")(x)
        return x

    def forward(self, x):
        return self.head(self.forward_features(x))


class ResNetBasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.act1 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.act2 = nn.ReLU(inplace=True)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        shortcut = x
        x = self.act1(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        if self.downsample is not None:
            shortcut = self.downsample(shortcut)
        return self.act2(x + shortcut)


class ResNet(nn.Module):
    """timm 0.5.4 resnet18/34 (basic blocks) with timm naming."""

    def __init__(self, depths, widths=(64, 128, 256, 512)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.act1 = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for li, (d, w) in enumerate(zip(depths, widths)):
            blocks = []
            for bi in range(d):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(ResNetBasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.global_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(in_ch, 1000)
        self.feature_info = [dict(num_chs=64)] + [
            dict(num_chs=w) for w in widths]

    def forward_features(self, x):
        x = self.maxpool(self.act1(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x

    def forward(self, x):
        return self.fc(torch.flatten(self.global_pool(
            self.forward_features(x)), 1))


_MODELS = {
    # regnety_032 = RegNetY-3.2GF: w0=80 wa=42.63 wm=2.66 gw=24 depth=21
    # -> per-stage depths (2,5,13,1), widths (72,216,576,1512)
    "regnety_032": lambda: RegNetY((2, 5, 13, 1), (72, 216, 576, 1512), 24),
    "resnet34": lambda: ResNet((3, 4, 6, 3)),
    "resnet18": lambda: ResNet((2, 2, 2, 2)),
}


def create_model(model_name, pretrained=False, **kwargs):
    if model_name not in _MODELS:
        raise ValueError(f"timm shim: unknown model '{model_name}' "
                         f"(available: {sorted(_MODELS)})")
    return _MODELS[model_name]()
