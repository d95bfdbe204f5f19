"""Golden test: torch ResNet -> flax weight conversion produces identical
outputs (validates conv/linear/BN layout conventions end to end)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from transfuser_tpu.models.encoders import ResNet
from transfuser_tpu.train.torch_import import convert_resnet_statedict


class TorchBasicBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet(tnn.Module):
    """torchvision-style naming: conv1/bn1/layer1..4."""

    def __init__(self, depths=(1, 1, 1, 1), widths=(8, 16, 32, 64)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for li, (d, w) in enumerate(zip(depths, widths)):
            blocks = []
            for bi in range(d):
                stride = 2 if (bi == 0 and li > 0) else 1
                blocks.append(TorchBasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x


def test_resnet_conversion_output_parity(rng):
    depths, widths = (1, 1, 1, 1), (64, 16, 32, 64)
    tm = TorchResNet(depths, widths).eval()
    # randomize BN stats so eval mode is a real test
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    params, stats = convert_resnet_statedict(tm.state_dict())

    fm = ResNet(depths=depths, widths=widths, dtype=jnp.float32)
    x = rng.standard_normal((1, 32, 64, 3)).astype(np.float32)
    ref_vars = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    # converted trees must structurally match the flax init trees
    def paths(tree, p=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, p + (k,))
            else:
                out.add(p + (k,))
        return out

    assert paths(params) == paths(ref_vars["params"])
    assert paths(stats) == paths(ref_vars["batch_stats"])

    variables = {"params": params, "batch_stats": stats}
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
