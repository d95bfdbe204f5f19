"""Golden test: torch RegNetY (timm-named) -> flax conversion parity."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from transfuser_tpu.models.encoders import RegNetY
from transfuser_tpu.train.torch_import import convert_regnety_statedict


class ConvBnAct(tnn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(out_ch)
        self.act = tnn.ReLU() if act else tnn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SE(tnn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, rd, 1, bias=True)
        self.fc2 = tnn.Conv2d(rd, ch, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class Bottleneck(tnn.Module):
    def __init__(self, in_ch, out_ch, stride, group_width, se_ratio=0.25):
        super().__init__()
        groups = out_ch // group_width
        self.conv1 = ConvBnAct(in_ch, out_ch, 1)
        self.conv2 = ConvBnAct(out_ch, out_ch, 3, stride, groups)
        self.se = SE(out_ch, int(round(in_ch * se_ratio)))
        self.conv3 = ConvBnAct(out_ch, out_ch, 1, act=False)
        self.act3 = tnn.ReLU()
        if stride != 1 or in_ch != out_ch:
            self.downsample = ConvBnAct(in_ch, out_ch, 1, stride, act=False)
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        out = self.conv3(self.se(self.conv2(self.conv1(x))))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.act3(out + idt)


class TorchRegNetY(tnn.Module):
    """timm-named RegNetY: stem.conv/bn, s{K}.b{J}.*"""

    def __init__(self, depths, widths, group_width, stem_width=32):
        super().__init__()
        self.stem = tnn.Module()
        self.stem.conv = tnn.Conv2d(3, stem_width, 3, 2, 1, bias=False)
        self.stem.bn = tnn.BatchNorm2d(stem_width)
        in_ch = stem_width
        for si, (d, w) in enumerate(zip(depths, widths)):
            stage = tnn.Module()
            for bi in range(d):
                setattr(stage, f"b{bi + 1}",
                        Bottleneck(in_ch, w, 2 if bi == 0 else 1,
                                   group_width))
                in_ch = w
            setattr(self, f"s{si + 1}", stage)
        self.depths = depths

    def forward(self, x):
        x = torch.relu(self.stem.bn(self.stem.conv(x)))
        for si, d in enumerate(self.depths):
            stage = getattr(self, f"s{si + 1}")
            for bi in range(d):
                x = getattr(stage, f"b{bi + 1}")(x)
        return x


def test_regnety_conversion_output_parity(rng):
    depths, widths, gw = (1, 2, 1, 1), (24, 48, 96, 192), 24
    tm = TorchRegNetY(depths, widths, gw).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.3, 0.3)

    params, stats = convert_regnety_statedict(tm.state_dict())
    fm = RegNetY(depths=depths, widths=widths, group_width=gw,
                 dtype=jnp.float32)
    x = rng.standard_normal((1, 32, 64, 3)).astype(np.float32)
    ref_vars = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def paths(tree, p=()):
        out = set()
        for k, v in tree.items():
            out |= paths(v, p + (k,)) if isinstance(v, dict) else {p + (k,)}
        return out

    assert paths(params) == paths(ref_vars["params"])
    assert paths(stats) == paths(ref_vars["batch_stats"])

    got = np.asarray(fm.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
