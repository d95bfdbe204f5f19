"""torch -> JAX weight conversion.

Two import paths (SURVEY.md §7 'pretrained-weight parity'):
  * timm encoder checkpoints (regnety_032 / resnet / convnext ImageNet
    weights) -> our flax encoder params, for pretrained-image-branch init
    (reference transfuser.py:380 uses pretrained=True),
  * full reference LidarCenterNet ``model_*.pth`` state dicts (with the DDP
    ``module.`` prefix, submission_agent.py:95) -> our model variables, for
    inference-parity evaluation of reference-trained models.

Conventions handled: NCHW conv kernels (O,I,H,W) -> NHWC HWIO; torch Linear
(out,in) -> flax (in,out); BatchNorm running stats -> flax batch_stats;
grouped convs keep torch group ordering (flax feature_group_count matches).
Loading is name-driven off the state-dict keys, so it works from a plain
dict of numpy arrays — no torch import needed at conversion time.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_conv(w: np.ndarray) -> np.ndarray:
    """(O, I, H, W) -> (H, W, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def strip_ddp_prefix(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DDP 'module.' prefix (submission_agent.py:95)."""
    out = {}
    for k, v in state.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------- encoders

def convert_resnet_statedict(state: Mapping[str, Any]
                             ) -> Tuple[Dict, Dict]:
    """torchvision/timm-style resnet state dict -> (params, batch_stats)
    matching models/encoders.ResNet. Keys: conv1, bn1, layerL.B.convN/bnN,
    layerL.B.downsample.{0,1}."""
    params: Dict = {}
    stats: Dict = {}
    state = {k: _to_numpy(v) for k, v in strip_ddp_prefix(state).items()}

    def bn(prefix: str, path: Tuple[str, ...]) -> None:
        _set(params, path + ("scale",), state[f"{prefix}.weight"])
        _set(params, path + ("bias",), state[f"{prefix}.bias"])
        _set(stats, path + ("mean",), state[f"{prefix}.running_mean"])
        _set(stats, path + ("var",), state[f"{prefix}.running_var"])

    _set(params, ("_conv1", "kernel"), convert_conv(state["conv1.weight"]))
    bn("bn1", ("_bn1",))

    # Stage/block layout mirrors ResNet.setup(): blocks are numbered
    # modules (ConvBN_0, ConvBN_1, optional downsample ConvBN_2) inside
    # BasicBlock_{i} under _stages_{L}.
    block_re = re.compile(r"layer(\d+)\.(\d+)\.(.*)")
    blocks: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
    for key, val in state.items():
        m = block_re.match(key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)) - 1, int(m.group(2)), m.group(3)
        blocks.setdefault((stage, block), {})[rest] = val

    for (stage, block) in sorted(blocks):
        sd = blocks[(stage, block)]
        p = (f"_stages_{stage}_{block}",)
        # ConvBN submodule auto-names: ConvBN_0 (conv+bn), ConvBN_1, shortcut
        _set(params, p + ("ConvBN_0", "Conv_0", "kernel"),
             convert_conv(sd["conv1.weight"]))
        _set(params, p + ("ConvBN_0", "BatchNorm_0", "scale"),
             sd["bn1.weight"])
        _set(params, p + ("ConvBN_0", "BatchNorm_0", "bias"), sd["bn1.bias"])
        _set(stats, p + ("ConvBN_0", "BatchNorm_0", "mean"),
             sd["bn1.running_mean"])
        _set(stats, p + ("ConvBN_0", "BatchNorm_0", "var"),
             sd["bn1.running_var"])
        _set(params, p + ("ConvBN_1", "Conv_0", "kernel"),
             convert_conv(sd["conv2.weight"]))
        _set(params, p + ("ConvBN_1", "BatchNorm_0", "scale"),
             sd["bn2.weight"])
        _set(params, p + ("ConvBN_1", "BatchNorm_0", "bias"), sd["bn2.bias"])
        _set(stats, p + ("ConvBN_1", "BatchNorm_0", "mean"),
             sd["bn2.running_mean"])
        _set(stats, p + ("ConvBN_1", "BatchNorm_0", "var"),
             sd["bn2.running_var"])
        if "downsample.0.weight" in sd:
            _set(params, p + ("ConvBN_2", "Conv_0", "kernel"),
                 convert_conv(sd["downsample.0.weight"]))
            _set(params, p + ("ConvBN_2", "BatchNorm_0", "scale"),
                 sd["downsample.1.weight"])
            _set(params, p + ("ConvBN_2", "BatchNorm_0", "bias"),
                 sd["downsample.1.bias"])
            _set(stats, p + ("ConvBN_2", "BatchNorm_0", "mean"),
                 sd["downsample.1.running_mean"])
            _set(stats, p + ("ConvBN_2", "BatchNorm_0", "var"),
                 sd["downsample.1.running_var"])
    return params, stats


def convert_regnety_statedict(state: Mapping[str, Any]
                              ) -> Tuple[Dict, Dict]:
    """timm RegNetY state dict (stem.conv/bn, s{K}.b{J}.conv1/conv2/se/
    conv3/downsample — timm 0.5.4 regnet.py naming, the exact names the
    reference checkpoints carry since its module surgery only aliases,
    transfuser.py:383-393) -> (params, batch_stats) for encoders.RegNetY.

    Grouped convs keep torch's group-blocked channel order, which matches
    flax feature_group_count semantics, so convert_conv applies unchanged.
    """
    params: Dict = {}
    stats: Dict = {}
    state = {k: _to_numpy(v) for k, v in strip_ddp_prefix(state).items()}

    def put_convbn(src_conv: str, src_bn: str, dst: Tuple[str, ...]) -> None:
        _set(params, dst + ("Conv_0", "kernel"),
             convert_conv(state[f"{src_conv}.weight"]))
        _set(params, dst + ("BatchNorm_0", "scale"), state[f"{src_bn}.weight"])
        _set(params, dst + ("BatchNorm_0", "bias"), state[f"{src_bn}.bias"])
        _set(stats, dst + ("BatchNorm_0", "mean"),
             state[f"{src_bn}.running_mean"])
        _set(stats, dst + ("BatchNorm_0", "var"),
             state[f"{src_bn}.running_var"])

    put_convbn("stem.conv", "stem.bn", ("_stem",))

    block_re = re.compile(r"s(\d+)\.b(\d+)\.")
    blocks = sorted({(int(m.group(1)) - 1, int(m.group(2)) - 1)
                     for k in state if (m := block_re.match(k))})
    for stage, block in blocks:
        src = f"s{stage + 1}.b{block + 1}"
        dst = (f"_stages_{stage}", f"RegNetYBlock_{block}")
        put_convbn(f"{src}.conv1.conv", f"{src}.conv1.bn", dst + ("ConvBN_0",))
        put_convbn(f"{src}.conv2.conv", f"{src}.conv2.bn", dst + ("ConvBN_1",))
        _set(params, dst + ("SEModule_0", "Conv_0", "kernel"),
             convert_conv(state[f"{src}.se.fc1.weight"]))
        _set(params, dst + ("SEModule_0", "Conv_0", "bias"),
             state[f"{src}.se.fc1.bias"])
        _set(params, dst + ("SEModule_0", "Conv_1", "kernel"),
             convert_conv(state[f"{src}.se.fc2.weight"]))
        _set(params, dst + ("SEModule_0", "Conv_1", "bias"),
             state[f"{src}.se.fc2.bias"])
        put_convbn(f"{src}.conv3.conv", f"{src}.conv3.bn", dst + ("ConvBN_2",))
        if f"{src}.downsample.conv.weight" in state:
            put_convbn(f"{src}.downsample.conv", f"{src}.downsample.bn",
                       dst + ("ConvBN_3",))
    return params, stats


def _flat_leaves(tree: Dict, prefix: Tuple[str, ...] = ()):
    out = []
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            out.extend(_flat_leaves(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), v))
    return out
