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

    # Image branches keep the timm stem (stem.conv aliased as conv1,
    # transfuser.py:384); the LidarEncoder DELETES stem.conv and registers
    # the replacement in-channel conv as top-level `conv1`
    # (transfuser.py:478-488), so real reference checkpoints carry
    # `conv1.weight` + `stem.bn.*` with no `stem.conv.*` on that branch.
    stem_conv = "stem.conv" if "stem.conv.weight" in state else "conv1"
    put_convbn(stem_conv, "stem.bn", ("_stem",))

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


def convert_convnext_statedict(state: Mapping[str, Any]
                               ) -> Tuple[Dict, Dict]:
    """timm ConvNeXt state dict (stem.0/1, stages.S.blocks.B.{conv_dw,norm,
    mlp.fc1,mlp.fc2,gamma}, stages.S.downsample.{0,1} — the names a reference
    convnext checkpoint carries, transfuser.py:394-416 surgery only aliases)
    -> (params, batch_stats={}) for encoders.ConvNeXt."""
    params: Dict = {}
    state = {k: _to_numpy(v) for k, v in strip_ddp_prefix(state).items()}

    # As with regnety: the reference LidarEncoder deletes stem._modules['0']
    # and re-registers the in-channel conv as top-level `conv1`
    # (transfuser.py:478-484), so lidar-branch checkpoints carry
    # `conv1.weight/bias` instead of `stem.0.*`.
    stem_conv = "stem.0" if "stem.0.weight" in state else "conv1"
    _set(params, ("_stem_conv", "kernel"),
         convert_conv(state[f"{stem_conv}.weight"]))
    _set(params, ("_stem_conv", "bias"), state[f"{stem_conv}.bias"])
    _set(params, ("_stem_norm", "scale"), state["stem.1.weight"])
    _set(params, ("_stem_norm", "bias"), state["stem.1.bias"])

    block_re = re.compile(r"stages\.(\d+)\.blocks\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in state if (m := block_re.match(k))})
    for stage, block in blocks:
        src = f"stages.{stage}.blocks.{block}"
        dst = (f"_stages_{stage}_{block}",)
        _set(params, dst + ("Conv_0", "kernel"),
             convert_conv(state[f"{src}.conv_dw.weight"]))
        _set(params, dst + ("Conv_0", "bias"), state[f"{src}.conv_dw.bias"])
        _set(params, dst + ("LayerNorm_0", "scale"), state[f"{src}.norm.weight"])
        _set(params, dst + ("LayerNorm_0", "bias"), state[f"{src}.norm.bias"])
        _set(params, dst + ("Dense_0", "kernel"),
             convert_linear(state[f"{src}.mlp.fc1.weight"]))
        _set(params, dst + ("Dense_0", "bias"), state[f"{src}.mlp.fc1.bias"])
        _set(params, dst + ("Dense_1", "kernel"),
             convert_linear(state[f"{src}.mlp.fc2.weight"]))
        _set(params, dst + ("Dense_1", "bias"), state[f"{src}.mlp.fc2.bias"])
        _set(params, dst + ("gamma",), state[f"{src}.gamma"])
    down_re = re.compile(r"stages\.(\d+)\.downsample\.0\.weight")
    for k in state:
        m = down_re.match(k)
        if not m:
            continue
        stage = int(m.group(1))
        src = f"stages.{stage}.downsample"
        # _downs index is stage-1 (no downsample before stage 0)
        _set(params, (f"_downs_{stage - 1}_0", "scale"),
             state[f"{src}.0.weight"])
        _set(params, (f"_downs_{stage - 1}_0", "bias"), state[f"{src}.0.bias"])
        _set(params, (f"_downs_{stage - 1}_1", "kernel"),
             convert_conv(state[f"{src}.1.weight"]))
        _set(params, (f"_downs_{stage - 1}_1", "bias"), state[f"{src}.1.bias"])
    return params, {}


def encoder_converter(arch: str):
    """Converter for a timm-named encoder state dict, by arch family."""
    if arch.startswith("regnety"):
        return convert_regnety_statedict
    if arch.startswith("resnet"):
        return convert_resnet_statedict
    if arch.startswith("convnext"):
        return convert_convnext_statedict
    raise ValueError(f"no state-dict converter for encoder '{arch}'")


def _sub_state(state: Mapping[str, np.ndarray], prefix: str
               ) -> Dict[str, np.ndarray]:
    n = len(prefix)
    return {k[n:]: v for k, v in state.items() if k.startswith(prefix)}


def _convert_gpt(state: Mapping[str, np.ndarray]) -> Dict:
    """One reference GPT module (transfuser.py:284-358) -> GPTFusion params.

    Keys: pos_emb, vel_emb.*, blocks.{i}.{ln1,ln2,attn.{key,query,value,proj},
    mlp.{0,2}}, ln_f. Linear weights transpose; LayerNorm weight->scale.
    """
    p: Dict = {}
    _set(p, ("pos_emb",), state["pos_emb"])
    if "vel_emb.weight" in state:
        _set(p, ("vel_emb", "kernel"), convert_linear(state["vel_emb.weight"]))
        _set(p, ("vel_emb", "bias"), state["vel_emb.bias"])

    block_re = re.compile(r"blocks\.(\d+)\.")
    n_layer = 1 + max(int(m.group(1))
                      for k in state if (m := block_re.match(k)))
    for i in range(n_layer):
        src = f"blocks.{i}"
        dst = (f"block_{i}",)
        for ln in ("ln1", "ln2"):
            _set(p, dst + (ln, "scale"), state[f"{src}.{ln}.weight"])
            _set(p, dst + (ln, "bias"), state[f"{src}.{ln}.bias"])
        for lin in ("key", "query", "value", "proj"):
            _set(p, dst + ("attn", lin, "kernel"),
                 convert_linear(state[f"{src}.attn.{lin}.weight"]))
            _set(p, dst + ("attn", lin, "bias"), state[f"{src}.attn.{lin}.bias"])
        _set(p, dst + ("mlp_fc", "kernel"),
             convert_linear(state[f"{src}.mlp.0.weight"]))
        _set(p, dst + ("mlp_fc", "bias"), state[f"{src}.mlp.0.bias"])
        _set(p, dst + ("mlp_proj", "kernel"),
             convert_linear(state[f"{src}.mlp.2.weight"]))
        _set(p, dst + ("mlp_proj", "bias"), state[f"{src}.mlp.2.bias"])
    _set(p, ("ln_f", "scale"), state["ln_f.weight"])
    _set(p, ("ln_f", "bias"), state["ln_f.bias"])
    return p


def _put_conv(params: Dict, state: Mapping[str, np.ndarray], src: str,
              dst: Tuple[str, ...]) -> None:
    _set(params, dst + ("kernel",), convert_conv(state[f"{src}.weight"]))
    if f"{src}.bias" in state:
        _set(params, dst + ("bias",), state[f"{src}.bias"])


def _put_linear(params: Dict, state: Mapping[str, np.ndarray], src: str,
                dst: Tuple[str, ...]) -> None:
    _set(params, dst + ("kernel",), convert_linear(state[f"{src}.weight"]))
    if f"{src}.bias" in state:
        _set(params, dst + ("bias",), state[f"{src}.bias"])


def _convert_deconv_stack(state: Mapping[str, np.ndarray]) -> Dict:
    """Seg/Depth decoder Sequentials (transfuser.py:214-281): deconv{K}.{0,2}
    -> stack/deconv{K}_{0,1}."""
    p: Dict = {}
    for k in (1, 2, 3):
        _put_conv(p, state, f"deconv{k}.0", ("stack", f"deconv{k}_0"))
        _put_conv(p, state, f"deconv{k}.2", ("stack", f"deconv{k}_1"))
    return p


def convert_transfuser_backbone_statedict(
        state: Mapping[str, np.ndarray], image_architecture: str,
        lidar_architecture: str) -> Tuple[Dict, Dict]:
    """Reference TransfuserBackbone (transfuser.py:7-211) -> our
    models.transfuser.TransfuserBackbone params/batch_stats.

    ``state`` keys are relative to the backbone ('image_encoder.features.*',
    'transformer1.*', 'c5_conv.*', ...). The regnet/convnext module surgery
    (transfuser.py:383-416) registers alias names (conv1, layer1, ...) for the
    same tensors; converters key off the canonical timm names so aliases are
    ignored.
    """
    params: Dict = {}
    stats: Dict = {}
    img_conv = encoder_converter(image_architecture)
    lid_conv = encoder_converter(lidar_architecture)
    p, s = img_conv(_sub_state(state, "image_encoder.features."))
    params["image_encoder"], stats["image_encoder"] = p, s
    p, s = lid_conv(_sub_state(state, "lidar_encoder._model."))
    params["lidar_encoder"], stats["lidar_encoder"] = p, s
    for i in (1, 2, 3, 4):
        params[f"transformer{i}"] = _convert_gpt(
            _sub_state(state, f"transformer{i}."))
    if "change_channel_conv_image.weight" in state:
        _put_conv(params, state, "change_channel_conv_image",
                  ("change_channel_conv_image",))
        _put_conv(params, state, "change_channel_conv_lidar",
                  ("change_channel_conv_lidar",))
    for name in ("c5_conv", "up_conv5", "up_conv4", "up_conv3"):
        _put_conv(params, state, name, ("top_down", name))
    return params, stats


def convert_late_fusion_backbone_statedict(
        state: Mapping[str, np.ndarray], image_architecture: str,
        lidar_architecture: str) -> Tuple[Dict, Dict]:
    """Reference LateFusionBackbone (late_fusion.py:5-111) -> our
    models.late_fusion.LateFusionBackbone params/batch_stats."""
    params: Dict = {}
    stats: Dict = {}
    p, s = encoder_converter(image_architecture)(
        _sub_state(state, "image_encoder.features."))
    params["image_encoder"], stats["image_encoder"] = p, s
    p, s = encoder_converter(lidar_architecture)(
        _sub_state(state, "lidar_encoder._model."))
    params["lidar_encoder"], stats["lidar_encoder"] = p, s
    for src, dst in (("reduce_channels_conv_image",
                      "reduce_channels_conv_image"),
                     ("reduce_channels_conv_lidar",
                      "reduce_channels_conv_lidar")):
        if f"{src}.weight" in state:
            _put_conv(params, state, src, (dst,))
    for src, dst in (("norm_after_pool_img", "norm_after_pool_img"),
                     ("norm_after_pool_lidar", "norm_after_pool_lidar")):
        if f"{src}.weight" in state:  # LayerNorm, convnext trunks only
            _set(params, (dst, "scale"), state[f"{src}.weight"])
            _set(params, (dst, "bias"), state[f"{src}.bias"])
    if "vel_emb.weight" in state:
        _put_linear(params, state, "vel_emb", ("vel_emb",))
    for name in ("c5_conv", "up_conv5", "up_conv4", "up_conv3"):
        _put_conv(params, state, name, ("top_down", name))
    return params, stats


def convert_latent_tf_backbone_statedict(
        state: Mapping[str, np.ndarray], image_architecture: str,
        lidar_architecture: str) -> Tuple[Dict, Dict]:
    """Reference latentTFBackbone (latentTF.py:8-218): module names are
    identical to TransfuserBackbone (its GPT is a verbatim class copy),
    and our LatentTFBackbone nests a TransfuserBackbone as 'inner'."""
    p, s = convert_transfuser_backbone_statedict(
        state, image_architecture, lidar_architecture)
    return {"inner": p}, {"inner": s}


def convert_geometric_fusion_backbone_statedict(
        state: Mapping[str, np.ndarray], image_architecture: str,
        lidar_architecture: str) -> Tuple[Dict, Dict]:
    """Reference GeometricFusionBackbone (geometric_fusion.py:6-91) ->
    our models.geometric_fusion.GeometricFusionBackbone."""
    params: Dict = {}
    stats: Dict = {}
    p, s = encoder_converter(image_architecture)(
        _sub_state(state, "image_encoder.features."))
    params["image_encoder"], stats["image_encoder"] = p, s
    p, s = encoder_converter(lidar_architecture)(
        _sub_state(state, "lidar_encoder._model."))
    params["lidar_encoder"], stats["lidar_encoder"] = p, s
    for i in range(4):
        for src, dst in ((f"image_conv{i + 1}", f"image_convs_{i}"),
                         (f"image_deconv{i + 1}", f"image_deconvs_{i}"),
                         (f"lidar_conv{i + 1}", f"lidar_convs_{i}"),
                         (f"lidar_deconv{i + 1}", f"lidar_deconvs_{i}")):
            _put_conv(params, state, src, (dst,))
        for src, dst in ((f"image_projection{i + 1}",
                          f"image_projections_{i}"),
                         (f"lidar_projection{i + 1}",
                          f"lidar_projections_{i}")):
            # Sequential(Linear, ReLU)*3 -> _ProjectionMLP fc0..fc2
            for j, seq in enumerate((0, 2, 4)):
                _put_linear(params, state, f"{src}.{seq}",
                            (dst, f"fc{j}"))
        if f"vel_emb{i + 1}.weight" in state:
            _put_linear(params, state, f"vel_emb{i + 1}",
                        (f"vel_embs_{i}",))
    if "change_channel_conv_image.weight" in state:
        _put_conv(params, state, "change_channel_conv_image",
                  ("change_channel_conv_image",))
        _put_conv(params, state, "change_channel_conv_lidar",
                  ("change_channel_conv_lidar",))
    for name in ("c5_conv", "up_conv5", "up_conv4", "up_conv3"):
        _put_conv(params, state, name, ("top_down", name))
    return params, stats


_BACKBONE_CONVERTERS = {
    "transFuser": convert_transfuser_backbone_statedict,
    "late_fusion": convert_late_fusion_backbone_statedict,
    "latentTF": convert_latent_tf_backbone_statedict,
    "geometric_fusion": convert_geometric_fusion_backbone_statedict,
}


def convert_lidar_centernet_statedict(state: Mapping[str, Any],
                                      config: Any) -> Dict[str, Dict]:
    """Full reference ``model_*.pth`` state dict (LidarCenterNet,
    model.py:538-609) -> flax variables {'params', 'batch_stats'} for
    models.lidar_centernet.LidarCenterNet.

    Covers all four backbones (transFuser / late_fusion / latentTF /
    geometric_fusion), seg/depth decoders, pred_bev convs, the
    7-branch CenterNet head (model.py:70-99), the join MLP + GRUCell + output
    (model.py:592-609). PID controller state (not parameters) is ignored.
    """
    state = {k: _to_numpy(v) for k, v in strip_ddp_prefix(state).items()}
    mcfg = config.model
    if mcfg.backbone not in _BACKBONE_CONVERTERS:
        raise NotImplementedError(
            f"checkpoint import implemented for "
            f"{sorted(_BACKBONE_CONVERTERS)}; got {mcfg.backbone}")

    # Guard against silent layer-count drift: flax apply IGNORES extra
    # params, so loading a 4-layer reference checkpoint (train.py:56,120
    # default) into an 8-layer-config model (reference config.py:177 class
    # default) would silently drop blocks 4..7 and produce garbage.
    # Found via tests/test_reference_oracle.py.
    blk_re = re.compile(r"_model\.transformer1\.blocks\.(\d+)\.")
    blocks = {int(m.group(1)) for k in state if (m := blk_re.match(k))}
    if blocks:
        ckpt_layers = 1 + max(blocks)
        if ckpt_layers != mcfg.gpt.n_layer:
            raise ValueError(
                f"checkpoint GPT has {ckpt_layers} layers but "
                f"config.model.gpt.n_layer={mcfg.gpt.n_layer}; set n_layer "
                "to match the checkpoint (reference train.py trains with 4)")

    params: Dict = {}
    stats: Dict = {}
    p, s = _BACKBONE_CONVERTERS[mcfg.backbone](
        _sub_state(state, "_model."), mcfg.image_architecture,
        mcfg.lidar_architecture)
    params["backbone"], stats["backbone"] = p, s

    if mcfg.multitask:
        params["seg_decoder"] = _convert_deconv_stack(
            _sub_state(state, "seg_decoder."))
        params["depth_decoder"] = _convert_deconv_stack(
            _sub_state(state, "depth_decoder."))

    _put_conv(params, state, "pred_bev.0", ("pred_bev_conv0",))
    _put_conv(params, state, "pred_bev.2", ("pred_bev_conv1",))

    head: Dict = {}
    for branch in ("heatmap", "wh", "offset", "yaw_class", "yaw_res",
                   "velocity", "brake"):
        _put_conv(head, state, f"head.{branch}_head.0", (branch, "conv0"))
        _put_conv(head, state, f"head.{branch}_head.2", (branch, "conv1"))
    params["head"] = head

    gru: Dict = {}
    for i, j in enumerate((0, 2, 4)):
        _put_linear(gru, state, f"join.{j}", (f"join_{i}",))
    # torch GRUCell: weight_ih (3H, in) rows ordered [r; z; n] — matches
    # TorchGRUCell's split order; bias_ih/bias_hh stay separate.
    _set(gru, ("cell", "weight_ih", "kernel"),
         convert_linear(state["decoder.weight_ih"]))
    _set(gru, ("cell", "weight_ih", "bias"), state["decoder.bias_ih"])
    _set(gru, ("cell", "weight_hh", "kernel"),
         convert_linear(state["decoder.weight_hh"]))
    _set(gru, ("cell", "weight_hh", "bias"), state["decoder.bias_hh"])
    _put_linear(gru, state, "output", ("output",))
    params["wp_gru"] = gru

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str, config: Any) -> Dict[str, Dict]:
    """Load a reference ``model_*.pth`` file (torch.save state dict,
    submission_agent.py:93-95) and convert to flax variables."""
    import torch
    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_lidar_centernet_statedict(state, config)


def _flat_leaves(tree: Dict, prefix: Tuple[str, ...] = ()):
    out = []
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            out.extend(_flat_leaves(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), v))
    return out
