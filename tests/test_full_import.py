"""Golden test: full reference LidarCenterNet checkpoint import + fp32
forward parity.

Builds a torch replica of the reference model (team_code_transfuser/
model.py:538-805 + transfuser.py:7-366) at tiny scale with the EXACT
reference state-dict naming (``_model.image_encoder.features.*``,
``_model.transformer{i}.*``, ``head.*_head.{0,2}``, ``join.{0,2,4}``,
``decoder.*``, ...), converts its state dict through
``convert_lidar_centernet_statedict`` and asserts fp32 output parity of the
full training forward (waypoints, 7 CenterNet maps, pred_bev, seg, depth)
against our flax model.

The replica reproduces the reference math faithfully, including the GPT
token-unpack view quirk (transfuser.py:360) which our model replicates under
``gpt.reference_view_unpack``.
"""

import dataclasses
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from helpers import tiny_config
from test_regnet_import import TorchRegNetY
from transfuser_tpu.models.lidar_centernet import LidarCenterNet
from transfuser_tpu.train.torch_import import convert_lidar_centernet_statedict

DEPTHS, WIDTHS, GW = (1, 2, 1, 1), (24, 48, 96, 192), 24
FEATS = 128           # perception_output_features
CH = 64               # centernet channel
IMG_ANCH, LID_ANCH = (2, 4), (2, 2)
N_HEAD, N_LAYER = 4, 2
PRED_LEN, GRU_HIDDEN = 4, 64
LIDAR_POS_X = 1.3
BEV_HW = (40, 40)


def normalize_imagenet(x):
    # transfuser.py:419-428
    x = x.clone()
    x[:, 0] = ((x[:, 0] / 255.0) - 0.485) / 0.229
    x[:, 1] = ((x[:, 1] / 255.0) - 0.456) / 0.224
    x[:, 2] = ((x[:, 2] / 255.0) - 0.406) / 0.225
    return x


class TorchSelfAttention(tnn.Module):
    # transfuser.py:491-527
    def __init__(self, n_embd, n_head):
        super().__init__()
        self.key = tnn.Linear(n_embd, n_embd)
        self.query = tnn.Linear(n_embd, n_embd)
        self.value = tnn.Linear(n_embd, n_embd)
        self.proj = tnn.Linear(n_embd, n_embd)
        self.n_head = n_head

    def forward(self, x):
        B, T, C = x.size()
        k = self.key(x).view(B, T, self.n_head, C // self.n_head).transpose(1, 2)
        q = self.query(x).view(B, T, self.n_head, C // self.n_head).transpose(1, 2)
        v = self.value(x).view(B, T, self.n_head, C // self.n_head).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) * (1.0 / math.sqrt(k.size(-1)))
        att = F.softmax(att, dim=-1)
        y = (att @ v).transpose(1, 2).contiguous().view(B, T, C)
        return self.proj(y)


class TorchBlock(tnn.Module):
    # transfuser.py:530-549
    def __init__(self, n_embd, n_head, block_exp=4):
        super().__init__()
        self.ln1 = tnn.LayerNorm(n_embd)
        self.ln2 = tnn.LayerNorm(n_embd)
        self.attn = TorchSelfAttention(n_embd, n_head)
        self.mlp = tnn.Sequential(
            tnn.Linear(n_embd, block_exp * n_embd),
            tnn.ReLU(True),
            tnn.Linear(block_exp * n_embd, n_embd),
            tnn.Dropout(0.0),
        )

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        x = x + self.mlp(self.ln2(x))
        return x


class TorchGPT(tnn.Module):
    # transfuser.py:284-366
    def __init__(self, n_embd, n_head, n_layer, img_anchors, lidar_anchors):
        super().__init__()
        self.n_embd = n_embd
        self.iv, self.ih = img_anchors
        self.lv, self.lh = lidar_anchors
        n_tok = self.iv * self.ih + self.lv * self.lh
        self.pos_emb = tnn.Parameter(torch.zeros(1, n_tok, n_embd))
        self.vel_emb = tnn.Linear(1, n_embd)
        self.blocks = tnn.Sequential(
            *[TorchBlock(n_embd, n_head) for _ in range(n_layer)])
        self.ln_f = tnn.LayerNorm(n_embd)

    def forward(self, image_tensor, lidar_tensor, velocity):
        bz = lidar_tensor.shape[0]
        lidar_h, lidar_w = lidar_tensor.shape[2:4]
        img_h, img_w = image_tensor.shape[2:4]
        image_tensor = image_tensor.view(bz, 1, -1, img_h, img_w) \
            .permute(0, 1, 3, 4, 2).contiguous().view(bz, -1, self.n_embd)
        lidar_tensor = lidar_tensor.view(bz, 1, -1, lidar_h, lidar_w) \
            .permute(0, 1, 3, 4, 2).contiguous().view(bz, -1, self.n_embd)
        token_embeddings = torch.cat((image_tensor, lidar_tensor), dim=1)
        velocity_embeddings = self.vel_emb(velocity)
        x = self.pos_emb + token_embeddings + velocity_embeddings.unsqueeze(1)
        x = self.blocks(x)
        x = self.ln_f(x)
        # the view quirk at transfuser.py:360-363 (no inverse permute)
        n_img = self.iv * self.ih
        image_out = x[:, :n_img, :].contiguous().view(bz, -1, img_h, img_w)
        lidar_out = x[:, n_img:, :].contiguous().view(bz, -1, lidar_h, lidar_w)
        return image_out, lidar_out


def _run_stage(trunk: TorchRegNetY, i: int, x):
    stage = getattr(trunk, f"s{i + 1}")
    for bi in range(trunk.depths[i]):
        x = getattr(stage, f"b{bi + 1}")(x)
    return x


class TorchBackbone(tnn.Module):
    # transfuser.py:7-211 (TransfuserBackbone)
    def __init__(self):
        super().__init__()
        self.avgpool_img = tnn.AdaptiveAvgPool2d(IMG_ANCH)
        self.avgpool_lidar = tnn.AdaptiveAvgPool2d(LID_ANCH)
        self.image_encoder = tnn.Module()
        self.image_encoder.features = TorchRegNetY(DEPTHS, WIDTHS, GW)
        self.lidar_encoder = tnn.Module()
        self.lidar_encoder._model = TorchRegNetY(DEPTHS, WIDTHS, GW)
        for i, w in enumerate(WIDTHS):
            setattr(self, f"transformer{i + 1}",
                    TorchGPT(w, N_HEAD, N_LAYER, IMG_ANCH, LID_ANCH))
        self.change_channel_conv_image = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.change_channel_conv_lidar = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.up_conv5 = tnn.Conv2d(CH, CH, 1)
        self.up_conv4 = tnn.Conv2d(CH, CH, 1)
        self.up_conv3 = tnn.Conv2d(CH, CH, 1)
        self.c5_conv = tnn.Conv2d(FEATS, CH, 1)

    def top_down(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                     align_corners=False)
        p5 = F.relu(self.c5_conv(x))
        p4 = F.relu(self.up_conv5(up(p5)))
        p3 = F.relu(self.up_conv4(up(p4)))
        p2 = F.relu(self.up_conv3(up(p3)))
        return p2, p3, p4, p5

    def forward(self, image, lidar, velocity):
        image_features = normalize_imagenet(image)
        im = self.image_encoder.features
        li = self.lidar_encoder._model
        # regnet stem (surgery: relu folded into bn, no maxpool)
        image_features = torch.relu(im.stem.bn(im.stem.conv(image_features)))
        lidar_features = torch.relu(li.stem.bn(li.stem.conv(lidar)))
        for i in range(4):
            image_features = _run_stage(im, i, image_features)
            lidar_features = _run_stage(li, i, lidar_features)
            ie = self.avgpool_img(image_features)
            le = self.avgpool_lidar(lidar_features)
            io_, lo = getattr(self, f"transformer{i + 1}")(ie, le, velocity)
            io_ = F.interpolate(io_, size=image_features.shape[2:4],
                                mode="bilinear", align_corners=False)
            lo = F.interpolate(lo, size=lidar_features.shape[2:4],
                               mode="bilinear", align_corners=False)
            image_features = image_features + io_
            lidar_features = lidar_features + lo
        image_features = self.change_channel_conv_image(image_features)
        lidar_features = self.change_channel_conv_lidar(lidar_features)
        x4 = lidar_features
        image_features_grid = image_features
        fused = image_features.mean((2, 3)) + lidar_features.mean((2, 3))
        return self.top_down(x4), image_features_grid, fused


def _deconv(cin, c1, c2, c3, cout, s1, s2):
    # transfuser.py:214-281
    d1 = tnn.Sequential(tnn.Conv2d(cin, c1, 3, 1, 1), tnn.ReLU(True),
                        tnn.Conv2d(c1, c2, 3, 1, 1), tnn.ReLU(True))
    d2 = tnn.Sequential(tnn.Conv2d(c2, c3, 3, 1, 1), tnn.ReLU(True),
                        tnn.Conv2d(c3, c3, 3, 1, 1), tnn.ReLU(True))
    d3 = tnn.Sequential(tnn.Conv2d(c3, c3, 3, 1, 1), tnn.ReLU(True),
                        tnn.Conv2d(c3, cout, 3, 1, 1))
    return d1, d2, d3, s1, s2


class TorchDecoder(tnn.Module):
    def __init__(self, cin, c1, c2, c3, cout, s1, s2, depth=False):
        super().__init__()
        self.deconv1, self.deconv2, self.deconv3, self.s1, self.s2 = \
            _deconv(cin, c1, c2, c3, cout, s1, s2)
        self.depth = depth

    def forward(self, x):
        x = self.deconv1(x)
        x = F.interpolate(x, scale_factor=self.s1, mode="bilinear",
                          align_corners=False)
        x = self.deconv2(x)
        x = F.interpolate(x, scale_factor=self.s2, mode="bilinear",
                          align_corners=False)
        x = self.deconv3(x)
        if self.depth:
            x = torch.sigmoid(x).squeeze(1)
        return x


class TorchHead(tnn.Module):
    # model.py:54-147
    def __init__(self, ch, num_classes=1, num_dir_bins=12):
        super().__init__()
        build = lambda out: tnn.Sequential(
            tnn.Conv2d(ch, ch, 3, padding=1), tnn.ReLU(True),
            tnn.Conv2d(ch, out, 1))
        self.heatmap_head = build(num_classes)
        self.wh_head = build(2)
        self.offset_head = build(2)
        self.yaw_class_head = build(num_dir_bins)
        self.yaw_res_head = build(1)
        self.velocity_head = build(1)
        self.brake_head = build(2)

    def forward(self, feat):
        return {
            "heatmap": self.heatmap_head(feat).sigmoid(),
            "wh": self.wh_head(feat),
            "offset": self.offset_head(feat),
            "yaw_class": self.yaw_class_head(feat),
            "yaw_res": self.yaw_res_head(feat),
            "velocity": self.velocity_head(feat),
            "brake": self.brake_head(feat),
        }


class TorchLidarCenterNet(tnn.Module):
    # model.py:538-609 with tiny deconv channels matching tiny_config
    def __init__(self):
        super().__init__()
        self._model = TorchBackbone()
        self.seg_decoder = TorchDecoder(FEATS, 32, 16, 8, 7, 8, 4)
        self.depth_decoder = TorchDecoder(FEATS, 32, 16, 8, 1, 8, 4,
                                          depth=True)
        self.pred_bev = tnn.Sequential(
            tnn.Conv2d(CH, CH, 3, 1, 1), tnn.ReLU(True),
            tnn.Conv2d(CH, 3, 1, 1, 0))
        self.head = TorchHead(CH)
        self.join = tnn.Sequential(
            tnn.Linear(FEATS, 256), tnn.ReLU(True),
            tnn.Linear(256, 128), tnn.ReLU(True),
            tnn.Linear(128, GRU_HIDDEN), tnn.ReLU(True))
        self.decoder = tnn.GRUCell(input_size=4, hidden_size=GRU_HIDDEN)
        self.output = tnn.Linear(GRU_HIDDEN, 3)

    def forward_gru(self, z, target_point):
        # model.py:611-646
        z = self.join(z)
        output_wp = []
        x = torch.zeros(size=(z.shape[0], 2), dtype=z.dtype)
        target_point = target_point.clone()
        target_point[:, 1] *= -1
        for _ in range(PRED_LEN):
            x_in = torch.cat([x, target_point], dim=1)
            z = self.decoder(x_in, z)
            dx = self.output(z)
            x = dx[:, :2] + x
            output_wp.append(x[:, :2])
        pred_wp = torch.stack(output_wp, dim=1)
        pred_wp[:, :, 0] = pred_wp[:, :, 0] - LIDAR_POS_X
        return pred_wp

    def forward(self, rgb, lidar_bev, target_point, target_point_image,
                velocity):
        lidar_bev = torch.cat((lidar_bev, target_point_image), dim=1)
        features, image_features_grid, fused = self._model(rgb, lidar_bev,
                                                           velocity)
        pred_wp = self.forward_gru(fused, target_point)
        pred_bev = self.pred_bev(features[0])
        pred_bev = F.interpolate(pred_bev, BEV_HW, mode="bilinear",
                                 align_corners=True)
        out = {"pred_wp": pred_wp, "pred_bev": pred_bev,
               "pred_semantic": self.seg_decoder(image_features_grid),
               "pred_depth": self.depth_decoder(image_features_grid)}
        for k, v in self.head(features[0]).items():
            out[f"head_{k}"] = v
        return out


def _parity_config():
    cfg = tiny_config()
    gpt = dataclasses.replace(
        cfg.model.gpt, n_layer=N_LAYER, n_head=N_HEAD,
        img_vert_anchors=IMG_ANCH[0], img_horz_anchors=IMG_ANCH[1],
        lidar_vert_anchors=LID_ANCH[0], lidar_horz_anchors=LID_ANCH[1],
        reference_view_unpack=True)
    model = dataclasses.replace(
        cfg.model, image_architecture="regnety_micro",
        lidar_architecture="regnety_micro", gpt=gpt, use_velocity=True,
        deconv_channel_num_1=32, deconv_channel_num_2=16,
        deconv_channel_num_3=8)
    return cfg.replace(model=model)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_full_checkpoint_import_forward_parity(rng):
    torch.manual_seed(3)
    tm = TorchLidarCenterNet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.3, 0.3)
        # non-zero pos_emb so the unpack quirk is actually exercised
        for i in range(4):
            getattr(tm._model, f"transformer{i + 1}").pos_emb.uniform_(-0.1, 0.1)

    # DDP prefix handling on the way in (submission_agent.py:95)
    state = {f"module.{k}": v for k, v in tm.state_dict().items()}

    cfg = _parity_config()
    variables = convert_lidar_centernet_statedict(state, cfg)
    fm = LidarCenterNet(cfg, dtype=jnp.float32)

    rgb = rng.uniform(0, 255, (2, 64, 128, 3)).astype(np.float32)
    lidar = rng.uniform(0, 1, (2, 64, 64, 2)).astype(np.float32)
    tp = rng.uniform(-20, 20, (2, 2)).astype(np.float32)
    tpi = (rng.uniform(0, 1, (2, 64, 64, 1)) > 0.99).astype(np.float32)
    vel = rng.uniform(0, 10, (2, 1)).astype(np.float32)

    # tree congruence with a fresh init (catches silent name drift)
    ref_vars = jax.eval_shape(
        lambda k: fm.init(k, jnp.asarray(rgb), jnp.asarray(lidar),
                          jnp.asarray(tp), jnp.asarray(tpi), jnp.asarray(vel),
                          train=False), jax.random.PRNGKey(0))

    def paths(tree, p=()):
        out = set()
        for k, v in tree.items():
            out |= paths(v, p + (k,)) if isinstance(v, dict) else {p + (k,)}
        return out

    assert paths(variables["params"]) == paths(dict(ref_vars["params"]))
    assert paths(variables["batch_stats"]) == paths(dict(ref_vars["batch_stats"]))
    for col in ("params", "batch_stats"):
        got_shapes = {p: np.shape(v) for p, v in _leaves(variables[col])}
        want_shapes = {p: tuple(v.shape) for p, v in _leaves(dict(ref_vars[col]))}
        assert got_shapes == want_shapes

    got = fm.apply(variables, jnp.asarray(rgb), jnp.asarray(lidar),
                   jnp.asarray(tp), jnp.asarray(tpi), jnp.asarray(vel),
                   train=False, compute_aux=True)

    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(lidar, (0, 3, 1, 2))),
                  torch.from_numpy(tp),
                  torch.from_numpy(np.transpose(tpi, (0, 3, 1, 2))),
                  torch.from_numpy(vel))

    def tt(name, nchw=True):
        w = want[name].numpy()
        return np.transpose(w, (0, 2, 3, 1)) if nchw else w

    np.testing.assert_allclose(np.asarray(got["pred_wp"]), tt("pred_wp", False),
                               rtol=1e-3, atol=1e-4)
    for k in ("heatmap", "wh", "offset", "yaw_class", "yaw_res", "velocity",
              "brake"):
        np.testing.assert_allclose(np.asarray(got[f"head_{k}"]),
                                   tt(f"head_{k}"), rtol=1e-3, atol=1e-4,
                                   err_msg=f"head_{k}")
    np.testing.assert_allclose(np.asarray(got["pred_bev"]), tt("pred_bev"),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["pred_semantic"]),
                               tt("pred_semantic"), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["pred_depth"]),
                               tt("pred_depth", False), rtol=1e-3, atol=1e-4)


def _leaves(tree, p=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, p + (k,))
        else:
            yield "/".join(p + (k,)), v


def test_hybrid_agent_loads_reference_pth(tmp_path):
    """HybridAgent ensembles reference model_*.pth checkpoints directly
    (submission_agent.py:84-99 loads every *.pth in TEAM_CONFIG)."""
    import os

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.train.checkpoint import save_config_snapshot

    cfg = _parity_config()
    save_config_snapshot(str(tmp_path), cfg)
    torch.manual_seed(5)
    tm = TorchLidarCenterNet().eval()
    torch.save({f"module.{k}": v for k, v in tm.state_dict().items()},
               os.path.join(str(tmp_path), "model_30.pth"))

    agent = HybridAgent(str(tmp_path))
    assert agent.model_count == 1
    assert agent.config.model.gpt.reference_view_unpack
    # imported weights actually landed: a known torch tensor matches
    got = np.asarray(
        agent._stacked["params"]["wp_gru"]["output"]["kernel"])[0]
    want = tm.output.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)
