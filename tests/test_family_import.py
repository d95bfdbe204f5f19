"""Reference-checkpoint import parity for the non-flagship families:
late fusion, latent TF, geometric fusion (backbone level; the shared
head/GRU/decoder conversion is covered by test_full_import).

Each test builds a torch replica with the reference's module names and
forward semantics (late_fusion.py / latentTF.py / geometric_fusion.py),
converts its state dict, and asserts fp32 output parity — for geometric
fusion including the x-major correspondence-grid raw view, which golden-
tests the geometric_reference_view flag."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from helpers import tiny_config
from test_full_import import (FEATS, CH, IMG_ANCH, LID_ANCH, N_HEAD,
                              N_LAYER, TorchGPT, _run_stage,
                              normalize_imagenet)
from test_regnet_import import TorchRegNetY
from transfuser_tpu.models.geometric_fusion import GeometricFusionBackbone
from transfuser_tpu.models.late_fusion import LateFusionBackbone
from transfuser_tpu.models.latent_tf import LatentTFBackbone
from transfuser_tpu.train.torch_import import (
    convert_geometric_fusion_backbone_statedict,
    convert_late_fusion_backbone_statedict,
    convert_latent_tf_backbone_statedict)

DEPTHS, WIDTHS, GW = (1, 2, 1, 1), (24, 48, 96, 192), 24


def _cfg(backbone):
    cfg = tiny_config(backbone)
    gpt = dataclasses.replace(
        cfg.model.gpt, n_layer=N_LAYER, n_head=N_HEAD,
        img_vert_anchors=IMG_ANCH[0], img_horz_anchors=IMG_ANCH[1],
        lidar_vert_anchors=LID_ANCH[0], lidar_horz_anchors=LID_ANCH[1],
        reference_view_unpack=True)
    model = dataclasses.replace(
        cfg.model, image_architecture="regnety_micro",
        lidar_architecture="regnety_micro", gpt=gpt, use_velocity=True)
    return cfg.replace(model=model)


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.7, 1.3)
                mod.bias.uniform_(-0.3, 0.3)


def _inputs(rng, batch=2):
    rgb = rng.uniform(0, 255, (batch, 64, 128, 3)).astype(np.float32)
    lidar = rng.uniform(0, 1, (batch, 64, 64, 3)).astype(np.float32)
    vel = rng.uniform(0, 10, (batch, 1)).astype(np.float32)
    return rgb, lidar, vel


def _assert_outputs_match(got, want, atol=1e-4):
    pyr_g, grid_g, fused_g = got
    pyr_w, grid_w, fused_w = want
    for a, b in zip(pyr_g, pyr_w):
        np.testing.assert_allclose(
            np.asarray(a), np.transpose(b.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=atol)
    np.testing.assert_allclose(
        np.asarray(grid_g), np.transpose(grid_w.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(fused_g), fused_w.numpy(),
                               rtol=1e-3, atol=atol)


def _top_down(m, x):
    up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                 align_corners=False)
    p5 = F.relu(m.c5_conv(x))
    p4 = F.relu(m.up_conv5(up(p5)))
    p3 = F.relu(m.up_conv4(up(p4)))
    p2 = F.relu(m.up_conv3(up(p3)))
    return p2, p3, p4, p5


# ------------------------------------------------------------- late fusion

class TorchLateFusion(tnn.Module):
    # late_fusion.py:5-111
    def __init__(self):
        super().__init__()
        self.image_encoder = tnn.Module()
        self.image_encoder.features = TorchRegNetY(DEPTHS, WIDTHS, GW)
        self.lidar_encoder = tnn.Module()
        self.lidar_encoder._model = TorchRegNetY(DEPTHS, WIDTHS, GW)
        self.reduce_channels_conv_image = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.reduce_channels_conv_lidar = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.vel_emb = tnn.Linear(1, FEATS)
        self.up_conv5 = tnn.Conv2d(CH, CH, 1)
        self.up_conv4 = tnn.Conv2d(CH, CH, 1)
        self.up_conv3 = tnn.Conv2d(CH, CH, 1)
        self.c5_conv = tnn.Conv2d(FEATS, CH, 1)

    def forward(self, image, lidar, velocity):
        img = self.image_encoder.features(normalize_imagenet(image))
        img = self.reduce_channels_conv_image(img)
        grid = img
        img_vec = img.mean((2, 3))
        lid = self.lidar_encoder._model(lidar)
        lid = self.reduce_channels_conv_lidar(lid)
        pyr = _top_down(self, lid)
        lid_vec = lid.mean((2, 3))
        fused = img_vec + lid_vec + self.vel_emb(velocity)
        return pyr, grid, fused


def test_late_fusion_import_parity():
    rng = np.random.default_rng(11)
    torch.manual_seed(4)
    tm = TorchLateFusion().eval()
    _randomize_bn(tm)

    cfg = _cfg("late_fusion")
    params, stats = convert_late_fusion_backbone_statedict(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        "regnety_micro", "regnety_micro")
    fm = LateFusionBackbone(cfg, lidar_in_channels=3, dtype=jnp.float32)

    rgb, lidar, vel = _inputs(rng)
    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(vel),
                   train=False)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(lidar, (0, 3, 1, 2))),
                  torch.from_numpy(vel))
    _assert_outputs_match(got, want)


# --------------------------------------------------------------- latent TF

class TorchLatentTF(tnn.Module):
    # latentTF.py:8-218 — module names identical to TransfuserBackbone;
    # the agent substitutes the positional grid for the lidar input.
    def __init__(self):
        super().__init__()
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
        self.avgpool_img = tnn.AdaptiveAvgPool2d(IMG_ANCH)
        self.avgpool_lidar = tnn.AdaptiveAvgPool2d(LID_ANCH)

    def forward(self, image, lidar, velocity):
        im = self.image_encoder.features
        li = self.lidar_encoder._model
        x_img = normalize_imagenet(image)
        x_img = torch.relu(im.stem.bn(im.stem.conv(x_img)))
        x_lid = torch.relu(li.stem.bn(li.stem.conv(lidar)))
        for i in range(4):
            x_img = _run_stage(im, i, x_img)
            x_lid = _run_stage(li, i, x_lid)
            ie = self.avgpool_img(x_img)
            le = self.avgpool_lidar(x_lid)
            io_, lo = getattr(self, f"transformer{i + 1}")(ie, le,
                                                           velocity)
            x_img = x_img + F.interpolate(
                io_, size=x_img.shape[2:4], mode="bilinear",
                align_corners=False)
            x_lid = x_lid + F.interpolate(
                lo, size=x_lid.shape[2:4], mode="bilinear",
                align_corners=False)
        x_img = self.change_channel_conv_image(x_img)
        x_lid = self.change_channel_conv_lidar(x_lid)
        fused = x_img.mean((2, 3)) + x_lid.mean((2, 3))
        return _top_down(self, x_lid), x_img, fused


def test_latent_tf_import_parity():
    rng = np.random.default_rng(12)
    torch.manual_seed(5)
    tm = TorchLatentTF().eval()
    _randomize_bn(tm)
    with torch.no_grad():
        for i in range(4):
            getattr(tm, f"transformer{i + 1}").pos_emb.uniform_(-0.1, 0.1)

    cfg = _cfg("latentTF")
    params, stats = convert_latent_tf_backbone_statedict(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        "regnety_micro", "regnety_micro")
    fm = LatentTFBackbone(cfg, lidar_in_channels=3, dtype=jnp.float32)

    rgb, lidar, vel = _inputs(rng)
    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(vel),
                   train=False)
    # the torch side receives the SAME substituted input our module
    # builds internally: [positional grid, extra channels]
    from transfuser_tpu.models.latent_tf import positional_grid
    grid = np.asarray(positional_grid(64, 64))
    lid_sub = np.concatenate(
        [np.broadcast_to(grid[None], (2, 64, 64, 2)), lidar[..., 2:]],
        axis=-1)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(lid_sub, (0, 3, 1, 2))),
                  torch.from_numpy(vel))
    _assert_outputs_match(got, want)


# -------------------------------------------------------- geometric fusion

class TorchGeometric(tnn.Module):
    # geometric_fusion.py:6-196 (n_scale=4, 5 samples/cell); consumes
    # the x-major correspondence grids with the raw (h, w) view.
    def __init__(self, n_embd=64):
        super().__init__()
        self.image_encoder = tnn.Module()
        self.image_encoder.features = TorchRegNetY(DEPTHS, WIDTHS, GW)
        self.lidar_encoder = tnn.Module()
        self.lidar_encoder._model = TorchRegNetY(DEPTHS, WIDTHS, GW)
        for i, w in enumerate(WIDTHS):
            setattr(self, f"image_conv{i + 1}", tnn.Conv2d(w, n_embd, 1))
            setattr(self, f"image_deconv{i + 1}", tnn.Conv2d(n_embd, w, 1))
            setattr(self, f"lidar_conv{i + 1}", tnn.Conv2d(w, n_embd, 1))
            setattr(self, f"lidar_deconv{i + 1}", tnn.Conv2d(n_embd, w, 1))
            setattr(self, f"vel_emb{i + 1}", tnn.Linear(1, w))
            mlp = lambda: tnn.Sequential(
                tnn.Linear(n_embd, n_embd), tnn.ReLU(True),
                tnn.Linear(n_embd, n_embd), tnn.ReLU(True),
                tnn.Linear(n_embd, n_embd), tnn.ReLU(True))
            setattr(self, f"image_projection{i + 1}", mlp())
            setattr(self, f"lidar_projection{i + 1}", mlp())
        self.change_channel_conv_image = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.change_channel_conv_lidar = tnn.Conv2d(WIDTHS[-1], FEATS, 1)
        self.up_conv5 = tnn.Conv2d(CH, CH, 1)
        self.up_conv4 = tnn.Conv2d(CH, CH, 1)
        self.up_conv3 = tnn.Conv2d(CH, CH, 1)
        self.c5_conv = tnn.Conv2d(FEATS, CH, 1)
        self.avgpool_img = tnn.AdaptiveAvgPool2d(IMG_ANCH)
        self.avgpool_lidar = tnn.AdaptiveAvgPool2d(LID_ANCH)

    @staticmethod
    def _gather(embd, points, out_hw):
        # geometric_fusion.py:134-137: the raw buffer is viewed with the
        # TARGET feature map's (h, w) — the x-major data layout makes
        # this a spatial scramble; (x, y) pixel index, summed over the
        # 5 sampled correspondences
        bz = embd.shape[0]
        h, w = out_hw
        pts = points.reshape(bz, h * w * 5, 2)
        feat = embd.permute(0, 2, 3, 1)
        out = []
        for b in range(bz):
            g = feat[b][pts[b, :, 1], pts[b, :, 0]]
            out.append(g.view(h, w, 5, -1).sum(2))
        return torch.stack(out)

    def forward(self, image, lidar, velocity, bev_points, cam_points):
        im = self.image_encoder.features
        li = self.lidar_encoder._model
        x_img = normalize_imagenet(image)
        x_img = torch.relu(im.stem.bn(im.stem.conv(x_img)))
        x_lid = torch.relu(li.stem.bn(li.stem.conv(lidar)))
        for i in range(4):
            x_img = _run_stage(im, i, x_img)
            x_lid = _run_stage(li, i, x_lid)
            ie = self.avgpool_img(getattr(self, f"image_conv{i + 1}")(x_img))
            le = self.avgpool_lidar(getattr(self, f"lidar_conv{i + 1}")(x_lid))
            vel = getattr(self, f"vel_emb{i + 1}")(velocity)[..., None, None]

            bev = self._gather(ie, bev_points, LID_ANCH)
            bev = getattr(self, f"image_projection{i + 1}")(bev)
            bev = bev.permute(0, 3, 1, 2)
            bev = F.interpolate(bev, size=x_lid.shape[2:4],
                                mode="bilinear", align_corners=False)
            x_lid = x_lid + getattr(self, f"lidar_deconv{i + 1}")(bev) + vel

            img = self._gather(le, cam_points, IMG_ANCH)
            img = getattr(self, f"lidar_projection{i + 1}")(img)
            img = img.permute(0, 3, 1, 2)
            img = F.interpolate(img, size=x_img.shape[2:4],
                                mode="bilinear", align_corners=False)
            x_img = (x_img + getattr(self, f"image_deconv{i + 1}")(img)
                     + vel)
        x_img = self.change_channel_conv_image(x_img)
        x_lid = self.change_channel_conv_lidar(x_lid)
        fused = x_img.mean((2, 3)) + x_lid.mean((2, 3))
        return _top_down(self, x_lid), x_img, fused


def test_geometric_fusion_import_parity():
    """Also the golden test for geometric_reference_view: the torch side
    consumes x-major grids via the raw view; our side gets the clean
    (h, w) grids with the flag on."""
    rng = np.random.default_rng(13)
    torch.manual_seed(6)
    tm = TorchGeometric().eval()
    _randomize_bn(tm)

    cfg = _cfg("geometric_fusion")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, geometric_reference_view=True,
        gpt=dataclasses.replace(cfg.model.gpt, n_embd=64)))
    params, stats = convert_geometric_fusion_backbone_statedict(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        "regnety_micro", "regnety_micro")
    fm = GeometricFusionBackbone(cfg, lidar_in_channels=3,
                                 dtype=jnp.float32)

    rgb, lidar, vel = _inputs(rng)
    # clean (h, w)-indexed grids at the anchor resolutions
    bev_clean = rng.integers(0, 4, (2, LID_ANCH[0], LID_ANCH[1], 5, 2)) \
        .astype(np.int32)
    bev_clean[..., 0] %= IMG_ANCH[1]  # x into image grid
    bev_clean[..., 1] %= IMG_ANCH[0]  # y into image grid
    cam_clean = rng.integers(0, 2, (2, IMG_ANCH[0], IMG_ANCH[1], 5, 2)) \
        .astype(np.int32)

    got = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(vel),
                   bev_points=jnp.asarray(bev_clean),
                   cam_points=jnp.asarray(cam_clean), train=False)

    # the torch/reference side receives the x-major layout the reference
    # data pipeline writes (data.py:636-637)
    def xmajor(clean):
        return np.ascontiguousarray(np.transpose(clean, (0, 2, 1, 3, 4)))
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                  torch.from_numpy(np.transpose(lidar, (0, 3, 1, 2))),
                  torch.from_numpy(vel),
                  torch.from_numpy(xmajor(bev_clean)).long(),
                  torch.from_numpy(xmajor(cam_clean)).long())
    _assert_outputs_match(got, want)
