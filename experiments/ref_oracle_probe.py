"""Bisect the fp64 mismatch between the real reference model and the JAX
model, stage by stage."""

import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/team_code_transfuser"
sys.path.insert(0, os.path.join(REPO, "tests", "ref_oracle"))
sys.path.insert(0, REF)
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

import model as ref_model  # noqa: E402
import config as ref_config  # noqa: E402
import dataclasses  # noqa: E402

from transfuser_tpu.config import GlobalConfig  # noqa: E402
from transfuser_tpu.models.lidar_centernet import LidarCenterNet  # noqa: E402
from transfuser_tpu.train.torch_import import (  # noqa: E402
    convert_lidar_centernet_statedict)
from transfuser_tpu.ops.image_ops import (  # noqa: E402
    adaptive_avg_pool, normalize_imagenet, resize_bilinear)

torch.manual_seed(3)
rcfg = ref_config.GlobalConfig(setting="eval")
rcfg.n_layer = 4  # train.py:56,120: checkpoints are trained with 4
net = ref_model.LidarCenterNet(rcfg, "cpu", "transFuser", "regnety_032",
                               "regnety_032", use_velocity=False).eval()
with torch.no_grad():
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.7, 1.4)
    for i in range(4):
        getattr(net._model, f"transformer{i + 1}").pos_emb.uniform_(-0.05,
                                                                    0.05)
net = net.double()

cfg = GlobalConfig()
gpt = dataclasses.replace(cfg.model.gpt, reference_view_unpack=True)
model_cfg = dataclasses.replace(cfg.model, gpt=gpt,
                                use_target_point_image=False)
cfg = cfg.replace(model=model_cfg)

state = {k: v for k, v in net.state_dict().items()}
variables = convert_lidar_centernet_statedict(state, cfg)
variables = jax.tree.map(lambda a: np.asarray(a, np.float64), variables)

rng = np.random.default_rng(1234)
rgb = rng.uniform(0, 255, (1, 160, 704, 3)).astype(np.float64)
lidar = (rng.uniform(0, 5, (1, 256, 256, 2)) *
         (rng.uniform(0, 1, (1, 256, 256, 2)) > 0.7)).astype(np.float64)
vel = rng.uniform(0, 8, (1, 1)).astype(np.float64)

fm = LidarCenterNet(cfg, dtype=jnp.float64)
bound = fm.bind(variables)
bb = bound._backbone

rgb_t = torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2)))
lid_t = torch.from_numpy(np.transpose(lidar, (0, 3, 1, 2)))
vel_t = torch.from_numpy(vel)

tf = net._model  # reference TransfuserBackbone
import transfuser as ref_tf  # noqa: E402


def diff(name, jax_nhwc, torch_nchw):
    a = np.asarray(jax_nhwc)
    b = torch_nchw.detach().numpy()
    if b.ndim == 4:
        b = np.transpose(b, (0, 2, 3, 1))
    d = np.abs(a - b)
    print(f"{name:32s} max|d|={d.max():.3e}  rel={d.max()/max(1e-12, np.abs(b).max()):.3e}")


with torch.no_grad():
    # ---- stems
    timg = ref_tf.normalize_imagenet(rgb_t)
    timg = tf.image_encoder.features.conv1(timg)
    timg = tf.image_encoder.features.bn1(timg)
    timg = tf.image_encoder.features.act1(timg)
    timg = tf.image_encoder.features.maxpool(timg)
    tlid = tf.lidar_encoder._model.conv1(lid_t)
    tlid = tf.lidar_encoder._model.bn1(tlid)
    tlid = tf.lidar_encoder._model.act1(tlid)
    tlid = tf.lidar_encoder._model.maxpool(tlid)

    jimg = normalize_imagenet(jnp.asarray(rgb))
    jlid = jnp.asarray(lidar)
    jimg = bb.image_encoder.stem(jimg, False)
    jlid = bb.lidar_encoder.stem(jlid, False)
    diff("stem img", jimg, timg)
    diff("stem lidar", jlid, tlid)

    g = cfg.model.gpt
    for i in range(4):
        timg = getattr(tf.image_encoder.features, f"layer{i + 1}")(timg)
        tlid = getattr(tf.lidar_encoder._model, f"layer{i + 1}")(tlid)
        jimg = bb.image_encoder.stage(i, jimg, False)
        jlid = bb.lidar_encoder.stage(i, jlid, False)
        diff(f"stage{i + 1} img", jimg, timg)
        diff(f"stage{i + 1} lidar", jlid, tlid)

        t_ie = tf.avgpool_img(timg)
        t_le = tf.avgpool_lidar(tlid)
        j_ie = adaptive_avg_pool(jimg, (g.img_vert_anchors,
                                        g.img_horz_anchors))
        j_le = adaptive_avg_pool(jlid, (g.lidar_vert_anchors,
                                        g.lidar_horz_anchors))
        diff(f"pool{i + 1} img", j_ie, t_ie)
        diff(f"pool{i + 1} lidar", j_le, t_le)

        t_io, t_lo = getattr(tf, f"transformer{i + 1}")(t_ie, t_le, vel_t)
        j_io, j_lo = bb.transformers[i](j_ie, j_le, jnp.asarray(vel), False)
        diff(f"gpt{i + 1} img", j_io, t_io)
        diff(f"gpt{i + 1} lidar", j_lo, t_lo)

        t_iu = torch.nn.functional.interpolate(
            t_io, size=(timg.shape[2], timg.shape[3]), mode="bilinear",
            align_corners=False)
        t_lu = torch.nn.functional.interpolate(
            t_lo, size=(tlid.shape[2], tlid.shape[3]), mode="bilinear",
            align_corners=False)
        j_iu = resize_bilinear(j_io, jimg.shape[1:3])
        j_lu = resize_bilinear(j_lo, jlid.shape[1:3])
        diff(f"up{i + 1} img", j_iu, t_iu)
        diff(f"up{i + 1} lidar", j_lu, t_lu)

        timg = timg + t_iu
        tlid = tlid + t_lu
        jimg = jimg + j_iu
        jlid = jlid + j_lu

    timg = tf.change_channel_conv_image(timg)
    tlid = tf.change_channel_conv_lidar(tlid)
    jimg = bb.change_channel_conv_image(jimg)
    jlid = bb.change_channel_conv_lidar(jlid)
    diff("change_channel img", jimg, timg)
    diff("change_channel lidar", jlid, tlid)
