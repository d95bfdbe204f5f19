"""Shared tiny-config helpers for fast CPU tests."""

import dataclasses

import jax.numpy as jnp

from transfuser_tpu.config import (BevConfig, GlobalConfig, SensorConfig,
                                   TrainConfig)


def tiny_config(backbone: str = "transFuser", **model_overrides) -> GlobalConfig:
    """Small-shape config: 64x128 images, 64x64 lidar, micro trunks."""
    cfg = GlobalConfig()
    sensors = dataclasses.replace(
        cfg.sensors, img_resolution=(64, 128),
        lidar_resolution_width=64, lidar_resolution_height=64)
    bev = dataclasses.replace(
        cfg.bev, bev_resolution_width=40, bev_resolution_height=40)
    gpt = dataclasses.replace(cfg.model.gpt, n_layer=1)
    model = dataclasses.replace(
        cfg.model, backbone=backbone, image_architecture="resnet_micro",
        lidar_architecture="resnet_micro", gpt=gpt,
        perception_output_features=128,
        deconv_channel_num_1=32, deconv_channel_num_2=16,
        deconv_channel_num_3=8, **model_overrides)
    train = dataclasses.replace(cfg.train, batch_size=2,
                                compute_dtype="float32")
    return cfg.replace(sensors=sensors, bev=bev, model=model, train=train)
