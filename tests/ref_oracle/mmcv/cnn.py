"""mmcv.cnn init helpers (public mmcv 1.5.3 semantics)."""

import math

import torch.nn as nn


def bias_init_with_prob(prior_prob):
    """Bias so that sigmoid(bias) == prior_prob."""
    return float(-math.log((1 - prior_prob) / prior_prob))


def normal_init(module, mean=0.0, std=1.0, bias=0.0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)
