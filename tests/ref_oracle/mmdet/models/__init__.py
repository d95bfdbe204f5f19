"""mmdet.models shim: HEADS registry + build_loss + losses.

Loss semantics replicate public mmdet 2.25
(mmdet/models/losses/{gaussian_focal_loss,smooth_l1_loss,cross_entropy_loss}.py
and utils.weight_reduce_loss): elementwise loss * weight, then
``sum() / avg_factor`` when avg_factor is given with 'mean' reduction.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _Registry:
    def __init__(self):
        self._modules = {}

    def register_module(self, name=None, force=False, module=None):
        def _register(cls):
            self._modules[name or cls.__name__] = cls
            return cls
        if module is not None:
            return _register(module)
        return _register

    def get(self, key):
        return self._modules.get(key)


HEADS = _Registry()


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss
    if reduction == "mean":
        return loss.sum() / avg_factor
    if reduction != "none":
        raise ValueError("avg_factor can only be used with reduction='mean'")
    return loss


class GaussianFocalLoss(nn.Module):
    """mmdet GaussianFocalLoss (CornerNet focal), alpha=2, gamma=4."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction="mean",
                 loss_weight=1.0):
        super().__init__()
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None):
        eps = 1e-12
        pos_weights = target.eq(1)
        neg_weights = (1 - target).pow(self.gamma)
        pos_loss = -(pred + eps).log() * (1 - pred).pow(self.alpha) \
            * pos_weights
        neg_loss = -(1 - pred + eps).log() * pred.pow(self.alpha) \
            * neg_weights
        loss = pos_loss + neg_loss
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


class L1Loss(nn.Module):
    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None):
        loss = torch.abs(pred - target)
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


class SmoothL1Loss(nn.Module):
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None,
                reduction_override=None):
        diff = torch.abs(pred - target)
        loss = torch.where(diff < self.beta,
                           0.5 * diff * diff / self.beta,
                           diff - 0.5 * self.beta)
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


class CrossEntropyLoss(nn.Module):
    """mmdet CrossEntropyLoss (use_sigmoid=False path).

    F.cross_entropy(pred, label, reduction='none') then
    weight_reduce_loss — including mmdet's raw elementwise multiply of
    the (B,H,W) loss map by the caller-supplied weight tensor, whatever
    its shape broadcasts to (the reference passes (B,1,H,W), which torch
    broadcasts to (B,B,H,W) before the sum; the shim must preserve that
    behavior bit-for-bit, not "fix" it).
    """

    def __init__(self, use_sigmoid=False, use_mask=False, reduction="mean",
                 class_weight=None, loss_weight=1.0):
        super().__init__()
        assert not use_sigmoid and not use_mask
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight

    def forward(self, cls_score, label, weight=None, avg_factor=None,
                reduction_override=None):
        loss = F.cross_entropy(cls_score, label, reduction="none")
        if weight is not None:
            weight = weight.float()
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


_LOSSES = {
    "GaussianFocalLoss": GaussianFocalLoss,
    "L1Loss": L1Loss,
    "SmoothL1Loss": SmoothL1Loss,
    "CrossEntropyLoss": CrossEntropyLoss,
}


def build_loss(cfg):
    cfg = dict(cfg)
    loss_type = cfg.pop("type")
    return _LOSSES[loss_type](**cfg)
