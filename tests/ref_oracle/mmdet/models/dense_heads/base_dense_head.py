"""BaseDenseHead shim: the reference only uses it as an nn.Module base
(model.py:33,68 passes init_cfg=None through)."""

import torch.nn as nn


class BaseDenseHead(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg
