"""torch_scatter shim in pure torch (scatter_max / scatter_mean).

Matches the public torch_scatter semantics the reference point_pillar.py
uses: out size inferred from index max (or dim_size), empty buckets get 0
(scatter_mean) / 0 with arg -1 semantics unused by the reference
(scatter_max only consumes the values, point_pillar.py:32,61).
"""

import torch


def _out_size(src, index, dim, dim_size):
    size = list(src.shape)
    size[dim] = int(index.max().item()) + 1 if dim_size is None else dim_size
    return size


def _broadcast(index, src, dim):
    if index.dim() == 1:
        shape = [1] * src.dim()
        shape[dim] = -1
        index = index.view(shape)
    return index.expand_as(src)


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    size = _out_size(src, index, dim, dim_size)
    idx = _broadcast(index, src, dim)
    base = src.new_full(size, float("-inf"))
    result = base.scatter_reduce(dim, idx, src, reduce="amax",
                                 include_self=True)
    arg = torch.zeros(size, dtype=torch.long, device=src.device)
    result = torch.where(torch.isinf(result) & (result < 0),
                         torch.zeros_like(result), result)
    return result, arg


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    size = _out_size(src, index, dim, dim_size)
    idx = _broadcast(index, src, dim)
    total = src.new_zeros(size).scatter_reduce(dim, idx, src, reduce="sum",
                                               include_self=True)
    ones = torch.ones_like(src)
    count = src.new_zeros(size).scatter_reduce(dim, idx, ones, reduce="sum",
                                               include_self=True)
    return total / count.clamp(min=1)
