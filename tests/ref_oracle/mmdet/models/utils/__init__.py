"""mmdet.models.utils shim: gaussian target helpers (public mmdet 2.25
mmdet/models/utils/gaussian_target.py semantics)."""

from .gaussian_target import (gaussian_radius, gen_gaussian_target,
                              get_local_maximum, get_topk_from_heatmap,
                              transpose_and_gather_feat)

__all__ = ["gaussian_radius", "gen_gaussian_target", "get_local_maximum",
           "get_topk_from_heatmap", "transpose_and_gather_feat"]
