"""mmcv.ops.batched_nms shim (pure torch).

Only reachable through LidarCenterNetHead._bboxes_nms (model.py:499-514),
which the reference never calls on its forward paths (get_bboxes defaults
with_nms=False); implemented anyway as a plain greedy axis-aligned NMS
with the class-offset trick mmcv uses.
"""

import torch


def _nms(boxes, scores, iou_threshold):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = ((boxes[rest, 2] - boxes[rest, 0])
                  * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / (area_i + area_r - inter).clamp(min=1e-9)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long, device=boxes.device)


def batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    iou_threshold = 0.5
    if isinstance(nms_cfg, dict):
        iou_threshold = nms_cfg.get("iou_threshold", 0.5)
    if class_agnostic or boxes.numel() == 0:
        keep = _nms(boxes, scores, iou_threshold)
    else:
        max_coordinate = boxes.max() if boxes.numel() else 0
        offsets = idxs.to(boxes) * (max_coordinate + 1)
        keep = _nms(boxes + offsets[:, None], scores, iou_threshold)
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=-1)
    return dets, keep
