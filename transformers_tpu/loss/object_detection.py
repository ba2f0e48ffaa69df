"""DETR detection loss: Hungarian matching + CE / L1 / GIoU.

Reference parity: src/transformers/loss/loss_for_object_detection.py
(HungarianMatcher :176, ImageLoss :254, ForObjectDetectionLoss :536).
The bipartite matching runs on HOST (scipy linear_sum_assignment over the
cost matrix pulled to numpy — matching is not differentiable anyway); the
losses themselves are jnp so gradients flow to logits/boxes. The loss path is
therefore eager (not jittable end-to-end), matching how detection training
actually treats the matcher.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def center_to_corners(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1, boxes2):
    """[N,4] x [M,4] xyxy -> iou [N,M], union [N,M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1, boxes2):
    """GIoU [N,M] (reference :88)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def hungarian_match(logits, pred_boxes, targets, class_cost, bbox_cost, giou_cost):
    """Per-image bipartite assignment (reference HungarianMatcher.forward)."""
    from scipy.optimize import linear_sum_assignment

    indices = []
    for i, target in enumerate(targets):
        tgt_ids = np.asarray(target["class_labels"])
        tgt_boxes = jnp.asarray(target["boxes"], jnp.float32)
        if len(tgt_ids) == 0:
            indices.append((np.array([], np.int64), np.array([], np.int64)))
            continue
        prob = jax.nn.softmax(logits[i].astype(jnp.float32), axis=-1)  # [Q, C+1]
        cost_class = -prob[:, tgt_ids]
        cost_bbox = jnp.sum(jnp.abs(pred_boxes[i][:, None, :] - tgt_boxes[None, :, :]), axis=-1)
        cost_giou = -generalized_box_iou(center_to_corners(pred_boxes[i]),
                                         center_to_corners(tgt_boxes))
        cost = bbox_cost * cost_bbox + class_cost * cost_class + giou_cost * cost_giou
        row, col = linear_sum_assignment(np.asarray(cost))
        indices.append((row.astype(np.int64), col.astype(np.int64)))
    return indices


def detr_loss(logits, pred_boxes, targets, config) -> tuple[jnp.ndarray, dict]:
    """Weighted CE (+eos down-weight) + L1 + GIoU, normalized by the number
    of target boxes (reference ImageLoss + ForObjectDetectionLoss)."""
    indices = hungarian_match(logits, pred_boxes, targets,
                              config.class_cost, config.bbox_cost, config.giou_cost)
    b, q, num_classes_p1 = logits.shape
    no_object = num_classes_p1 - 1
    num_boxes = max(sum(len(t["class_labels"]) for t in targets), 1)

    # --- classification: every query gets a label (no-object by default)
    target_classes = np.full((b, q), no_object, np.int64)
    for i, (row, col) in enumerate(indices):
        cls = np.asarray(targets[i]["class_labels"])
        target_classes[i, row] = cls[col]
    weights = jnp.ones((num_classes_p1,), jnp.float32).at[no_object].set(config.eos_coefficient)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.asarray(target_classes)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    w = weights[tgt]
    loss_ce = -(picked * w).sum() / w.sum()

    # --- boxes: only matched queries
    src_boxes = []
    tgt_boxes = []
    for i, (row, col) in enumerate(indices):
        if len(row):
            src_boxes.append(pred_boxes[i][jnp.asarray(row)])
            tgt_boxes.append(jnp.asarray(np.asarray(targets[i]["boxes"])[col], jnp.float32))
    if src_boxes:
        src = jnp.concatenate(src_boxes).astype(jnp.float32)
        tgt_b = jnp.concatenate(tgt_boxes)
        loss_bbox = jnp.abs(src - tgt_b).sum() / num_boxes
        giou = generalized_box_iou(center_to_corners(src), center_to_corners(tgt_b))
        loss_giou = (1.0 - jnp.diagonal(giou)).sum() / num_boxes
    else:
        loss_bbox = jnp.asarray(0.0)
        loss_giou = jnp.asarray(0.0)

    # --- cardinality (reporting only, not weighted; reference loss_cardinality)
    pred_counts = (jnp.argmax(logits, axis=-1) != no_object).sum(-1)
    tgt_counts = jnp.asarray([len(t["class_labels"]) for t in targets])
    cardinality_error = jnp.abs(pred_counts - tgt_counts).astype(jnp.float32).mean()

    loss_dict = {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou,
                 "cardinality_error": cardinality_error}
    total = (loss_ce + config.bbox_loss_coefficient * loss_bbox
             + config.giou_loss_coefficient * loss_giou)
    return total, loss_dict


def _sigmoid_focal_match(logits, pred_boxes, targets, class_cost, bbox_cost,
                         giou_cost, alpha=0.25, gamma=2.0):
    """Deformable-DETR matcher: focal-style class cost over sigmoid probs
    (reference loss_for_object_detection.py DeformableDetrHungarianMatcher)."""
    from scipy.optimize import linear_sum_assignment

    indices = []
    for i, target in enumerate(targets):
        tgt_ids = np.asarray(target["class_labels"])
        tgt_boxes = jnp.asarray(target["boxes"], jnp.float32)
        if len(tgt_ids) == 0:
            indices.append((np.array([], np.int64), np.array([], np.int64)))
            continue
        prob = jax.nn.sigmoid(logits[i].astype(jnp.float32))  # [Q, C]
        neg = (1 - alpha) * prob**gamma * (-jnp.log(jnp.clip(1 - prob, 1e-8)))
        pos = alpha * (1 - prob) ** gamma * (-jnp.log(jnp.clip(prob, 1e-8)))
        cost_class = pos[:, tgt_ids] - neg[:, tgt_ids]
        cost_bbox = jnp.sum(jnp.abs(pred_boxes[i][:, None, :] - tgt_boxes[None, :, :]), axis=-1)
        cost_giou = -generalized_box_iou(center_to_corners(pred_boxes[i]),
                                         center_to_corners(tgt_boxes))
        cost = bbox_cost * cost_bbox + class_cost * cost_class + giou_cost * cost_giou
        row, col = linear_sum_assignment(np.asarray(cost))
        indices.append((row.astype(np.int64), col.astype(np.int64)))
    return indices


def _deformable_level_loss(logits, pred_boxes, targets, config):
    indices = _sigmoid_focal_match(logits, pred_boxes, targets,
                                   config.class_cost, config.bbox_cost,
                                   config.giou_cost, alpha=config.focal_alpha)
    b, q, num_classes = logits.shape
    num_boxes = max(sum(len(t["class_labels"]) for t in targets), 1)

    # --- classification: sigmoid focal loss over one-hot targets
    target_classes = np.full((b, q), num_classes, np.int64)
    for i, (row, col) in enumerate(indices):
        cls = np.asarray(targets[i]["class_labels"])
        target_classes[i, row] = cls[col]
    onehot = jax.nn.one_hot(jnp.asarray(target_classes), num_classes + 1)[..., :-1]
    logits32 = logits.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits32)
    ce = jnp.maximum(logits32, 0) - logits32 * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits32)))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    focal = ce * ((1 - p_t) ** 2.0)
    alpha_t = config.focal_alpha * onehot + (1 - config.focal_alpha) * (1 - onehot)
    loss_ce = (alpha_t * focal).mean(1).sum() / num_boxes * q

    # --- boxes on matched queries
    src_boxes, tgt_boxes = [], []
    for i, (row, col) in enumerate(indices):
        if len(row):
            src_boxes.append(pred_boxes[i][jnp.asarray(row)])
            tgt_boxes.append(jnp.asarray(np.asarray(targets[i]["boxes"])[col], jnp.float32))
    if src_boxes:
        src = jnp.concatenate(src_boxes).astype(jnp.float32)
        tgt_b = jnp.concatenate(tgt_boxes)
        loss_bbox = jnp.abs(src - tgt_b).sum() / num_boxes
        giou = generalized_box_iou(center_to_corners(src), center_to_corners(tgt_b))
        loss_giou = (1.0 - jnp.diagonal(giou)).sum() / num_boxes
    else:
        loss_bbox = jnp.asarray(0.0)
        loss_giou = jnp.asarray(0.0)
    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def deformable_detr_loss(outputs_classes, outputs_coords, targets, config) -> tuple[Any, dict, Any]:
    """Focal class loss + L1 + GIoU summed over decoder levels when
    ``auxiliary_loss`` (reference DeformableDetrForObjectDetectionLoss :576)."""
    levels = range(outputs_classes.shape[0]) if config.auxiliary_loss \
        else [outputs_classes.shape[0] - 1]
    loss_dict = {}
    total = jnp.asarray(0.0)
    aux = []
    for lvl in levels:
        d = _deformable_level_loss(outputs_classes[lvl], outputs_coords[lvl],
                                   targets, config)
        total = total + (d["loss_ce"] + config.bbox_loss_coefficient * d["loss_bbox"]
                         + config.giou_loss_coefficient * d["loss_giou"])
        suffix = "" if lvl == outputs_classes.shape[0] - 1 else f"_{lvl}"
        for k, v in d.items():
            loss_dict[k + suffix] = v
        if suffix:
            aux.append({"logits": outputs_classes[lvl], "pred_boxes": outputs_coords[lvl]})
    return total, loss_dict, aux or None
