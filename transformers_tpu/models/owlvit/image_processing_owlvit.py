"""OWL-ViT image processor + box post-processing (reference
models/owlvit/image_processing_owlvit.py): 768x768 square warp, CLIP
statistics; ``post_process_object_detection`` converts cxcywh logits to
absolute xyxy boxes."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BaseImageProcessor,
)


def _cxcywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


class OwlViTImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 768, "width": 768})
        kwargs.setdefault("resample", "bicubic")
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)

    def post_process_object_detection(self, outputs, threshold: float = 0.1,
                                      target_sizes=None):
        """reference post_process_object_detection: sigmoid class logits ->
        scores, cxcywh -> absolute xyxy."""
        logits = np.asarray(outputs.logits)
        boxes = _cxcywh_to_xyxy(np.asarray(outputs.pred_boxes))
        probs = 1 / (1 + np.exp(-logits))
        scores = probs.max(-1)
        labels = probs.argmax(-1)
        results = []
        for i in range(logits.shape[0]):
            b = boxes[i]
            if target_sizes is not None:
                h, w = target_sizes[i]
                b = b * np.array([w, h, w, h], b.dtype)
            keep = scores[i] > threshold
            results.append({"scores": scores[i][keep], "labels": labels[i][keep],
                            "boxes": b[keep]})
        return results

    def post_process_image_guided_detection(self, outputs, threshold: float = 0.0,
                                            target_sizes=None):
        boxes = _cxcywh_to_xyxy(np.asarray(outputs.target_pred_boxes))
        logits = np.asarray(outputs.logits)
        probs = 1 / (1 + np.exp(-logits))
        scores = probs.max(-1)
        results = []
        for i in range(scores.shape[0]):
            b = boxes[i]
            if target_sizes is not None:
                h, w = target_sizes[i]
                b = b * np.array([w, h, w, h], b.dtype)
            keep = scores[i] > threshold
            results.append({"scores": scores[i][keep], "boxes": b[keep]})
        return results
