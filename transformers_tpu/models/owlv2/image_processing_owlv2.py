"""OWLv2 image processor (reference
models/owlv2/image_processing_owlv2.py): rescale FIRST, pad bottom/right to
square (:266-277), resize to 960, then normalize (:357-412). Box
post-processing must unpad accordingly."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BatchFeature,
    load_image,
)
from ..owlvit.image_processing_owlvit import OwlViTImageProcessor, _cxcywh_to_xyxy
from ... import image_transforms as T


class Owlv2ImageProcessor(OwlViTImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 960, "width": 960})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("do_pad", True)
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        super().__init__(**kwargs)

    def preprocess(self, images, return_tensors="jax", **kwargs):
        import jax.numpy as jnp

        if not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        for im in images:
            arr = load_image(im).astype(np.float32)
            if self.do_rescale:
                arr = arr * self.rescale_factor
            if self.do_pad:
                h, w = arr.shape[-2:]
                side = max(h, w)
                arr = np.pad(arr, [(0, 0), (0, side - h), (0, side - w)])
            x = jnp.asarray(arr)
            if self.do_resize:
                x = T.resize(x, (self.size["height"], self.size["width"]),
                             resample=self.resample)
            if self.do_normalize:
                x = T.normalize(x, self.image_mean, self.image_std)
            out.append(x)
        pixel_values = jnp.stack(out)
        if return_tensors in ("np", "numpy"):
            pixel_values = np.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values})

    def post_process_object_detection(self, outputs, threshold: float = 0.1,
                                      target_sizes=None):
        """Boxes are relative to the PADDED square: scale by the padded side
        (reference post_process_object_detection with unpadding)."""
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
                side = max(h, w)
                b = b * np.array([side, side, side, side], b.dtype)
            keep = scores[i] > threshold
            results.append({"scores": scores[i][keep], "labels": labels[i][keep],
                            "boxes": b[keep]})
        return results
