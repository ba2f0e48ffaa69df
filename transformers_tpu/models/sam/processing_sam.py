"""SAM processor (reference models/sam/processing_sam.py): images resize to
longest-edge 1024; prompt points/boxes rescale by the same ratio and pad to
the batch max — input_points [B, point_batch, n_points, 2], input_boxes
[B, n_boxes, 4], input_labels [B, point_batch, n_points]."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class SamProcessor(ProcessorMixin):
    attributes = ["image_processor"]

    def __init__(self, image_processor=None, **kwargs):
        super().__init__(image_processor=image_processor, **kwargs)

    def _scale(self, coords, orig_hw, new_hw):
        oh, ow = orig_hw
        nh, nw = new_hw
        coords = np.asarray(coords, np.float64).copy()
        coords[..., 0] = coords[..., 0] * (nw / ow)
        coords[..., 1] = coords[..., 1] * (nh / oh)
        return coords

    def __call__(self, images=None, input_points=None, input_labels=None,
                 input_boxes=None, return_tensors="np", **kwargs) -> BatchFeature:
        data: dict = {}
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
        orig = np.asarray(data.get("original_sizes"))
        new = np.asarray(data.get("reshaped_input_sizes"))
        if input_points is not None:
            pts = [np.asarray(p, np.float64) for p in input_points]
            maxp = max(p.shape[-2] for p in pts)
            out, labs = [], []
            for i, p in enumerate(pts):
                if p.ndim == 2:
                    p = p[None]
                p = self._scale(p, orig[i], new[i])
                pad = maxp - p.shape[-2]
                if pad:
                    p = np.concatenate(
                        [p, np.zeros(p.shape[:-2] + (pad, 2))], axis=-2)
                out.append(p)
            data["input_points"] = np.stack(out).astype(np.float32)
            if input_labels is not None:
                labs = [np.asarray(la, np.int64) for la in input_labels]
                padded = []
                for la in labs:
                    if la.ndim == 1:
                        la = la[None]
                    pad = maxp - la.shape[-1]
                    if pad:
                        la = np.concatenate(
                            [la, np.full(la.shape[:-1] + (pad,), -10,
                                         np.int64)], axis=-1)
                    padded.append(la)
                data["input_labels"] = np.stack(padded)
        if input_boxes is not None:
            boxes = []
            for i, b in enumerate(input_boxes):
                b = np.asarray(b, np.float64).reshape(-1, 4)
                b = self._scale(b.reshape(-1, 2, 2), orig[i], new[i]).reshape(-1, 4)
                boxes.append(b)
            nmax = max(b.shape[0] for b in boxes)
            out = np.zeros((len(boxes), nmax, 4), np.float32)
            for i, b in enumerate(boxes):
                out[i, :b.shape[0]] = b
            data["input_boxes"] = out
        if return_tensors == "jax":
            import jax.numpy as jnp

            data = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                    for k, v in data.items()}
        return BatchFeature(data)

    def post_process_masks(self, *args, **kwargs):
        return self.image_processor.post_process_masks(*args, **kwargs)
