"""CLIPSeg processor (reference models/clipseg/processing_clipseg.py): CLIP
tokenizer + ViT image processor; ``visual_prompt`` images become
``conditional_pixel_values`` for one-shot segmentation."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class CLIPSegProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __call__(self, text=None, images=None, visual_prompt=None,
                 return_tensors="jax", **kwargs) -> BatchFeature:
        if text is None and images is None and visual_prompt is None:
            raise ValueError("Pass at least one of text, images, visual_prompt.")
        if text is not None and visual_prompt is not None:
            raise ValueError("text and visual_prompt are mutually exclusive "
                             "(reference processing_clipseg.py:91)")
        out = super().__call__(text=text, images=images,
                               return_tensors=return_tensors, **kwargs)
        if visual_prompt is not None:
            cond = self.image_processor(visual_prompt, return_tensors=return_tensors)
            out["conditional_pixel_values"] = cond["pixel_values"]
        return BatchFeature(dict(out))
