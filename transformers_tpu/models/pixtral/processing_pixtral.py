"""Pixtral processor (reference models/pixtral/processing_pixtral.py): each
``[IMG]`` placeholder becomes a row-major grid of ``[IMG]`` tokens with
``[IMG_BREAK]`` after each row and ``[IMG_END]`` closing the last row."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_pixtral import PixtralImageProcessor


class PixtralProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 patch_size: int = 16, spatial_merge_size: int = 1,
                 image_token: str = "[IMG]",
                 image_break_token: str = "[IMG_BREAK]",
                 image_end_token: str = "[IMG_END]", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.patch_size = patch_size
        self.spatial_merge_size = spatial_merge_size
        self.image_token = image_token
        self.image_break_token = image_break_token
        self.image_end_token = image_end_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        patch = self.patch_size * self.spatial_merge_size
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors,
                                       patch_size=patch)
            data.update(img)
            sizes = iter(np.asarray(img["image_sizes"]).tolist())
            expanded = []
            for sample in text:
                reps = []
                while self.image_token in sample:
                    h, w = next(sizes)
                    nh, nw = h // patch, w // patch
                    rows = [[self.image_token] * nw + [self.image_break_token]
                            for _ in range(nh)]
                    flat = [t for row in rows for t in row]
                    flat[-1] = self.image_end_token
                    reps.append("".join(flat))
                    sample = sample.replace(self.image_token, "<placeholder>", 1)
                while "<placeholder>" in sample:
                    sample = sample.replace("<placeholder>", reps.pop(0), 1)
                expanded.append(sample)
            text = expanded
        if text is not None:
            data.update(self.tokenizer(
                text, return_tensors=return_tensors, padding=padding,
                **{k: v for k, v in kwargs.items()
                   if k in ("truncation", "max_length", "add_special_tokens")}))
        return BatchFeature(data)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        proc = super().from_pretrained(pretrained_model_name_or_path, **kwargs)
        if proc.image_processor is None:
            proc.image_processor = PixtralImageProcessor()
        return proc
