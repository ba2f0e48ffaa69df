"""Fuyu processor (reference models/fuyu/processing_fuyu.py): the prompt is
prefixed with the image placeholder raster — per patch row, ``cols`` copies
of ``|SPEAKER|`` then one ``|NEWLINE|`` — followed by the text and the
``<0x04>`` beginning-of-answer token; image_patches scatter into the
placeholder positions."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class FuyuProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_placeholder: str = "|SPEAKER|",
                 image_newline: str = "|NEWLINE|",
                 boa_token: str = "<0x04>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_placeholder = image_placeholder
        self.image_newline = image_newline
        self.boa_token = boa_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            dims = np.asarray(img.pop("image_patch_dims"))
            data.update(img)
            if text is not None:
                prefixed = []
                for i, t in enumerate(text):
                    rows, cols = int(dims[i][0]), int(dims[i][1])
                    raster = (self.image_placeholder * cols
                              + self.image_newline) * rows
                    prefixed.append(raster + t + self.boa_token)
                text = prefixed
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
