"""Emu3 processor (reference models/emu3/processing_emu3.py): each
``<image>`` expands to ``<|image start|>H*W<|image token|>`` + placeholder x
(h x (w+1)) + ``<|extra_201|><|image end|>`` where (h, w) is the image size
divided by the VQ downsample ratio; the +1 column carries the per-row EOL
the modeling code emits when converting VQ codes to BPE ids."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Emu3Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 downsample_ratio: int = 8, image_token: str = "<image>",
                 image_start_token: str = "<|image start|>",
                 image_end_token: str = "<|image end|>",
                 fake_token_around_image: str = "<|image token|>",
                 eof_token: str = "<|extra_201|>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.downsample_ratio = downsample_ratio
        self.image_token = getattr(tokenizer, "image_token", None) or image_token
        self.image_start_token = (getattr(tokenizer, "boi_token", None)
                                  or image_start_token)
        self.image_end_token = (getattr(tokenizer, "eoi_token", None)
                                or image_end_token)
        self.fake_token_around_image = (getattr(tokenizer, "image_wrapper_token", None)
                                        or fake_token_around_image)
        self.eof_token = (getattr(tokenizer, "eof_token", None) or eof_token)

    def _image_rep(self, height: int, width: int) -> str:
        h = height // self.downsample_ratio
        w = width // self.downsample_ratio
        seq = h * (w + 1)
        return (f"{self.image_start_token}{h}*{w}{self.fake_token_around_image}"
                f"{self.image_token * seq}{self.eof_token}{self.image_end_token}")

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
            sizes = np.asarray(img["image_sizes"])
            reps = [self._image_rep(int(h), int(w)) for h, w in sizes]
            if text is not None:
                text = self.expand_mm_tokens(text, {self.image_token: reps})
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
