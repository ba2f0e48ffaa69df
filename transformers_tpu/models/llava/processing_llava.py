"""LLaVA processor (reference models/llava/processing_llava.py): expands each
``<image>`` placeholder to ``image_seq_length`` image tokens so the model's
scatter sees static shapes."""

from __future__ import annotations

from typing import Optional

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class LlavaProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None, image_token="<image>",
                 num_image_tokens: Optional[int] = None, patch_size: Optional[int] = None,
                 vision_feature_select_strategy: str = "default", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_token = image_token
        self.num_image_tokens = num_image_tokens
        self.patch_size = patch_size
        self.vision_feature_select_strategy = vision_feature_select_strategy

    def _image_token_count(self, pixel_values) -> int:
        if self.num_image_tokens is not None:
            return self.num_image_tokens
        if self.patch_size is not None:
            h, w = pixel_values.shape[-2], pixel_values.shape[-1]
            n = (h // self.patch_size) * (w // self.patch_size)
            if self.vision_feature_select_strategy == "full":
                n += 1
            return n
        raise ValueError("Set num_image_tokens or patch_size on LlavaProcessor")

    def __call__(self, text=None, images=None, return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data = {}
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
            n_tokens = self._image_token_count(img["pixel_values"])
        if text is not None:
            if isinstance(text, str):
                text = [text]
            if images is not None:
                # expand <image> -> image_seq_length copies (reference
                # get_text_with_replacements, processing_utils.py:815)
                text = [t.replace(self.image_token, self.image_token * n_tokens) for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors, padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length", "add_special_tokens")}))
        return BatchFeature(data)
