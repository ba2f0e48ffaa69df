"""DeepSeek-VL processor (reference
models/deepseek_vl/processing_deepseek_vl.py): each ``<image>`` expands to
``num_image_tokens`` (576) copies."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class DeepseekVLProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 num_image_tokens: int = 576, image_token: str = "<image>",
                 **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.num_image_tokens = num_image_tokens
        self.image_token = getattr(tokenizer, "image_token", None) or image_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if images is not None:
                text = [t.replace(self.image_token,
                                  self.image_token * self.num_image_tokens)
                        for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
