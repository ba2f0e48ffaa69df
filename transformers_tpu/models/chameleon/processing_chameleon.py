"""Chameleon processor (reference models/chameleon/processing_chameleon.py):
each ``<image>`` expands to ``<racm3:break><image>*1024<eoss>``."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class ChameleonProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_length: int = 1024, image_token: str = "<image>",
                 image_start_token: str = "<racm3:break>",
                 image_end_token: str = "<eoss>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_seq_length = image_seq_length
        self.image_token = getattr(tokenizer, "image_token", None) or image_token
        self.image_start_token = (getattr(tokenizer, "boi_token", None)
                                  or image_start_token)
        self.image_end_token = (getattr(tokenizer, "eoi_token", None)
                                or image_end_token)

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if images is not None:
                one = (self.image_start_token
                       + self.image_token * self.image_seq_length
                       + self.image_end_token)
                text = [t.replace(self.image_token, one) for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
