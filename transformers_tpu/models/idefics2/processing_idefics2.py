"""Idefics2 processor (reference models/idefics2/processing_idefics2.py):
``<image>`` becomes ``<fake><image>*seq_len<fake>`` (x5 when the image
processor splits into 4 quadrants + original); adjacent fake tokens
deduplicate."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Idefics2Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_len: int = 64,
                 image_token: str = "<image>",
                 fake_image_token: str = "<fake_token_around_image>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_seq_len = image_seq_len
        self.image_token = getattr(tokenizer, "image_token", None) or image_token
        self.fake_image_token = (getattr(tokenizer, "image_boundary_token", None)
                                 or fake_image_token)

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            data.update(self.image_processor(images, return_tensors=return_tensors))
        if text is not None:
            if images is not None:
                fake, tok = self.fake_image_token, self.image_token
                image_str = f"{fake}{tok * self.image_seq_len}{fake}"
                if getattr(self.image_processor, "do_image_splitting", False):
                    image_str = image_str * 5
                text = [t.replace(tok, image_str).replace(f"{fake}{fake}", fake)
                        for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
