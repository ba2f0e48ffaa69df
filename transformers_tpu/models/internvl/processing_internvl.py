"""InternVL processor (reference models/internvl/processing_internvl.py):
GOT-OCR2 crop-to-patches image tier; each ``<image>`` expands to
``<img>`` + context-token x (image_seq_length x num_patches) + ``</img>``."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class InternVLProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_length: int = 256, image_token: str = "<IMG_CONTEXT>",
                 start_image_token: str = "<img>", end_image_token: str = "</img>",
                 fake_image_token: str = "<image>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_seq_length = image_seq_length
        self.image_token = (getattr(tokenizer, "context_image_token", None)
                            or image_token)
        self.start_image_token = (getattr(tokenizer, "start_image_token", None)
                                  or start_image_token)
        self.end_image_token = (getattr(tokenizer, "end_image_token", None)
                                or end_image_token)
        self.fake_image_token = fake_image_token

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors,
                                       crop_to_patches=True)
            num_patches = list(img.pop("num_patches"))
            data.update(img)
        if text is not None:
            if images is not None:
                reps = [self.start_image_token
                        + self.image_token * (self.image_seq_length * int(n))
                        + self.end_image_token
                        for n in num_patches]
                text = self.expand_mm_tokens(text, {self.fake_image_token: reps})
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
