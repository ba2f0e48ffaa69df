"""Idefics3 processor (reference models/idefics3/processing_idefics3.py):
each ``<image>`` expands to the split grid — per crop
``<fake><row_r_col_c><image>*seq_len`` rows, then
``\\n<fake><global-img><image>*seq_len<fake>`` — or the single-image form
when the image was not split."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_idefics3 import Idefics3ImageProcessor


def _prompt_split_image(seq_len, rows, cols, fake, image_token, global_tag):
    out = ""
    for r in range(rows):
        for c in range(cols):
            out += f"{fake}<row_{r + 1}_col_{c + 1}>" + image_token * seq_len
        out += "\n"
    out += f"\n{fake}{global_tag}" + image_token * seq_len + fake
    return out


def _prompt_single_image(seq_len, fake, image_token, global_tag):
    return f"{fake}{global_tag}" + image_token * seq_len + fake


class Idefics3Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_len: int = 169,
                 fake_image_token: str = "<fake_token_around_image>",
                 image_token: str = "<image>",
                 global_image_tag: str = "<global-img>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.image_seq_len = image_seq_len
        self.fake_image_token = fake_image_token
        self.image_token = image_token
        self.global_image_tag = global_image_tag

    def get_image_prompt_string(self, rows, cols):
        if rows == 0 and cols == 0:
            return _prompt_single_image(self.image_seq_len,
                                        self.fake_image_token,
                                        self.image_token, self.global_image_tag)
        return _prompt_split_image(self.image_seq_len, rows, cols,
                                   self.fake_image_token, self.image_token,
                                   self.global_image_tag)

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            rows = [r for group in img.pop("rows") for r in group]
            cols = [c for group in img.pop("cols") for c in group]
            data.update(img)
            if text is not None:
                prompts = iter(self.get_image_prompt_string(r, c)
                               for r, c in zip(rows, cols))
                expanded = []
                for sample in text:
                    reps = []
                    while self.image_token in sample:
                        reps.append(next(prompts))
                        sample = sample.replace(self.image_token,
                                                "<placeholder>", 1)
                    for rep in reps:
                        sample = sample.replace("<placeholder>", rep, 1)
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
            proc.image_processor = Idefics3ImageProcessor()
        return proc
