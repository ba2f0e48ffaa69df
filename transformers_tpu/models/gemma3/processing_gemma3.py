"""Gemma3 processor (reference models/gemma3/processing_gemma3.py): each
``<start_of_image>`` placeholder becomes ``\\n\\n<boi><image>*seq_len<eoi>\\n\\n``;
pan-and-scan crops get an explanatory crop preamble first (v4 __call__)."""

from __future__ import annotations

import re

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_gemma3 import Gemma3ImageProcessor


class Gemma3Processor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_seq_length: int = 256,
                 boi_token: str = "<start_of_image>",
                 eoi_token: str = "<end_of_image>",
                 image_token: str = "<image_soft_token>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.image_seq_length = image_seq_length
        self.boi_token = getattr(tokenizer, "boi_token", None) or boi_token
        self.eoi_token = getattr(tokenizer, "eoi_token", None) or eoi_token
        self.image_token = getattr(tokenizer, "image_token", None) or image_token
        self.full_image_sequence = (
            f"\n\n{self.boi_token}{self.image_token * image_seq_length}"
            f"{self.eoi_token}\n\n")

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            # nested lists = images per prompt; flat list = one image per prompt
            if not isinstance(images, (list, tuple)):
                images = [images]
            nested = (isinstance(images[0], (list, tuple)))
            batched = images if nested else [[im] for im in images]
            flat = [im for group in batched for im in group]
            img = self.image_processor(flat, return_tensors=return_tensors,
                                       **{k: kwargs.pop(k) for k in
                                          ("do_pan_and_scan",
                                           "pan_and_scan_min_crop_size",
                                           "pan_and_scan_max_num_crops",
                                           "pan_and_scan_min_ratio_to_activate")
                                          if k in kwargs})
            num_crops = list(np.asarray(img.pop("num_crops")))
            data.update(img)
            if not text:
                text = [" ".join([self.boi_token] * len(g)) for g in batched]
            if len(batched) != len(text):
                raise ValueError(
                    f"Inconsistently sized batches of images ({len(batched)}) "
                    f"and text ({len(text)}).")
            batch_crops = [[int(num_crops.pop(0)) for _ in g] for g in batched]
            for bi, (prompt, group, crops) in enumerate(zip(text, batched, batch_crops)):
                idxs = [m.start() for m in re.finditer(re.escape(self.boi_token), prompt)]
                if len(group) != len(idxs):
                    raise ValueError(
                        f"Prompt contained {len(idxs)} image tokens but "
                        f"received {len(group)} images.")
                # insert crop preambles back-to-front (reference v4 __call__)
                for num, idx in reversed(list(zip(crops, idxs))):
                    if num:
                        crop_text = (
                            f"Here is the original image {self.boi_token} and "
                            "here are some crops to help you see better "
                            + " ".join([self.boi_token] * num))
                        prompt = (prompt[:idx] + crop_text
                                  + prompt[idx + len(self.boi_token):])
                        text[bi] = prompt
            text = [p.replace(self.boi_token, self.full_image_sequence)
                    for p in text]
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
            proc.image_processor = Gemma3ImageProcessor()
        return proc
