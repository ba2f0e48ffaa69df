"""LLaVA-NeXT processor (reference models/llava_next/processing_llava_next.py):
each ``<image>`` expands to base-view features + unpadded grid features +
one newline feature per grid row, computed from the image's original size
against the grid pinpoints (v4 _get_number_of_features)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_llava_next import LlavaNextImageProcessor, select_best_resolution


class LlavaNextProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 patch_size=None, vision_feature_select_strategy=None,
                 image_token: str = "<image>",
                 num_additional_image_tokens: int = 1, **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.patch_size = patch_size
        self.vision_feature_select_strategy = vision_feature_select_strategy
        self.image_token = image_token
        self.num_additional_image_tokens = num_additional_image_tokens

    # ------------------------------------------------- token accounting
    def _get_unpadded_features(self, height, width, patches_height,
                               patches_width, scale_height, scale_width):
        cur_h = patches_height * scale_height
        cur_w = patches_width * scale_width
        orig_ratio = width / height
        cur_ratio = cur_w / cur_h
        if orig_ratio > cur_ratio:
            new_h = int(round(height * (cur_w / width), 7))
            pad = (cur_h - new_h) // 2
            cur_h -= pad * 2
        else:
            new_w = int(round(width * (cur_h / height), 7))
            pad = (cur_w - new_w) // 2
            cur_w -= pad * 2
        return cur_h * cur_w, cur_h

    def _get_number_of_features(self, orig_height, orig_width, height, width):
        best_h, best_w = select_best_resolution(
            (orig_height, orig_width), self.image_processor.image_grid_pinpoints)
        scale_h, scale_w = best_h // height, best_w // width
        patches_h = height // self.patch_size
        patches_w = width // self.patch_size
        unpadded, newlines = self._get_unpadded_features(
            orig_height, orig_width, patches_h, patches_w, scale_h, scale_w)
        base = patches_h * patches_w + self.num_additional_image_tokens
        return unpadded + newlines + base

    def __call__(self, text=None, images=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        if images is None and text is None:
            raise ValueError("You have to specify at least images or text.")
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
            sizes = iter(np.asarray(img["image_sizes"]).tolist())
            h, w = np.asarray(img["pixel_values"]).shape[-2:]
            expanded = []
            for sample in text:
                while self.image_token in sample:
                    oh, ow = next(sizes)
                    n = self._get_number_of_features(int(oh), int(ow), h, w)
                    if self.vision_feature_select_strategy == "default":
                        n -= 1
                    sample = sample.replace(self.image_token,
                                            "<placeholder>" * n, 1)
                expanded.append(sample.replace("<placeholder>", self.image_token))
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
            proc.image_processor = LlavaNextImageProcessor()
        return proc
