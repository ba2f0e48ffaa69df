"""Aya-Vision processor (reference
models/aya_vision/processing_aya_vision.py): GOT-OCR2 crop-to-patches image
tier; each ``<image>`` expands to
``<|START_OF_IMG|>TILE_1<patch>*n ... TILE_GLOBAL<patch>*n<|END_OF_IMG|>``."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class AyaVisionProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer"]

    def __init__(self, image_processor=None, tokenizer=None,
                 image_token="<image>", patch_size: int = 28,
                 img_size: int = 364,
                 img_patch_token="<|IMG_PATCH|>",
                 img_line_break_token="<|IMG_LINE_BREAK|>",
                 start_of_img_token="<|START_OF_IMG|>",
                 end_of_img_token="<|END_OF_IMG|>",
                 tile_token="TILE", tile_global_token="TILE_GLOBAL", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer, **kwargs)
        self.image_token = image_token
        self.patch_size = patch_size
        self.img_size = img_size
        self.img_patch_token = img_patch_token
        self.img_line_break_token = img_line_break_token
        self.start_of_img_token = start_of_img_token
        self.end_of_img_token = end_of_img_token
        self.tile_token = tile_token
        self.tile_global_token = tile_global_token

    def _img_string(self, num_patches: int) -> str:
        per_tile = (self.img_size // self.patch_size) ** 2
        s = self.start_of_img_token
        if num_patches > 1:
            for idx in range(1, num_patches):
                s += f"{self.tile_token}_{idx}" + self.img_patch_token * per_tile
        s += self.tile_global_token + self.img_patch_token * per_tile
        s += self.end_of_img_token
        return s

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
                reps = [self._img_string(int(n)) for n in num_patches]
                text = self.expand_mm_tokens(text, {self.image_token: reps})
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding,
                                       **{k: v for k, v in kwargs.items()
                                          if k in ("truncation", "max_length",
                                                   "add_special_tokens")}))
        return BatchFeature(data)
