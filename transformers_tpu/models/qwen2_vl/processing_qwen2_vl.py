"""Qwen2-VL processor (reference models/qwen2_vl/processing_qwen2_vl.py:41):
routes text+images+videos; each ``<|image_pad|>``/``<|video_pad|>``
placeholder expands to ``grid_thw.prod() // merge_size**2`` tokens so the
model's placeholder scatter sees the final static sequence."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from .image_processing_qwen2_vl import Qwen2VLImageProcessor
from .video_processing_qwen2_vl import Qwen2VLVideoProcessor


class Qwen2VLProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer", "video_processor"]

    def __init__(self, image_processor=None, tokenizer=None, video_processor=None,
                 image_token: str = "<|image_pad|>",
                 video_token: str = "<|video_pad|>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         video_processor=video_processor, **kwargs)
        self.image_token = (getattr(tokenizer, "image_token", None) or image_token)
        self.video_token = (getattr(tokenizer, "video_token", None) or video_token)

    def __call__(self, text=None, images=None, videos=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        image_reps: list[str] = []
        video_reps: list[str] = []
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
            merge2 = self.image_processor.merge_size ** 2
            image_reps = [self.image_token * (int(np.prod(thw)) // merge2)
                          for thw in np.asarray(img["image_grid_thw"])]
        if videos is not None:
            if self.video_processor is None:
                self.video_processor = Qwen2VLVideoProcessor()
            vid = self.video_processor(
                videos, return_tensors=return_tensors,
                **{k: kwargs.pop(k) for k in ("num_frames", "fps", "video_metadata")
                   if k in kwargs})
            data.update(vid)
            merge2 = self.video_processor.merge_size ** 2
            video_reps = [self.video_token * (int(np.prod(thw)) // merge2)
                          for thw in np.asarray(vid["video_grid_thw"])]
        if text is not None:
            if isinstance(text, str):
                text = [text]
            text = self.expand_mm_tokens(text, {self.image_token: image_reps,
                                                self.video_token: video_reps})
            data.update(self.tokenizer(
                text, return_tensors=return_tensors, padding=padding,
                **{k: v for k, v in kwargs.items()
                   if k in ("truncation", "max_length", "add_special_tokens")}))
        return BatchFeature(data)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs):
        proc = super().from_pretrained(pretrained_model_name_or_path, **kwargs)
        if proc.image_processor is None:
            proc.image_processor = Qwen2VLImageProcessor()
        return proc
