"""LLaVA-OneVision processor (reference
models/llava_onevision/processing_llava_onevision.py): anyres image
expansion (SigLIP tower: no CLS, +1 newline; single-frame path adds +1 for
the newline), videos expand to frames x ceil(sqrt(num_image_tokens)/2)^2 + 1
pooled tokens."""

from __future__ import annotations

import math

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin
from ..llava_next.processing_llava_next import LlavaNextProcessor


class LlavaOnevisionProcessor(LlavaNextProcessor):
    attributes = ["image_processor", "tokenizer", "video_processor"]

    def __init__(self, image_processor=None, tokenizer=None, video_processor=None,
                 num_image_tokens: int | None = None,
                 vision_feature_select_strategy: str = "full",
                 image_token: str = "<image>", video_token: str = "<video>",
                 **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         image_token=image_token,
                         vision_feature_select_strategy=vision_feature_select_strategy,
                         num_additional_image_tokens=0, **kwargs)
        self.video_processor = video_processor
        self.num_image_tokens = num_image_tokens
        self.video_token = getattr(tokenizer, "video_token", None) or video_token

    def _video_rep(self, pixel_values_videos) -> str:
        num_frames = pixel_values_videos.shape[1]
        patches_hw = int(math.sqrt(self.num_image_tokens))
        pooled_hw = math.ceil(patches_hw / 2)
        return self.video_token * (num_frames * pooled_hw * pooled_hw + 1)

    def __call__(self, text=None, images=None, videos=None,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if videos is not None:
            vid = self.video_processor(videos, return_tensors=return_tensors)
            data.update(vid)
            if text is not None:
                rep = self._video_rep(vid["pixel_values_videos"])
                text = [t.replace(self.video_token, rep) for t in text]
        out = super().__call__(text=text, images=images,
                               return_tensors=return_tensors, padding=padding,
                               **kwargs)
        data.update(dict(out))
        return BatchFeature(data)
