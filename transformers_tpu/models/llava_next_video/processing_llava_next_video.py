"""LLaVA-NeXT-Video processor (reference
models/llava_next_video/processing_llava_next_video.py): anyres image
expansion as LLaVA-NeXT; each ``<video>`` expands to
frames x (patches_per_frame / 4) tokens (2x2 avg pool)."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ..llava_next.processing_llava_next import LlavaNextProcessor


class LlavaNextVideoProcessor(LlavaNextProcessor):
    attributes = ["image_processor", "tokenizer", "video_processor"]

    def __init__(self, image_processor=None, tokenizer=None, video_processor=None,
                 video_token: str = "<video>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         **kwargs)
        self.video_processor = video_processor
        self.video_token = getattr(tokenizer, "video_token", None) or video_token

    def __call__(self, text=None, images=None, videos=None,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        if isinstance(text, str):
            text = [text]
        if videos is not None:
            vid = self.video_processor(videos, return_tensors=return_tensors)
            data.update(vid)
            if text is not None:
                pv = vid["pixel_values_videos"]
                frames, h, w = pv.shape[1], pv.shape[-2], pv.shape[-1]
                per_frame = (h // self.patch_size) * (w // self.patch_size)
                rep = self.video_token * (per_frame // 4 * frames)
                text = [t.replace(self.video_token, rep) for t in text]
        out = super().__call__(text=text, images=images,
                               return_tensors=return_tensors, padding=padding,
                               **kwargs)
        data.update(dict(out))
        return BatchFeature(data)
