"""GLM-4V processor (reference models/glm4v/processing_glm4v.py): Qwen2-VL
style grid expansion — ``<|image|>`` expands to ``grid.prod()//merge**2``
copies between ``<|begin_of_image|>``/``<|end_of_image|>``; videos expand
per frame with timestamp headers."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Glm4vProcessor(ProcessorMixin):
    attributes = ["image_processor", "tokenizer", "video_processor"]

    def __init__(self, image_processor=None, tokenizer=None, video_processor=None,
                 image_token: str = "<|image|>",
                 video_token: str = "<|video|>",
                 begin_image_token: str = "<|begin_of_image|>",
                 end_image_token: str = "<|end_of_image|>", **kwargs):
        super().__init__(image_processor=image_processor, tokenizer=tokenizer,
                         video_processor=video_processor, **kwargs)
        self.image_token = getattr(tokenizer, "image_token", None) or image_token
        self.video_token = getattr(tokenizer, "video_token", None) or video_token
        self.begin_image_token = begin_image_token
        self.end_image_token = end_image_token

    def __call__(self, text=None, images=None, videos=None, return_tensors="jax",
                 padding=True, **kwargs) -> BatchFeature:
        data: dict = {}
        image_reps: list[str] = []
        video_reps: list[str] = []
        if images is not None:
            img = self.image_processor(images, return_tensors=return_tensors)
            data.update(img)
            merge2 = self.image_processor.merge_size ** 2
            image_reps = [
                self.begin_image_token
                + self.image_token * (int(np.prod(thw)) // merge2)
                + self.end_image_token
                for thw in np.asarray(img["image_grid_thw"])]
        if videos is not None and self.video_processor is not None:
            vid = self.video_processor(
                videos, return_tensors=return_tensors,
                **{k: kwargs.pop(k) for k in ("num_frames", "fps", "video_metadata")
                   if k in kwargs})
            data.update(vid)
            merge2 = self.video_processor.merge_size ** 2
            for thw in np.asarray(vid["video_grid_thw"]):
                t = int(thw[0])
                per_frame = int(np.prod(thw[1:])) // merge2
                frames = "".join(
                    f"<|frame_{i}|>" + self.begin_image_token
                    + self.image_token * per_frame + self.end_image_token
                    for i in range(t))
                video_reps.append(frames)
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
