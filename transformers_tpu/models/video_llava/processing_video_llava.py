"""Video-LLaVA processor (reference models/video_llava/processing_video_llava.py):
CLIP-style images + LanguageBind video frames; ``<image>`` expands to
num_image_tokens and ``<video>`` to num_frames × num_image_tokens (+1 CLS)."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class VideoLlavaProcessor(ProcessorMixin):
    attributes = ["image_processor", "video_processor", "tokenizer"]

    def __init__(self, image_processor=None, video_processor=None,
                 tokenizer=None, patch_size=14, image_token="<image>",
                 video_token="<video>", num_frames=8,
                 vision_feature_select_strategy="default", **kwargs):
        super().__init__(image_processor=image_processor,
                         video_processor=video_processor, tokenizer=tokenizer,
                         **kwargs)
        self.patch_size = patch_size
        self.image_token = image_token
        self.video_token = video_token
        self.num_frames = num_frames
        self.vision_feature_select_strategy = vision_feature_select_strategy

    def __call__(self, text=None, images=None, videos=None,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data = {}
        n_img = 0
        if images is not None:
            out = self.image_processor(images, return_tensors=return_tensors)
            data["pixel_values_images"] = out["pixel_values"]
            h, w = out["pixel_values"].shape[-2:]
            n_img = (h // self.patch_size) * (w // self.patch_size)
            if self.vision_feature_select_strategy == "full":
                n_img += 1
        if videos is not None:
            out = self.video_processor(videos, return_tensors=return_tensors)
            data["pixel_values_videos"] = out["pixel_values_videos"]
        if text is not None:
            if isinstance(text, str):
                text = [text]
            if images is not None:
                text = [t.replace(self.image_token, self.image_token * n_img)
                        for t in text]
            if videos is not None:
                f = data["pixel_values_videos"].shape[1]
                h, w = data["pixel_values_videos"].shape[-2:]
                per = (h // self.patch_size) * (w // self.patch_size) + 1
                text = [t.replace(self.video_token, self.video_token * (per * f))
                        for t in text]
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding, **kwargs))
        return BatchFeature(data)
