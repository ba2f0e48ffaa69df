"""Qwen2.5-Omni processor (reference models/qwen2_5_omni/processing_qwen2_5_omni.py):
routes text through the Qwen2 tokenizer, images/videos through the
Qwen2-VL dynamic-grid image processor, and audio through the Whisper
128-mel feature extractor (feature_attention_mask carried alongside)."""

from __future__ import annotations

from ...image_processing_utils import BatchFeature
from ...processing_utils import ProcessorMixin


class Qwen2_5OmniProcessor(ProcessorMixin):
    attributes = ["image_processor", "feature_extractor", "tokenizer"]

    def __call__(self, text=None, images=None, videos=None, audio=None,
                 return_tensors="jax", padding=True, **kwargs) -> BatchFeature:
        data = {}
        if images is not None:
            data.update(self.image_processor(images,
                                             return_tensors=return_tensors))
        if videos is not None:
            out = self.image_processor(videos, return_tensors=return_tensors,
                                       is_video=True)
            data.update(out)
        if audio is not None:
            feats = self.feature_extractor(audio, return_tensors=return_tensors,
                                           return_attention_mask=True,
                                           padding="max_length")
            data["input_features"] = feats["input_features"]
            if "attention_mask" in feats:
                data["feature_attention_mask"] = feats["attention_mask"]
        if text is not None:
            data.update(self.tokenizer(text, return_tensors=return_tensors,
                                       padding=padding, **kwargs))
        return BatchFeature(data)
