"""Video processor base.

TPU-native analog of reference src/transformers/video_processing_utils.py:78
(``BaseVideoProcessor``, which subclasses the torchvision image backend):
frame sampling (video_utils) + the fused image pipeline applied per frame,
reading/writing ``video_preprocessor_config.json`` (A.9 contract).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .image_processing_utils import BaseImageProcessor, BatchFeature
from .utils.hub import VIDEO_PROCESSOR_NAME, cached_file
from .video_utils import VideoMetadata, default_sample_indices_fn


class BaseVideoProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values_videos"]

    def __init__(self, do_sample_frames: bool = False, num_frames: Optional[int] = None,
                 fps: Optional[Union[int, float]] = None, **kwargs):
        super().__init__(**kwargs)
        self.do_sample_frames = do_sample_frames
        self.num_frames = num_frames
        self.fps = fps

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> "BaseVideoProcessor":
        resolved = cached_file(str(pretrained_model_name_or_path), VIDEO_PROCESSOR_NAME,
                               _raise_exceptions_for_missing_entries=False)
        if resolved is None:
            # the reference falls back to preprocessor_config.json
            from .image_processing_utils import IMAGE_PROCESSOR_NAME

            resolved = cached_file(str(pretrained_model_name_or_path), IMAGE_PROCESSOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            config = json.load(f)
        config.pop("video_processor_type", None)
        config.pop("image_processor_type", None)
        config.update(kwargs)
        return cls(**config)

    def save_pretrained(self, save_directory) -> None:
        os.makedirs(save_directory, exist_ok=True)
        out = self.to_dict()
        out["video_processor_type"] = type(self).__name__
        out.pop("image_processor_type", None)
        with open(os.path.join(save_directory, VIDEO_PROCESSOR_NAME), "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2, sort_keys=True, default=str)

    def sample_frames(self, video: np.ndarray, metadata: Optional[VideoMetadata] = None,
                      num_frames: Optional[int] = None, fps=None) -> np.ndarray:
        metadata = metadata or VideoMetadata(total_num_frames=video.shape[0], fps=None)
        idx = default_sample_indices_fn(metadata, num_frames=num_frames or self.num_frames,
                                        fps=fps or self.fps)
        return video[idx]

    def preprocess(self, videos, return_tensors="jax", **kwargs) -> BatchFeature:
        """videos: array [T, H, W, C]/[T, C, H, W] or a list of such."""
        if not isinstance(videos, (list, tuple)):
            videos = [videos]
        out = []
        for video in videos:
            video = np.asarray(video)
            if self.do_sample_frames:
                video = self.sample_frames(video)
            if video.shape[-1] in (1, 3, 4) and video.shape[1] not in (1, 3, 4):
                video = video.transpose(0, 3, 1, 2)  # THWC -> TCHW
            frames = self._process_batch(jnp.asarray(video.astype(np.float32)))
            out.append(frames)
        pixel_values = jnp.stack(out)
        if return_tensors in ("np", "numpy"):
            pixel_values = np.asarray(pixel_values)
        return BatchFeature({"pixel_values_videos": pixel_values})

    def __call__(self, videos, **kwargs) -> BatchFeature:
        return self.preprocess(videos, **kwargs)


def __getattr__(name):
    # BC alias: AutoVideoProcessor moved to models.auto.video_processing_auto
    # (per-family model_type mapping, reference models/auto layout)
    if name == "AutoVideoProcessor":
        from .models.auto.video_processing_auto import AutoVideoProcessor

        return AutoVideoProcessor
    raise AttributeError(name)
