"""Qwen2-VL video processor (reference
models/qwen2_vl/video_processing_qwen2_vl.py:99): dynamic-resolution
``smart_resize`` per video, CLIP normalization, temporal patching into flat
``pixel_values_videos [sum(t*h*w), C*tps*p*p]`` + ``video_grid_thw [n, 3]``.

Frame sampling (``sample_frames`` :140) rounds the frame count to the
temporal patch size and supports fixed ``num_frames`` or target ``fps``
against the video's metadata.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ... import image_transforms as T
from ...image_processing_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    BatchFeature,
)
from ...video_processing_utils import BaseVideoProcessor
from ...video_utils import VideoMetadata
from .image_processing_qwen2_vl import smart_resize


class Qwen2VLVideoProcessor(BaseVideoProcessor):
    model_input_names = ["pixel_values_videos", "video_grid_thw"]

    def __init__(self, patch_size: int = 14, temporal_patch_size: int = 2,
                 merge_size: int = 2, min_frames: int = 4, max_frames: int = 768,
                 size: Optional[dict] = None, **kwargs):
        # BC: min_pixels/max_pixels override the size dict (reference :118-128)
        size = dict(size) if size else {"shortest_edge": 128 * 28 * 28,
                                        "longest_edge": 28 * 28 * 768}
        if (mn := kwargs.pop("min_pixels", None)) is not None:
            size["shortest_edge"] = mn
        if (mx := kwargs.pop("max_pixels", None)) is not None:
            size["longest_edge"] = mx
        kwargs.setdefault("image_mean", OPENAI_CLIP_MEAN)
        kwargs.setdefault("image_std", OPENAI_CLIP_STD)
        kwargs.setdefault("resample", "bicubic")
        super().__init__(size=size, **kwargs)
        self.patch_size = patch_size
        self.temporal_patch_size = temporal_patch_size
        self.merge_size = merge_size
        self.min_frames = min_frames
        self.max_frames = max_frames

    # ------------------------------------------------------------- sampling
    def sample_frames(self, video: np.ndarray,
                      metadata: Optional[VideoMetadata] = None,
                      num_frames: Optional[int] = None, fps=None) -> np.ndarray:
        """reference :140 — uniform indices, frame count rounded to the
        temporal patch size; fps mode needs metadata.fps."""
        if fps is not None and num_frames is not None:
            raise ValueError("`num_frames` and `fps` are mutually exclusive")
        num_frames = num_frames if num_frames is not None else self.num_frames
        fps = fps if fps is not None else self.fps
        total = video.shape[0] if metadata is None else metadata.total_num_frames
        tps = self.temporal_patch_size
        if num_frames is not None:
            num_frames = round(num_frames / tps) * tps
        elif fps is not None:
            if metadata is None or metadata.fps is None:
                raise ValueError("fps sampling requires VideoMetadata with fps")
            max_frames = math.floor(min(self.max_frames, total) / tps) * tps
            num_frames = total / metadata.fps * fps
            num_frames = min(max(num_frames, self.min_frames), max_frames, total)
            num_frames = math.floor(num_frames / tps) * tps
        if num_frames is not None and num_frames > total:
            raise ValueError(
                f"num_frames={num_frames} exceeds total_num_frames={total}")
        if num_frames is None:
            return video
        idx = np.arange(0, total, total / num_frames).astype(np.int64)
        return video[idx]

    # ------------------------------------------------------------ patchify
    def _patchify(self, frames: np.ndarray, gh: int, gw: int):
        """frames [T, C, H, W] -> ([grid_t*gh*gw, C*tps*p*p], grid_t)
        (reference patchify :236; same merge-block patch ordering as the
        image processor)."""
        p, tps, m = self.patch_size, self.temporal_patch_size, self.merge_size
        if frames.shape[0] % tps != 0:
            reps = np.repeat(frames[-1:], tps - frames.shape[0] % tps, axis=0)
            frames = np.concatenate([frames, reps], axis=0)
        grid_t = frames.shape[0] // tps
        c = frames.shape[1]
        x = frames.reshape(grid_t, tps, c, gh // m, m, p, gw // m, m, p)
        x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        return x.reshape(grid_t * gh * gw, c * tps * p * p), grid_t

    def preprocess(self, videos, return_tensors="jax",
                   num_frames: Optional[int] = None, fps=None,
                   video_metadata=None, **kwargs) -> BatchFeature:
        """videos: [T, H, W, C]/[T, C, H, W] array (or list of such)."""
        if not isinstance(videos, (list, tuple)):
            videos = [videos]
        if video_metadata is not None and not isinstance(video_metadata, (list, tuple)):
            video_metadata = [video_metadata]
        factor = self.patch_size * self.merge_size
        all_patches, grids, second_per_grid_ts = [], [], []
        for i, video in enumerate(videos):
            video = np.asarray(video)
            if video.shape[-1] in (1, 3, 4) and video.shape[1] not in (1, 3, 4):
                video = video.transpose(0, 3, 1, 2)  # THWC -> TCHW
            meta = video_metadata[i] if video_metadata is not None else None
            total = video.shape[0]
            if self.do_sample_frames or num_frames is not None or fps is not None:
                video = self.sample_frames(video, metadata=meta,
                                           num_frames=num_frames, fps=fps)
            # seconds covered by one temporal grid step = tps / sampled_fps
            # (reference qwen2_5_vl processing_qwen2_5_vl.py:146 — consumed
            # by get_rope_index's video temporal scaling; 1.0 when the frame
            # rate is unknown, matching the reference's default fps handling)
            if fps is not None:
                sampled_fps = float(fps)
            elif meta is not None and getattr(meta, "fps", None):
                duration = (meta.total_num_frames or total) / meta.fps
                sampled_fps = video.shape[0] / duration if duration else None
            else:
                sampled_fps = None
            second_per_grid_ts.append(
                self.temporal_patch_size / sampled_fps if sampled_fps else 1.0)
            arr = video.astype(np.float32)
            if self.do_rescale:
                arr = arr * self.rescale_factor
            h, w = arr.shape[-2:]
            rh, rw = smart_resize(h, w, factor, self.size["shortest_edge"],
                                  self.size["longest_edge"])
            resized = np.asarray(T.resize(jnp.asarray(arr), (rh, rw),
                                          resample=self.resample))
            if self.do_normalize:
                mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                resized = (resized - mean) / std
            gh, gw = rh // self.patch_size, rw // self.patch_size
            flat, grid_t = self._patchify(resized, gh, gw)
            all_patches.append(flat)
            grids.append((grid_t, gh, gw))
        pixel_values = np.concatenate(all_patches, axis=0)
        grid_thw = np.asarray(grids, np.int64)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values_videos": pixel_values,
                             "video_grid_thw": grid_thw,
                             "second_per_grid_ts": np.asarray(
                                 second_per_grid_ts, np.float32)})

    def get_num_of_video_patches(self, num_frames: int, height: int, width: int,
                                 videos_kwargs=None) -> int:
        """reference :340."""
        kw = videos_kwargs or {}
        factor = (kw.get("patch_size") or self.patch_size) * \
                 (kw.get("merge_size") or self.merge_size)
        rh, rw = smart_resize(height, width, factor,
                              kw.get("min_pixels") or self.size["shortest_edge"],
                              kw.get("max_pixels") or self.size["longest_edge"])
        p = kw.get("patch_size") or self.patch_size
        tps = kw.get("temporal_patch_size") or self.temporal_patch_size
        return (num_frames // tps) * (rh // p) * (rw // p)
