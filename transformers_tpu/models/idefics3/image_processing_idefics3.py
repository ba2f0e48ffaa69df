"""Idefics3 image processor (reference
models/idefics3/image_processing_idefics3.py): longest-edge resize (even
short side), resize to vision-encoder-size multiples, split into
``rows x cols`` crops + a square global view -> pixel_values
[B, max_frames, C, S, S] + pixel_attention_mask + rows/cols."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ... import image_transforms as T
from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
    BatchFeature,
    load_image,
)

MAX_IMAGE_SIZE = 4096


def _rescale_to_max_len(height, width, max_len):
    """reference _resize_output_size_rescale_to_max_len — longest edge to
    max_len, short side rounded up to even."""
    aspect = width / height
    if width >= height:
        width = max_len
        height = int(width / aspect)
        if height % 2 != 0:
            height += 1
    else:
        height = max_len
        width = int(height * aspect)
        if width % 2 != 0:
            width += 1
    return max(height, 1), max(width, 1)


def _scale_below_upper_bound(height, width, max_len):
    aspect = width / height
    if width >= height and width > max_len:
        width = max_len
        height = int(width / aspect)
    elif height > width and height > max_len:
        height = max_len
        width = int(height * aspect)
    return max(height, 1), max(width, 1)


def get_resize_output_size(height, width, resolution_max_side):
    h, w = _rescale_to_max_len(height, width, resolution_max_side)
    return _scale_below_upper_bound(h, w, MAX_IMAGE_SIZE)


class Idefics3ImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "pixel_attention_mask"]

    def __init__(self, do_image_splitting: bool = True, max_image_size=None,
                 do_pad: bool = True, **kwargs):
        kwargs.setdefault("size", {"longest_edge": 4 * 364})
        kwargs.setdefault("resample", "lanczos")
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)
        self.do_image_splitting = do_image_splitting
        self.max_image_size = max_image_size or {"longest_edge": 364}
        self.do_pad = do_pad

    def _resize(self, arr, th, tw):
        return np.asarray(T.resize(jnp.asarray(arr), (int(th), int(tw)),
                                   resample=self.resample))

    def resize_for_vision_encoder(self, arr, enc_size):
        """Round both dims UP to enc_size multiples (reference
        resize_for_vision_encoder)."""
        h, w = arr.shape[-2:]
        aspect = w / h
        if w >= h:
            w2 = math.ceil(w / enc_size) * enc_size
            h2 = math.ceil(int(w2 / aspect) / enc_size) * enc_size
        else:
            h2 = math.ceil(h / enc_size) * enc_size
            w2 = math.ceil(int(h2 * aspect) / enc_size) * enc_size
        return self._resize(arr, h2, w2)

    def split_image(self, arr):
        """-> (frames, rows, cols): grid crops + square global view
        (reference split_image)."""
        s = self.max_image_size["longest_edge"]
        h, w = arr.shape[-2:]
        frames = []
        if h > s or w > s:
            rows, cols = math.ceil(h / s), math.ceil(w / s)
            oh, ow = math.ceil(h / rows), math.ceil(w / cols)
            for r in range(rows):
                for c in range(cols):
                    frames.append(arr[..., r * oh:min((r + 1) * oh, h),
                                      c * ow:min((c + 1) * ow, w)])
            arr = self._resize(arr, s, s)
        else:
            rows, cols = 0, 0
        frames.append(arr)
        return frames, rows, cols

    def preprocess(self, images, return_tensors="jax", do_image_splitting=None,
                   **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        nested = isinstance(images[0], (list, tuple))
        images_list = images if nested else [[im] for im in images]
        split = (do_image_splitting if do_image_splitting is not None
                 else self.do_image_splitting)
        s = self.max_image_size["longest_edge"]

        all_rows, all_cols, per_sample = [], [], []
        for group in images_list:
            frames_out, rows_g, cols_g = [], [], []
            for image in group:
                arr = load_image(image).astype(np.float32)  # [C, H, W]
                if self.do_resize:
                    th, tw = get_resize_output_size(*arr.shape[-2:],
                                                    self.size["longest_edge"])
                    arr = self._resize(arr, th, tw)
                if split:
                    arr = self.resize_for_vision_encoder(arr, s)
                    frames, rows, cols = self.split_image(arr)
                else:
                    frames, rows, cols = [self._resize(arr, s, s)], 0, 0
                for f in frames:
                    if self.do_rescale:
                        f = f * self.rescale_factor
                    if self.do_normalize:
                        mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                        std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                        f = (f - mean) / std
                    frames_out.append(f)
                rows_g.append(rows)
                cols_g.append(cols)
            all_rows.append(rows_g)
            all_cols.append(cols_g)
            per_sample.append(frames_out)

        # pad frames per sample to the batch max; frames share (S, S) after
        # split (crops may be ragged only when rows*cols crops are uneven —
        # pad spatially to the max too)
        max_frames = max(len(fr) for fr in per_sample)
        mh = max(f.shape[-2] for fr in per_sample for f in fr)
        mw = max(f.shape[-1] for fr in per_sample for f in fr)
        batch, masks = [], []
        for frames in per_sample:
            padded, mask = [], []
            for f in frames:
                pm = np.zeros((mh, mw), np.int64)
                pm[:f.shape[-2], :f.shape[-1]] = 1
                padded.append(np.pad(f, ((0, 0), (0, mh - f.shape[-2]),
                                         (0, mw - f.shape[-1]))))
                mask.append(pm)
            while len(padded) < max_frames:
                padded.append(np.zeros((padded[0].shape[0], mh, mw), np.float32))
                mask.append(np.zeros((mh, mw), np.int64))
            batch.append(np.stack(padded))
            masks.append(np.stack(mask))
        pixel_values = np.stack(batch)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "pixel_attention_mask": np.stack(masks),
                             "rows": all_rows, "cols": all_cols})
