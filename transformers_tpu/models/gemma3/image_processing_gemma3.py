"""Gemma3 image processor (reference
models/gemma3/image_processing_gemma3.py): fixed 224x224 bilinear resize +
optional pan-and-scan cropping — exaggerated aspect ratios are cut into
[2, max_num_crops] crops that ride along with the thumbnail; ``num_crops``
per input image is returned for the processor's token accounting."""

from __future__ import annotations

import itertools
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


class Gemma3ImageProcessor(BaseImageProcessor):
    model_input_names = ["pixel_values", "num_crops"]

    def __init__(self, do_pan_and_scan=None, pan_and_scan_min_crop_size=None,
                 pan_and_scan_max_num_crops=None,
                 pan_and_scan_min_ratio_to_activate=None, **kwargs):
        kwargs.setdefault("size", {"height": 224, "width": 224})
        kwargs.setdefault("resample", "bilinear")
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)
        self.do_pan_and_scan = do_pan_and_scan
        self.pan_and_scan_min_crop_size = pan_and_scan_min_crop_size
        self.pan_and_scan_max_num_crops = pan_and_scan_max_num_crops
        self.pan_and_scan_min_ratio_to_activate = pan_and_scan_min_ratio_to_activate

    def pan_and_scan(self, image: np.ndarray, min_crop_size: int,
                     max_num_crops: int, min_ratio_to_activate: float):
        """image [C, H, W] -> list of crops (reference pan_and_scan_batched)."""
        height, width = image.shape[-2:]
        if width >= height:
            if width / height < min_ratio_to_activate:
                return []
            num_crops_w = int(math.floor(width / height + 0.5))
            num_crops_w = min(int(math.floor(width / min_crop_size)), num_crops_w)
            num_crops_w = max(2, num_crops_w)
            num_crops_w = min(max_num_crops, num_crops_w)
            num_crops_h = 1
        else:
            if height / width < min_ratio_to_activate:
                return []
            num_crops_h = int(math.floor(height / width + 0.5))
            num_crops_h = min(int(math.floor(height / min_crop_size)), num_crops_h)
            num_crops_h = max(2, num_crops_h)
            num_crops_h = min(max_num_crops, num_crops_h)
            num_crops_w = 1
        crop_size_w = int(math.ceil(width / num_crops_w))
        crop_size_h = int(math.ceil(height / num_crops_h))
        if min(crop_size_w, crop_size_h) < min_crop_size:
            return []
        pos_w = [crop_size_w * i for i in range(num_crops_w)]
        pos_h = [crop_size_h * i for i in range(num_crops_h)]
        return [image[..., ph:ph + crop_size_h, pw:pw + crop_size_w]
                for ph, pw in itertools.product(pos_h, pos_w)]

    def preprocess(self, images, return_tensors="jax", do_pan_and_scan=None,
                   pan_and_scan_min_crop_size=None, pan_and_scan_max_num_crops=None,
                   pan_and_scan_min_ratio_to_activate=None, **kwargs) -> BatchFeature:
        if not isinstance(images, (list, tuple)):
            images = [images]
        do_pas = (do_pan_and_scan if do_pan_and_scan is not None
                  else self.do_pan_and_scan)
        mn = pan_and_scan_min_crop_size or self.pan_and_scan_min_crop_size
        mx = pan_and_scan_max_num_crops or self.pan_and_scan_max_num_crops
        ratio = (pan_and_scan_min_ratio_to_activate
                 or self.pan_and_scan_min_ratio_to_activate)

        th, tw = self.size["height"], self.size["width"]
        outs, num_crops = [], []
        for image in images:
            arr = load_image(image).astype(np.float32)  # [C, H, W]
            crops = (self.pan_and_scan(arr, mn, mx, ratio) if do_pas else [])
            num_crops.append(len(crops))
            for piece in [arr] + crops:
                if self.do_resize:
                    piece = np.asarray(T.resize(jnp.asarray(piece), (th, tw),
                                                resample=self.resample))
                if self.do_rescale:
                    piece = piece * self.rescale_factor
                if self.do_normalize:
                    mean = np.asarray(self.image_mean, np.float32).reshape(-1, 1, 1)
                    std = np.asarray(self.image_std, np.float32).reshape(-1, 1, 1)
                    piece = (piece - mean) / std
                outs.append(piece)
        pixel_values = np.stack(outs)
        if return_tensors == "jax":
            pixel_values = jnp.asarray(pixel_values)
        return BatchFeature({"pixel_values": pixel_values,
                             "num_crops": np.asarray(num_crops, np.int64)})
