"""Donut image processor (reference models/donut/image_processing_donut.py):
optional long-axis rotation (:83-98), shortest-edge fit resize, thumbnail
shrink (:126-148), center pad to the fixed canvas (:100-121). Nougat reuses
the same pipeline at 896x672 (reference models/nougat/)."""

from __future__ import annotations

import numpy as np

from ...image_processing_utils import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    BaseImageProcessor,
)
from ... import image_transforms as T


class DonutImageProcessor(BaseImageProcessor):
    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 2560, "width": 1920})
        kwargs.setdefault("do_thumbnail", True)
        kwargs.setdefault("do_align_long_axis", False)
        kwargs.setdefault("do_pad", True)
        kwargs.setdefault("image_mean", IMAGENET_STANDARD_MEAN)
        kwargs.setdefault("image_std", IMAGENET_STANDARD_STD)
        super().__init__(**kwargs)

    def _canvas(self) -> tuple[int, int]:
        return self.size["height"], self.size["width"]

    def _process_exact(self, arr):
        oh, ow = self._canvas()
        h, w = arr.shape[-2:]
        if self.do_align_long_axis and ((ow < oh and w > h) or (ow > oh and w < h)):
            arr = np.rot90(arr, 3, axes=(-2, -1))
            h, w = arr.shape[-2:]
        if self.do_resize:
            short = min(oh, ow)
            filt = {2: "bilinear", 3: "bicubic"}.get(self.resample, self.resample)
            arr = T.pil_exact_resize(arr, T.get_resize_output_size(h, w, short), filt)
        if self.do_thumbnail:
            arr = self._thumbnail_exact(arr)
        if self.do_pad:
            # pad the RAW image before rescale/normalize (reference
            # _preprocess order: align -> resize -> thumbnail -> pad, then
            # rescale+normalize)
            arr = self._pad_canvas(arr)
        x = (arr.astype(np.float64) * self.rescale_factor).astype(np.float32)
        if self.do_normalize:
            mean = np.array(self.image_mean, np.float32)
            std = np.array(self.image_std, np.float32)
            x = ((x.T - mean) / std).T
        return np.ascontiguousarray(x, np.float32)

    def _thumbnail_exact(self, arr):
        oh, ow = self._canvas()
        h, w = arr.shape[-2:]
        th, tw = min(h, oh), min(w, ow)
        if th == h and tw == w:
            return arr
        if h > w:
            tw = int(w * th / h)
        elif w > h:
            th = int(h * tw / w)
        filt = {2: "bilinear", 3: "bicubic"}.get(self.resample, self.resample)
        # reference thumbnail resizes with reducing_gap=2.0 (PIL pre-reduce)
        return T.pil_exact_resize(arr, (th, tw), filt, reducing_gap=2.0)

    def _pad_canvas(self, x):
        oh, ow = self._canvas()
        dh, dw = oh - x.shape[-2], ow - x.shape[-1]
        top, left = dh // 2, dw // 2
        return np.pad(x, [(0, 0)] * (x.ndim - 2)
                      + [(top, dh - top), (left, dw - left)])

    def preprocess(self, images, return_tensors="jax", **kwargs):
        # the full pipeline is shape-dependent host logic; run the exact
        # path for every input and stack (device transfer happens once)
        kwargs["pil_exact"] = True
        return super().preprocess(images, return_tensors=return_tensors, **kwargs)


class NougatImageProcessor(DonutImageProcessor):
    """reference models/nougat/image_processing_nougat.py: 896x672 canvas,
    ImageNet-default statistics, plus whitespace-margin cropping
    (``crop_margin``) before the donut pipeline."""

    def __init__(self, **kwargs):
        kwargs.setdefault("size", {"height": 896, "width": 672})
        kwargs.setdefault("do_crop_margin", True)
        kwargs.setdefault("image_mean", [0.485, 0.456, 0.406])
        kwargs.setdefault("image_std", [0.229, 0.224, 0.225])
        super().__init__(**kwargs)

    def crop_margin(self, arr: np.ndarray, gray_threshold: int = 200) -> np.ndarray:
        """Crop gray margins (reference crop_margin): PIL 'L' luma (fixed
        point 19595/38470/7471 >> 16), min-max normalize, bounding box of
        pixels darker than the threshold."""
        r, g, b = arr[0].astype(np.uint32), arr[1].astype(np.uint32), arr[2].astype(np.uint32)
        luma = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)
        lo, hi = int(luma.min()), int(luma.max())
        if hi == lo:
            return arr
        data = (luma.astype(np.float64) - lo) / (hi - lo) * 255
        ys, xs = np.nonzero(data < gray_threshold)
        if ys.size == 0:
            return arr
        y0, y1 = int(ys.min()), int(ys.max()) + 1
        x0, x1 = int(xs.min()), int(xs.max()) + 1
        return arr[:, y0:y1, x0:x1]

    def _process_exact(self, arr):
        if getattr(self, "do_crop_margin", False):
            arr = self.crop_margin(arr)
        return super()._process_exact(arr)
