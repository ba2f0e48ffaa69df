"""Image processor base + BatchFeature.

TPU-native analog of reference src/transformers/image_processing_base.py
(``ImageProcessingMixin.from_pretrained`` :85) + image_processing_utils.py
(``BaseImageProcessor`` :60, ``preprocess`` :383). Reads/writes the same
``preprocessor_config.json`` the reference uses (A.9 hub contract).

The compute path is jnp (fused resize+rescale+normalize on device); the host
only decodes bytes/PIL into uint8 arrays.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import image_transforms as T
from .utils import logging
from .utils.hub import cached_file

logger = logging.get_logger(__name__)

IMAGE_PROCESSOR_NAME = "preprocessor_config.json"

# Standard constants (reference image_utils.py)
IMAGENET_DEFAULT_MEAN = [0.485, 0.456, 0.406]
IMAGENET_DEFAULT_STD = [0.229, 0.224, 0.225]
IMAGENET_STANDARD_MEAN = [0.5, 0.5, 0.5]
IMAGENET_STANDARD_STD = [0.5, 0.5, 0.5]
OPENAI_CLIP_MEAN = [0.48145466, 0.4578275, 0.40821073]
OPENAI_CLIP_STD = [0.26862954, 0.26130258, 0.27577711]


class BatchFeature(dict):
    """dict of arrays with attribute access (reference
    feature_extraction_utils.py ``BatchFeature``)."""

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError:
            raise AttributeError(item)

    def convert_to_numpy(self):
        return BatchFeature({k: np.asarray(v) for k, v in self.items()})


def load_image(image) -> np.ndarray:
    """Decode any supported input to a uint8 [C, H, W] numpy array.

    Accepts PIL images, numpy arrays (HWC or CHW), jax arrays, file paths and
    URLs are resolved by the caller (pipelines) — this is the host-side decode
    boundary (reference image_utils.py load_image)."""
    try:
        from PIL import Image

        if isinstance(image, Image.Image):
            image = image.convert("RGB")
            arr = np.asarray(image)  # HWC uint8
            return arr.transpose(2, 0, 1)
    except ImportError:
        pass
    if isinstance(image, (bytes, bytearray)):
        from .image_codecs import decode_image

        return np.asarray(decode_image(bytes(image))).transpose(2, 0, 1)
    if isinstance(image, str):
        from .image_codecs import decode_image_file, native_codecs_available

        if native_codecs_available():
            try:
                return decode_image_file(image).transpose(2, 0, 1)
            except Exception:  # noqa: BLE001 — exotic containers -> PIL
                pass
        from PIL import Image

        with Image.open(image) as im:
            return load_image(im)
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3)
    elif arr.ndim == 3 and arr.shape[-1] in (1, 3, 4) and arr.shape[0] not in (1, 3, 4):
        arr = arr.transpose(2, 0, 1)
    if arr.shape[0] == 4:
        arr = arr[:3]
    elif arr.shape[0] == 1:
        arr = np.concatenate([arr] * 3)
    return arr


def _center_crop_or_pad(arr: np.ndarray, ch: int, cw: int) -> np.ndarray:
    """Torchvision-compatible center crop that zero-pads when the target
    exceeds the image (reference center_crop semantics)."""
    h, w = arr.shape[-2], arr.shape[-1]
    pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
    if pad_h or pad_w:
        top, left = (ch - h) // 2, (cw - w) // 2
        pads = [(0, 0)] * (arr.ndim - 2) + [
            (max(top, 0), max(ch - h - max(top, 0), 0)),
            (max(left, 0), max(cw - w - max(left, 0), 0))]
        arr = np.pad(arr, pads)
        h, w = arr.shape[-2], arr.shape[-1]
    top = (h - ch) // 2
    left = (w - cw) // 2
    return arr[..., top:top + ch, left:left + cw]


class BaseImageProcessor:
    """Serialization + the resize/rescale/normalize pipeline. Subclasses set
    defaults and may override ``preprocess``."""

    model_input_names = ["pixel_values"]

    def __init__(
        self,
        do_resize: bool = True,
        size: Optional[dict] = None,
        resample: Union[str, int] = "bilinear",
        do_center_crop: bool = False,
        crop_size: Optional[dict] = None,
        do_rescale: bool = True,
        rescale_factor: float = 1.0 / 255.0,
        do_normalize: bool = True,
        image_mean: Optional[list] = None,
        image_std: Optional[list] = None,
        do_convert_rgb: Optional[bool] = None,
        **kwargs,
    ):
        self.do_resize = do_resize
        self.size = size or {"height": 224, "width": 224}
        self.resample = resample
        self.do_center_crop = do_center_crop
        self.crop_size = crop_size
        self.do_rescale = do_rescale
        self.rescale_factor = rescale_factor
        self.do_normalize = do_normalize
        self.image_mean = image_mean if image_mean is not None else IMAGENET_STANDARD_MEAN
        self.image_std = image_std if image_std is not None else IMAGENET_STANDARD_STD
        self.do_convert_rgb = do_convert_rgb
        for k, v in kwargs.items():
            if not k.startswith("_") and k not in ("image_processor_type", "processor_class"):
                setattr(self, k, v)

    # ------------------------------------------------------------------ IO
    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, **kwargs) -> "BaseImageProcessor":
        resolved = cached_file(str(pretrained_model_name_or_path), IMAGE_PROCESSOR_NAME)
        with open(resolved, encoding="utf-8") as f:
            config = json.load(f)
        config.update(kwargs)
        return cls(**config)

    def save_pretrained(self, save_directory) -> None:
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, IMAGE_PROCESSOR_NAME), "w", encoding="utf-8") as f:
            f.write(self.to_json_string())

    def to_dict(self) -> dict:
        out = copy.deepcopy({k: v for k, v in self.__dict__.items() if not k.startswith("_")})
        out["image_processor_type"] = type(self).__name__
        return out

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True, default=str) + "\n"

    # ------------------------------------------------------------- pipeline
    def resize_size(self, height: int, width: int) -> tuple[int, int]:
        size = self.size
        if "height" in size:
            return (size["height"], size["width"])
        if "shortest_edge" in size:
            return T.get_resize_output_size(height, width, size["shortest_edge"],
                                            size.get("longest_edge"))
        raise ValueError(f"Unsupported size dict {size}")

    # -------------------------------------------------- segmentation labels
    def reduce_label(self, label: np.ndarray) -> np.ndarray:
        """ADE-convention label reduction (reference
        models/segformer/image_processing_segformer.py:138): background 0
        becomes ignore-255 and classes shift down by one."""
        label = label.astype(np.int64)
        label = np.where(label == 0, 255, label - 1)
        return np.where(label == 254, 255, label)

    def _process_segmentation_maps(self, segmentation_maps) -> np.ndarray:
        if not isinstance(segmentation_maps, (list, tuple)):
            segmentation_maps = [segmentation_maps]
        out = []
        for seg in segmentation_maps:
            seg = np.asarray(seg)
            if seg.ndim == 3:
                seg = seg[0] if seg.shape[0] == 1 else seg[..., 0]
            if getattr(self, "do_reduce_labels", False):
                seg = self.reduce_label(seg)
            if self.do_resize:
                th, tw = self.resize_size(*seg.shape[-2:])
                # PIL-exact nearest keeps label ids intact
                seg = seg[T.pil_nearest_indices(seg.shape[0], th)][
                    :, T.pil_nearest_indices(seg.shape[1], tw)]
            out.append(seg.astype(np.int64))
        return np.stack(out)

    def preprocess(self, images, return_tensors: Optional[str] = "jax",
                   pil_exact: bool = False, segmentation_maps=None,
                   **kwargs) -> BatchFeature:
        """reference image_processing_utils.py:383. Group-by-shape batching:
        same-shape inputs are stacked and processed in one device call
        (reference image_processing_backends.py:176-200).

        ``pil_exact=True`` (or ``resample="pil-exact"``) routes resizing
        through the bit-for-bit PIL fixed-point path
        (image_transforms.pil_exact_resize) and runs rescale/normalize with
        the reference's exact host dtype sequence — the parity mode SURVEY
        §7 hard part #2 calls for. The fused device path stays the default."""
        if not isinstance(images, (list, tuple)):
            images = [images]
        arrays = [load_image(im) for im in images]
        if pil_exact or self.resample == "pil-exact":
            out = [self._process_exact(a) for a in arrays]
            pixel_values = np.stack(out)
            if return_tensors == "jax":
                pixel_values = jnp.asarray(pixel_values)
            feat = BatchFeature({"pixel_values": pixel_values})
            if segmentation_maps is not None:
                feat["labels"] = self._process_segmentation_maps(segmentation_maps)
            return feat

        # group by (H, W) so each group is one fused device program
        groups: dict[tuple, list[int]] = {}
        for i, arr in enumerate(arrays):
            groups.setdefault(arr.shape, []).append(i)

        out = [None] * len(arrays)
        jitted = getattr(self, "_jitted_process", None)
        if jitted is None:
            # ONE fused XLA program per input shape (resize + rescale +
            # normalize + crop fuse into a single kernel launch; jit caches
            # per shape) — the reference needs torchvision C++ ops for this
            # (SURVEY 2.9); on TPU the compiler does the fusion.
            jitted = jax.jit(self._process_batch)
            self._jitted_process = jitted
        for shape, idxs in groups.items():
            batch = jnp.asarray(np.stack([arrays[i] for i in idxs]))
            processed = jitted(batch)
            for j, i in enumerate(idxs):
                out[i] = processed[j]
        pixel_values = jnp.stack(out)
        if return_tensors in ("np", "numpy"):
            pixel_values = np.asarray(pixel_values)
        feat = BatchFeature({"pixel_values": pixel_values})
        if segmentation_maps is not None:
            feat["labels"] = self._process_segmentation_maps(segmentation_maps)
        return feat

    def post_process_semantic_segmentation(self, outputs, target_sizes=None):
        """Logits -> per-image [H, W] class-id maps (reference
        models/segformer/image_processing_segformer.py:192)."""
        logits = np.asarray(outputs.logits if hasattr(outputs, "logits") else outputs)
        maps = []
        for i in range(logits.shape[0]):
            seg = logits[i]  # [C, h, w]
            if target_sizes is not None:
                th, tw = target_sizes[i]
                seg = np.asarray(T.resize(jnp.asarray(seg), (int(th), int(tw)),
                                          resample="bilinear", antialias=False))
            maps.append(seg.argmax(0))
        return maps

    def _process_exact(self, arr: np.ndarray) -> np.ndarray:
        """Host parity pipeline on one uint8 [C, H, W] image: PIL-bit-exact
        resize, then the reference slow processor's exact dtype sequence
        (rescale in float64 -> float32, normalize in float32; reference
        image_transforms.py rescale/normalize)."""
        filt = {2: "bilinear", 3: "bicubic", "pil-exact": "bilinear"}.get(
            self.resample, self.resample)
        if self.do_resize:
            h, w = arr.shape[-2], arr.shape[-1]
            arr = T.pil_exact_resize(arr, self.resize_size(h, w), filt)
        if self.do_center_crop and self.crop_size:
            arr = _center_crop_or_pad(arr, self.crop_size["height"],
                                      self.crop_size["width"])
        x = arr
        if self.do_rescale:
            x = (x.astype(np.float64) * self.rescale_factor).astype(np.float32)
        if self.do_normalize:
            mean = np.array(self.image_mean, np.float32)
            std = np.array(self.image_std, np.float32)
            x = ((x.astype(np.float32).T - mean) / std).T
        return np.ascontiguousarray(x, np.float32)

    def _process_batch(self, batch: jnp.ndarray) -> jnp.ndarray:
        x = batch.astype(jnp.float32)
        if self.do_rescale:
            x = T.rescale(x, self.rescale_factor)
        if self.do_resize:
            h, w = x.shape[-2], x.shape[-1]
            x = T.resize(x, self.resize_size(h, w), resample=self.resample)
        if self.do_center_crop and self.crop_size:
            x = T.center_crop(x, (self.crop_size["height"], self.crop_size["width"]))
        if self.do_normalize:
            x = T.normalize(x, self.image_mean, self.image_std)
        return x

    def __call__(self, images, **kwargs) -> BatchFeature:
        return self.preprocess(images, **kwargs)
