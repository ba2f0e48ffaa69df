"""Functional image transforms on device.

TPU-native analog of reference src/transformers/image_transforms.py +
image_processing_backends.py:86 (``TorchvisionBackend``): resize / rescale /
normalize / center-crop as pure jnp functions that fuse into ONE XLA program
(the north-star "preprocessing on device" requirement — SURVEY §7). Host work
is limited to decode (PIL/bytes -> uint8 array).

``resize`` matches torchvision/PIL antialiased bilinear/bicubic via
``jax.image.resize`` (same separable triangle/cubic filters).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# torchvision InterpolationMode analog
RESAMPLE_TO_METHOD = {
    "nearest": "nearest",
    "bilinear": "linear",
    "bicubic": "cubic",
    0: "nearest",      # PIL.Image.NEAREST
    2: "linear",       # PIL.Image.BILINEAR
    3: "cubic",        # PIL.Image.BICUBIC
}


def to_channel_first(images: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] -> [..., C, H, W] if needed (3-channel heuristic,
    reference image_utils.py infer_channel_dimension_format)."""
    if images.shape[-1] in (1, 3, 4) and images.shape[-3] not in (1, 3, 4):
        return jnp.moveaxis(images, -1, -3)
    return images


def resize(
    images: jnp.ndarray,  # [..., C, H, W]
    size: tuple[int, int],
    resample: Union[str, int] = "bilinear",
    antialias: bool = True,
) -> jnp.ndarray:
    method = RESAMPLE_TO_METHOD.get(resample, resample)
    out_shape = images.shape[:-2] + tuple(size)
    return jax.image.resize(images, out_shape, method=method, antialias=antialias)


def rescale(images: jnp.ndarray, scale: float) -> jnp.ndarray:
    return images.astype(jnp.float32) * scale


def normalize(images: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32).reshape(-1, 1, 1)
    std = jnp.asarray(std, jnp.float32).reshape(-1, 1, 1)
    return (images.astype(jnp.float32) - mean) / std


def center_crop(images: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Torchvision-compatible center crop (pads when smaller)."""
    h, w = images.shape[-2], images.shape[-1]
    ch, cw = size
    top = (h - ch) // 2
    left = (w - cw) // 2
    if top >= 0 and left >= 0:
        return images[..., top : top + ch, left : left + cw]
    pad_top = max(-top, 0)
    pad_left = max(-left, 0)
    pad = [(0, 0)] * (images.ndim - 2) + [
        (pad_top, max(ch - h - pad_top, 0)),
        (pad_left, max(cw - w - pad_left, 0)),
    ]
    padded = jnp.pad(images, pad)
    top = max(top, 0) if top >= 0 else 0
    left = max(left, 0) if left >= 0 else 0
    return padded[..., top : top + ch, left : left + cw]


def get_resize_output_size(height: int, width: int, shortest_edge: int,
                           longest_edge: Optional[int] = None) -> tuple[int, int]:
    """Aspect-preserving size from a shortest-edge spec (reference
    image_processing_utils.py get_size_dict conventions)."""
    short, long = (height, width) if height <= width else (width, height)
    new_short = shortest_edge
    new_long = int(round(shortest_edge * long / short))
    if longest_edge is not None and new_long > longest_edge:
        new_long = longest_edge
        new_short = int(round(longest_edge * short / long))
    return (new_short, new_long) if height <= width else (new_long, new_short)


@partial(jax.jit, static_argnames=("size", "resample", "do_rescale", "do_normalize", "antialias"))
def fused_resize_rescale_normalize(
    images: jnp.ndarray,  # [B, C, H, W] uint8/float
    *,
    size: tuple[int, int],
    mean: jnp.ndarray,
    std: jnp.ndarray,
    rescale_factor: float = 1.0 / 255.0,
    resample: str = "bilinear",
    do_rescale: bool = True,
    do_normalize: bool = True,
    antialias: bool = True,
) -> jnp.ndarray:
    """The hot path: one jitted program for the whole preprocess pipeline
    (the reference needs torchvision C++ ops; XLA fuses these into the model's
    first convolution input)."""
    x = images.astype(jnp.float32)
    if do_rescale:
        x = x * rescale_factor
    x = resize(x, size, resample=resample, antialias=antialias)
    if do_normalize:
        x = (x - mean.reshape(-1, 1, 1)) / std.reshape(-1, 1, 1)
    return x
