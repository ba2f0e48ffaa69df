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
    "lanczos": "lanczos3",
    0: "nearest",      # PIL.Image.NEAREST
    1: "lanczos3",     # PIL.Image.LANCZOS
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
    # truncation, not rounding (reference image_transforms.py:299
    # get_resize_output_image_size)
    new_long = int(shortest_edge * long / short)
    if longest_edge is not None and new_long > longest_edge:
        new_short = int(longest_edge * new_short / new_long)
        new_long = longest_edge
    return (new_short, new_long) if height <= width else (new_long, new_short)


# --------------------------------------------------------------- PIL parity
# Exact replication of Pillow's fixed-point resample (libImaging/Resample.c):
# horizontal then vertical separable convolution; for 8-bit images the
# coefficients are rounded to 1<<PRECISION_BITS fixed point, accumulation is
# int32, and EACH pass rounds back to uint8 — this is why float resizes can
# never be bit-identical to PIL. Selectable as ``resample="pil-exact"`` for
# the parity suite (SURVEY §7 hard part #2); the fused jnp path stays the
# production default.

_PIL_PRECISION_BITS = 32 - 8 - 2  # Resample.c PRECISION_BITS


def _pil_filter(name: str):
    if name == "bilinear":
        return 1.0, lambda x: np.clip(1.0 - np.abs(x), 0.0, None)

    if name == "bicubic":  # Keys kernel, a = -0.5 (Resample.c bicubic_filter)
        def cubic(x):
            x = np.abs(x)
            a = -0.5
            return np.where(
                x < 1, ((a + 2) * x - (a + 3)) * x * x + 1,
                np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))
        return 2.0, cubic

    if name == "lanczos":  # Resample.c sinc_filter/lanczos_filter, support 3
        def lanczos(x):
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.sinc(x) * np.sinc(x / 3.0)
            return np.where(np.abs(x) < 3.0, out, 0.0)
        return 3.0, lanczos

    raise ValueError(f"pil-exact supports bilinear/bicubic/lanczos, got {name!r}")


def _pil_coeffs(in_size: int, out_size: int, filter_name: str,
                box: tuple[float, float] | None = None):
    """Per-output-pixel (xmin, int32 coeffs) exactly as precompute_coeffs +
    normalize_coeffs_8bpc. ``box=(in0, in1)`` restricts sampling to a
    fractional source window (Image.resize ``box`` support, used by the
    reducing_gap path)."""
    in0, in1 = box if box is not None else (0.0, float(in_size))
    support0, filt = _pil_filter(filter_name)
    scale = (in1 - in0) / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    bounds = np.empty((out_size, 2), np.int64)
    coeffs = np.zeros((out_size, ksize), np.int32)
    for xx in range(out_size):
        center = in0 + (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size) - xmin
        k = filt((np.arange(xmax) + xmin - center + 0.5) / filterscale)
        k = k / k.sum()
        # fixed point, round-half-away-from-zero (normalize_coeffs_8bpc)
        ik = np.where(k < 0, (k * (1 << _PIL_PRECISION_BITS) - 0.5),
                      (k * (1 << _PIL_PRECISION_BITS) + 0.5)).astype(np.int32)
        bounds[xx] = (xmin, xmax)
        coeffs[xx, :xmax] = ik
    return bounds, coeffs


def pil_reduce(img: np.ndarray, factor_h: int, factor_w: int) -> np.ndarray:
    """Bit-exact PIL ``Image.reduce`` on uint8 [..., H, W]: per-block integer
    average with Reduce.c's float32 fixed-point multiplier (division_UINT32)
    and amend = div/2; edge blocks average their partial extent."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = -(-h // factor_h), -(-w // factor_w)
    out = np.empty(img.shape[:-2] + (oh, ow), np.uint8)

    def block_avg(blk_sum, div):
        mult = int(np.float32((1 << 30) * 4.0) / np.float32((1 << 8) * div))
        return ((blk_sum + div // 2) * mult) >> 24

    # interior (full blocks) vectorized
    fh, fw = (h // factor_h) * factor_h, (w // factor_w) * factor_w
    if fh and fw:
        core = img[..., :fh, :fw].astype(np.uint64)
        core = core.reshape(*img.shape[:-2], fh // factor_h, factor_h,
                            fw // factor_w, factor_w).sum((-3, -1))
        out[..., :fh // factor_h, :fw // factor_w] = block_avg(
            core, factor_h * factor_w)
    # right edge / bottom edge / corner (partial blocks)
    if fw < w:
        edge = img[..., :fh, fw:].astype(np.uint64)
        ew = w - fw
        edge = edge.reshape(*img.shape[:-2], fh // factor_h, factor_h, ew).sum((-2, -1))
        out[..., :fh // factor_h, -1] = block_avg(edge, factor_h * ew)
    if fh < h:
        edge = img[..., fh:, :fw].astype(np.uint64)
        eh = h - fh
        edge = edge.reshape(*img.shape[:-2], eh, fw // factor_w, factor_w).sum((-3, -1))
        out[..., -1, :fw // factor_w] = block_avg(edge, eh * factor_w)
    if fh < h and fw < w:
        corner = img[..., fh:, fw:].astype(np.uint64).sum((-2, -1))
        out[..., -1, -1] = block_avg(corner, (h - fh) * (w - fw))
    return out


def _pil_pass(img: np.ndarray, out_size: int, axis: int, filter_name: str,
              box: tuple[float, float] | None = None) -> np.ndarray:
    """One uint8 fixed-point pass along ``axis`` of [..., H, W]."""
    img = np.moveaxis(img, axis, -1)
    in_size = img.shape[-1]
    bounds, coeffs = _pil_coeffs(in_size, out_size, filter_name, box)
    half = 1 << (_PIL_PRECISION_BITS - 1)
    out = np.empty(img.shape[:-1] + (out_size,), np.uint8)
    for xx in range(out_size):
        xmin, xmax = bounds[xx]
        acc = half + (img[..., xmin:xmin + xmax].astype(np.int64)
                      * coeffs[xx, :xmax].astype(np.int64)).sum(-1)
        out[..., xx] = np.clip(acc >> _PIL_PRECISION_BITS, 0, 255)
    return np.moveaxis(out, -1, axis)


def pil_nearest_indices(n_in: int, n_out: int) -> np.ndarray:
    """Source indices of PIL's NEAREST resize (Geometry.c
    ImagingScaleAffine): xo starts at a0/2 and ACCUMULATES a0 per pixel in
    double, then truncates — the accumulated rounding error is part of the
    observable mapping, so a closed-form (i+0.5)*scale does NOT match."""
    a0 = n_in / n_out
    xo = a0 * 0.5
    idx = np.empty((n_out,), np.int64)
    for i in range(n_out):
        idx[i] = int(xo)
        xo += a0
    return np.clip(idx, 0, n_in - 1)


def pil_exact_resize(image: np.ndarray, size: tuple[int, int],
                     resample: Union[str, int] = "bilinear",
                     reducing_gap: Optional[float] = None) -> np.ndarray:
    """Bit-for-bit PIL ``Image.resize(..., resample)`` on uint8 [..., H, W]
    arrays (Resample.c two-pass order: horizontal, then vertical).
    ``reducing_gap`` replicates Image.resize's pre-reduction: integer
    ``reduce()`` by factor int(in/out/gap), then a box-windowed resample over
    the fractional remainder."""
    name = {0: "nearest", 1: "lanczos", 2: "bilinear", 3: "bicubic"}.get(
        resample, resample)
    image = np.asarray(image, np.uint8)
    h, w = size
    if name == "nearest":
        ys = pil_nearest_indices(image.shape[-2], h)
        xs = pil_nearest_indices(image.shape[-1], w)
        return image[..., ys, :][..., :, xs]
    box = None
    if reducing_gap is not None:
        ih, iw = image.shape[-2], image.shape[-1]
        factor_w = int(iw / w / reducing_gap) or 1
        factor_h = int(ih / h / reducing_gap) or 1
        if factor_w > 1 or factor_h > 1:
            image = pil_reduce(image, factor_h, factor_w)
            box = (iw / factor_w, ih / factor_h)  # fractional source window
    bw, bh = box if box is not None else (image.shape[-1], image.shape[-2])
    if image.shape[-1] != w or bw != image.shape[-1]:
        image = _pil_pass(image, w, -1, name, (0.0, float(bw)))
    if image.shape[-2] != h or bh != image.shape[-2]:
        image = _pil_pass(image, h, -2, name, (0.0, float(bh)))
    return image


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
