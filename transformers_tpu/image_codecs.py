"""Host image decode without PIL (SURVEY §2.9 torchvision/PIL rows).

``decode_image(data)`` sniffs the container (JPEG/PNG magic) and decodes
through the in-tree C++ shim (native/csrc/imgcodec.cpp: libjpeg(-turbo) +
libpng). PIL remains only the fallback when the native library or codec is
unavailable — the serving path never imports it when the shim is live."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .native import get_lib
from .utils import logging

logger = logging.get_logger(__name__)


def _native_decode(fn, data: bytes) -> Optional[np.ndarray]:
    buf = np.frombuffer(data, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = fn(buf.ctypes.data_as(u8p), len(data), None,
            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = fn(buf.ctypes.data_as(u8p), len(data), out.ctypes.data_as(u8p),
            ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return out


def native_codecs_available() -> bool:
    lib = get_lib()
    return bool(lib is not None and lib.ttpu_img_has_jpeg()
                and lib.ttpu_img_has_png())


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> RGB uint8 [H, W, 3]. JPEG/PNG ride the native shim; other
    containers (or a codec-less build) fall back to PIL."""
    lib = get_lib()
    if lib is not None:
        if data[:2] == b"\xff\xd8" and lib.ttpu_img_has_jpeg():
            out = _native_decode(lib.ttpu_decode_jpeg, data)
            if out is not None:
                return out
        if data[:8] == b"\x89PNG\r\n\x1a\n" and lib.ttpu_img_has_png():
            out = _native_decode(lib.ttpu_decode_png, data)
            if out is not None:
                return out
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"))


def decode_image_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_image(f.read())
