"""Native (C++) runtime components.

The reference delegates its tokenization hot loop to the Rust ``tokenizers``
crate (SURVEY §2.9); here the equivalent lives in-tree as C++
(``csrc/bpe.cpp``) built once with g++ into a cached shared library and
bound via ctypes. Everything degrades gracefully to the pure-Python engine
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

from ..utils import logging

logger = logging.get_logger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_library() -> Optional[str]:
    sources = [os.path.join(_CSRC, f) for f in sorted(os.listdir(_CSRC)) if f.endswith(".cpp")]
    if not sources:
        return None
    digest = hashlib.sha256()
    for s in sources:
        with open(s, "rb") as f:
            digest.update(f.read())
    cache_dir = os.environ.get("TTPU_NATIVE_CACHE",
                               os.path.join(tempfile.gettempdir(), "ttpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"libttpu_{digest.hexdigest()[:16]}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, *sources]
    # host image codecs (imgcodec.cpp): link the system libjpeg/libpng when
    # present; the source self-disables via __has_include otherwise
    for hdr, lib in (("/usr/include/jpeglib.h", "-ljpeg"),
                     ("/usr/include/png.h", "-lpng")):
        if os.path.exists(hdr):
            cmd.append(lib)
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except (OSError, subprocess.SubprocessError) as exc:
        logger.warning_once(f"native build failed ({exc}); using pure-Python fallbacks")
        return None
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TTPU_DISABLE_NATIVE"):
        return None
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ttpu_bpe_create.restype = ctypes.c_void_p
    lib.ttpu_bpe_create.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 3 + [ctypes.c_int32]
    lib.ttpu_bpe_free.argtypes = [ctypes.c_void_p]
    lib.ttpu_bpe_encode.restype = ctypes.c_int32
    lib.ttpu_bpe_encode.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    for name in ("ttpu_decode_jpeg", "ttpu_decode_png"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [u8p, ctypes.c_int64, u8p, i32p, i32p]
    lib.ttpu_img_has_jpeg.restype = ctypes.c_int32
    lib.ttpu_img_has_png.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


class NativeBPE:
    """id-space BPE encoder over the native library."""

    def __init__(self, merges: list[tuple[int, int, int]]):
        """merges: ordered (left_id, right_id, merged_id)."""
        import numpy as np

        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        n = len(merges)
        arr = np.asarray(merges, dtype=np.int32).reshape(n, 3) if n else np.zeros((0, 3), np.int32)
        lefts = np.ascontiguousarray(arr[:, 0])
        rights = np.ascontiguousarray(arr[:, 1])
        merged = np.ascontiguousarray(arr[:, 2])
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._handle = lib.ttpu_bpe_create(
            lefts.ctypes.data_as(i32p), rights.ctypes.data_as(i32p),
            merged.ctypes.data_as(i32p), n)

    def encode(self, ids: list[int]) -> list[int]:
        import numpy as np

        n = len(ids)
        if n <= 1:
            return list(ids)
        inp = np.asarray(ids, np.int32)
        out = np.empty(n, np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        count = self._lib.ttpu_bpe_encode(
            self._handle, inp.ctypes.data_as(i32p), n, out.ctypes.data_as(i32p))
        return out[:count].tolist()

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.ttpu_bpe_free(handle)
