"""Pure-Python safetensors reader/writer (mmap, zero-copy reads).

TPU-native replacement for the Rust ``safetensors`` dependency the reference
binds at src/transformers/modeling_utils.py:319 (``load_state_dict``). The
format is: 8-byte little-endian u64 header size, JSON header mapping tensor
name -> {"dtype", "shape", "data_offsets"}, then a flat byte buffer. Reads are
served from an ``mmap`` so only the tensors actually materialized touch RAM;
each tensor becomes a numpy view that ``jax.device_put`` can consume directly
(bfloat16 and fp8 via ``ml_dtypes``).
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Iterator, Optional

import ml_dtypes
import numpy as np

_DTYPE_MAP = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "U64": np.dtype(np.uint64),
    "BOOL": np.dtype(np.bool_),
}
_DTYPE_MAP_INV = {v: k for k, v in _DTYPE_MAP.items()}


class SafetensorsFile:
    """A lazily-mapped safetensors file. Use as a context manager or call close()."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        header_size = struct.unpack("<Q", self._file.read(8))[0]
        header_bytes = self._file.read(header_size)
        header = json.loads(header_bytes)
        self.metadata: dict = header.pop("__metadata__", {})
        self._entries: dict[str, dict] = header
        self._data_start = 8 + header_size
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)

    def keys(self) -> list[str]:
        return list(self._entries.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def get_shape(self, name: str) -> tuple[int, ...]:
        return tuple(self._entries[name]["shape"])

    def get_dtype(self, name: str) -> np.dtype:
        return _DTYPE_MAP[self._entries[name]["dtype"]]

    def get_tensor(self, name: str) -> np.ndarray:
        """Zero-copy numpy view into the mmap for tensor ``name``."""
        entry = self._entries[name]
        dtype = _DTYPE_MAP[entry["dtype"]]
        shape = tuple(entry["shape"])
        start, end = entry["data_offsets"]
        buf = memoryview(self._mmap)[self._data_start + start : self._data_start + end]
        arr = np.frombuffer(buf, dtype=dtype)
        return arr.reshape(shape)

    def get_slice_rows(self, name: str, row_start: int, row_end: int) -> np.ndarray:
        """Read a contiguous leading-axis slice without touching the rest."""
        entry = self._entries[name]
        dtype = _DTYPE_MAP[entry["dtype"]]
        shape = tuple(entry["shape"])
        row_bytes = int(np.prod(shape[1:], dtype=np.int64)) * dtype.itemsize if len(shape) > 0 else dtype.itemsize
        start, _ = entry["data_offsets"]
        s = self._data_start + start + row_start * row_bytes
        e = self._data_start + start + row_end * row_bytes
        buf = memoryview(self._mmap)[s:e]
        return np.frombuffer(buf, dtype=dtype).reshape((row_end - row_start,) + shape[1:])

    def items(self) -> Iterator[tuple[str, np.ndarray]]:
        for name in self._entries:
            yield name, self.get_tensor(name)

    def close(self):
        if getattr(self, "_mmap", None) is not None:
            try:
                self._mmap.close()
            except BufferError:
                # Zero-copy views are still alive; the mapping is refcounted
                # and will be released when the last view is collected.
                pass
            else:
                self._mmap = None
        if getattr(self, "_file", None) is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def safe_open(path: str) -> SafetensorsFile:
    return SafetensorsFile(path)


def load_file(path: str) -> dict[str, np.ndarray]:
    """Load every tensor in a file (views into one shared mmap)."""
    f = SafetensorsFile(path)
    return {k: f.get_tensor(k) for k in f.keys()}


def _to_numpy(t) -> np.ndarray:
    """Accept numpy / jax arrays (and torch tensors for interop tests)."""
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "__array__"):
        try:
            return np.asarray(t)
        except TypeError:
            pass
    # jax bfloat16 arrays support np.asarray directly; torch bf16 does not.
    if type(t).__module__.startswith("torch"):
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            return t.float().numpy().astype(ml_dtypes.bfloat16)
        return t.numpy()
    return np.asarray(t)


def save_file(tensors: dict[str, np.ndarray], path: str, metadata: Optional[dict] = None) -> None:
    """Write a safetensors file readable by the Rust implementation."""
    header: dict[str, dict] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    arrays: list[np.ndarray] = []
    for name, t in tensors.items():
        raw = _to_numpy(t)
        # np.ascontiguousarray promotes 0-d to 1-d; restore the true shape
        arr = np.ascontiguousarray(raw).reshape(np.shape(raw))
        if arr.dtype not in _DTYPE_MAP_INV:
            raise ValueError(f"Unsupported dtype {arr.dtype} for tensor {name}")
        nbytes = arr.nbytes
        header[name] = {
            "dtype": _DTYPE_MAP_INV[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        arrays.append(arr)
        offset += nbytes
    header_bytes = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # Pad header to 8-byte alignment (spec allows trailing spaces).
    pad = (8 - (len(header_bytes) % 8)) % 8
    header_bytes += b" " * pad
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for arr in arrays:
            f.write(arr.tobytes())
    os.replace(tmp, path)
