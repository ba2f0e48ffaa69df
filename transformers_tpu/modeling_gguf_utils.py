"""GGUF checkpoint reading.

TPU-native analog of reference src/transformers/modeling_gguf_pytorch_utils.py
(:816 ``load_gguf_checkpoint``): parse the GGUF binary format (v2/v3),
dequantize supported tensor types, and map llama.cpp tensor names back to hub
parameter names so ``from_pretrained`` can consume GGUF files directly.

Supported tensor types: F32, F16, BF16, Q8_0 (block dequant).
"""

from __future__ import annotations

import struct
from typing import Any, Optional

import numpy as np

from .utils import logging

logger = logging.get_logger(__name__)

GGUF_MAGIC = b"GGUF"

# ggml type ids
GGML_F32, GGML_F16 = 0, 1
GGML_Q8_0 = 8
GGML_BF16 = 30

_VALUE_READERS = {}


def _read_str(f) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f, vtype: int):
    if vtype == 0:
        return struct.unpack("<B", f.read(1))[0]
    if vtype == 1:
        return struct.unpack("<b", f.read(1))[0]
    if vtype == 2:
        return struct.unpack("<H", f.read(2))[0]
    if vtype == 3:
        return struct.unpack("<h", f.read(2))[0]
    if vtype == 4:
        return struct.unpack("<I", f.read(4))[0]
    if vtype == 5:
        return struct.unpack("<i", f.read(4))[0]
    if vtype == 6:
        return struct.unpack("<f", f.read(4))[0]
    if vtype == 7:
        return bool(struct.unpack("<B", f.read(1))[0])
    if vtype == 8:
        return _read_str(f)
    if vtype == 9:  # array
        (elem_type,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, elem_type) for _ in range(n)]
    if vtype == 10:
        return struct.unpack("<Q", f.read(8))[0]
    if vtype == 11:
        return struct.unpack("<q", f.read(8))[0]
    if vtype == 12:
        return struct.unpack("<d", f.read(8))[0]
    raise ValueError(f"Unknown gguf value type {vtype}")


def _dequant_q8_0(raw: bytes, n_elements: int) -> np.ndarray:
    """Q8_0: blocks of (f16 scale, 32 x int8)."""
    block = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 34)
    scale = block[:, :2].copy().view(np.float16).astype(np.float32)  # [nb, 1]
    q = block[:, 2:].copy().view(np.int8).astype(np.float32)         # [nb, 32]
    out = (q * scale).reshape(-1)
    return out[:n_elements]


# llama.cpp -> hub name mapping (reference GGUF_TENSOR_MAPPING for llama)
_LLAMA_NAME_MAP = [
    ("token_embd.weight", "model.embed_tokens.weight"),
    ("output_norm.weight", "model.norm.weight"),
    ("output.weight", "lm_head.weight"),
]
_LLAMA_BLOCK_MAP = [
    ("attn_norm.weight", "input_layernorm.weight"),
    ("attn_q.weight", "self_attn.q_proj.weight"),
    ("attn_k.weight", "self_attn.k_proj.weight"),
    ("attn_v.weight", "self_attn.v_proj.weight"),
    ("attn_output.weight", "self_attn.o_proj.weight"),
    ("ffn_norm.weight", "post_attention_layernorm.weight"),
    ("ffn_gate.weight", "mlp.gate_proj.weight"),
    ("ffn_up.weight", "mlp.up_proj.weight"),
    ("ffn_down.weight", "mlp.down_proj.weight"),
]


def map_gguf_name(name: str) -> Optional[str]:
    for src, dst in _LLAMA_NAME_MAP:
        if name == src:
            return dst
    if name.startswith("blk."):
        _, idx, rest = name.split(".", 2)
        for src, dst in _LLAMA_BLOCK_MAP:
            if rest == src:
                return f"model.layers.{idx}.{dst}"
    return None


def load_gguf_checkpoint(path: str, return_tensors: bool = True) -> dict:
    """Parse a GGUF file -> {"metadata": {...}, "tensors": {hub_name: np}}."""
    with open(path, "rb") as f:
        if f.read(4) != GGUF_MAGIC:
            raise ValueError(f"{path} is not a GGUF file")
        (version,) = struct.unpack("<I", f.read(4))
        if version not in (2, 3):
            raise ValueError(f"Unsupported GGUF version {version}")
        (n_tensors,) = struct.unpack("<q", f.read(8))
        (n_kv,) = struct.unpack("<q", f.read(8))
        metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            metadata[key] = _read_value(f, vtype)
        infos = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (n_dims,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
            (ttype,) = struct.unpack("<I", f.read(4))
            (offset,) = struct.unpack("<Q", f.read(8))
            infos.append((name, dims, ttype, offset))
        alignment = metadata.get("general.alignment", 32)
        data_start = f.tell()
        data_start += (-data_start) % alignment

        tensors: dict[str, np.ndarray] = {}
        if return_tensors:
            for name, dims, ttype, offset in infos:
                # gguf dims are stored innermost-first; numpy wants reversed
                shape = tuple(reversed(dims))
                n = int(np.prod(dims))
                f.seek(data_start + offset)
                if ttype == GGML_F32:
                    arr = np.frombuffer(f.read(n * 4), np.float32).reshape(shape)
                elif ttype == GGML_F16:
                    arr = np.frombuffer(f.read(n * 2), np.float16).astype(np.float32).reshape(shape)
                elif ttype == GGML_BF16:
                    raw = np.frombuffer(f.read(n * 2), np.uint16).astype(np.uint32) << 16
                    arr = raw.view(np.float32).reshape(shape)
                elif ttype == GGML_Q8_0:
                    nbytes = (n // 32) * 34
                    arr = _dequant_q8_0(f.read(nbytes), n).reshape(shape)
                else:
                    logger.warning(f"Skipping tensor {name}: unsupported ggml type {ttype}")
                    continue
                hub_name = map_gguf_name(name) or name
                tensors[hub_name] = arr
        return {"metadata": metadata, "tensors": tensors}
