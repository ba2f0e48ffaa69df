"""GGUF checkpoint reading.

TPU-native analog of reference src/transformers/modeling_gguf_pytorch_utils.py
(:816 ``load_gguf_checkpoint``): parse the GGUF binary format (v2/v3),
dequantize supported tensor types, and map llama.cpp tensor names back to hub
parameter names so ``from_pretrained`` can consume GGUF files directly.

Supported tensor types: F32, F16, BF16, and the quantized families
Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 plus the k-quants Q2_K/Q3_K/Q4_K/Q5_K/Q6_K
(block layouts per llama.cpp ggml-quants.c; the reference dequantizes the
same set via the gguf package).
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
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 10, 11, 12, 13, 14
GGML_BF16 = 30

# type id -> (bytes per block, elements per block, dequant fn) filled below
_BLOCK_DEQUANT = {}

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


def _f16(b):  # uint8 [nb, 2] -> f32 [nb, 1]
    return b.copy().view(np.float16).astype(np.float32)


def _dequant_q4_0(raw: bytes, n: int) -> np.ndarray:
    """Q4_0 (18B/32): f16 d + 16B nibbles; x = d * (q - 8). Element j<16 is
    the LOW nibble of byte j, element j+16 the HIGH nibble (llama.cpp)."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 18)
    d = _f16(blk[:, :2])
    qs = blk[:, 2:]
    lo = (qs & 0x0F).astype(np.float32) - 8.0
    hi = (qs >> 4).astype(np.float32) - 8.0
    out = d * np.concatenate([lo, hi], axis=1)
    return out.reshape(-1)[:n]


def _dequant_q4_1(raw: bytes, n: int) -> np.ndarray:
    """Q4_1 (20B/32): f16 d, f16 m + 16B nibbles; x = d * q + m."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 20)
    d = _f16(blk[:, :2])
    m = _f16(blk[:, 2:4])
    qs = blk[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    out = d * np.concatenate([lo, hi], axis=1) + m
    return out.reshape(-1)[:n]


def _q5_high_bits(qh_bytes):
    """[nb, 4] uint8 -> [nb, 32] the per-element high bit."""
    qh = qh_bytes.copy().view(np.uint32)            # [nb, 1]
    shifts = np.arange(32, dtype=np.uint32)[None, :]
    return ((qh >> shifts) & 1).astype(np.uint8)    # [nb, 32]


def _dequant_q5_0(raw: bytes, n: int) -> np.ndarray:
    """Q5_0 (22B/32): f16 d, 4B qh, 16B nibbles; x = d * (q5 - 16)."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 22)
    d = _f16(blk[:, :2])
    h = _q5_high_bits(blk[:, 2:6])
    qs = blk[:, 6:]
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=1) | (h << 4)
    return (d * (q.astype(np.float32) - 16.0)).reshape(-1)[:n]


def _dequant_q5_1(raw: bytes, n: int) -> np.ndarray:
    """Q5_1 (24B/32): f16 d, f16 m, 4B qh, 16B nibbles; x = d * q5 + m."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 24)
    d = _f16(blk[:, :2])
    m = _f16(blk[:, 2:4])
    h = _q5_high_bits(blk[:, 4:8])
    qs = blk[:, 8:]
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=1) | (h << 4)
    return (d * q.astype(np.float32) + m).reshape(-1)[:n]


def _unpack_k_scales(sc: np.ndarray):
    """Q4_K/Q5_K 12-byte scale packing -> (scales [nb, 8], mins [nb, 8]),
    6-bit values (llama.cpp get_scale_min_k4)."""
    sc = sc.astype(np.uint8)
    scales = np.empty(sc.shape[:1] + (8,), np.uint8)
    mins = np.empty_like(scales)
    scales[:, :4] = sc[:, 0:4] & 63
    mins[:, :4] = sc[:, 4:8] & 63
    scales[:, 4:] = (sc[:, 8:12] & 0x0F) | ((sc[:, 0:4] >> 6) << 4)
    mins[:, 4:] = (sc[:, 8:12] >> 4) | ((sc[:, 4:8] >> 6) << 4)
    return scales.astype(np.float32), mins.astype(np.float32)


def _dequant_q4_k(raw: bytes, n: int) -> np.ndarray:
    """Q4_K (144B/256): f16 d, f16 dmin, 12B 6-bit scales/mins (8 sub-blocks
    of 32), 128B nibbles. x = d*sc*q - dmin*m. Within each 64-element chunk,
    low nibbles are elements 0..31, high nibbles 32..63."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 144)
    d = _f16(blk[:, 0:2])
    dmin = _f16(blk[:, 2:4])
    scales, mins = _unpack_k_scales(blk[:, 4:16])
    qs = blk[:, 16:].reshape(-1, 4, 32)             # 4 chunks of 64 elements
    q = np.stack([qs & 0x0F, qs >> 4], axis=2)      # [nb, 4, 2, 32]
    q = q.reshape(-1, 8, 32).astype(np.float32)     # 8 sub-blocks of 32
    out = (d[:, :, None] * scales[:, :, None] * q
           - dmin[:, :, None] * mins[:, :, None])
    return out.reshape(-1)[:n]


def _dequant_q5_k(raw: bytes, n: int) -> np.ndarray:
    """Q5_K (176B/256): like Q4_K plus 32B of high bits. The j-th 64-element
    chunk uses qh bits (2j, 2j+1) of each of the 32 qh bytes."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 176)
    d = _f16(blk[:, 0:2])
    dmin = _f16(blk[:, 2:4])
    scales, mins = _unpack_k_scales(blk[:, 4:16])
    qh = blk[:, 16:48]                               # [nb, 32]
    qs = blk[:, 48:].reshape(-1, 4, 32)
    lo = np.stack([qs & 0x0F, qs >> 4], axis=2)      # [nb, 4, 2, 32]
    bit = np.stack([(qh[:, None, :] >> (2 * np.arange(4))[None, :, None]) & 1,
                    (qh[:, None, :] >> (2 * np.arange(4) + 1)[None, :, None]) & 1],
                   axis=2)                            # [nb, 4, 2, 32]
    q = (lo | (bit.astype(np.uint8) << 4)).reshape(-1, 8, 32).astype(np.float32)
    out = (d[:, :, None] * scales[:, :, None] * q
           - dmin[:, :, None] * mins[:, :, None])
    return out.reshape(-1)[:n]


def _dequant_q6_k(raw: bytes, n: int) -> np.ndarray:
    """Q6_K (210B/256): 128B low nibbles, 64B 2-bit highs, 16B int8 scales
    (16 sub-blocks of 16), f16 d. x = d * sc * (q6 - 32). Per 128-element
    half: elements l, l+32 come from nibbles of ql byte l / l+32... using
    the llama.cpp layout: for l in 0..31: out[l]    = (ql[l]    & 0xF) | (((qh[l] >> 0) & 3) << 4)
                                          out[l+32] = (ql[l+32] & 0xF) | (((qh[l] >> 2) & 3) << 4)
                                          out[l+64] = (ql[l]    >> 4)  | (((qh[l] >> 4) & 3) << 4)
                                          out[l+96] = (ql[l+32] >> 4)  | (((qh[l] >> 6) & 3) << 4)"""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 210)
    ql = blk[:, 0:128].reshape(-1, 2, 64)            # two 128-element halves
    qh = blk[:, 128:192].reshape(-1, 2, 32)
    sc = blk[:, 192:208].copy().view(np.int8).astype(np.float32)  # [nb, 16]
    d = _f16(blk[:, 208:210])
    ql_a, ql_b = ql[:, :, :32], ql[:, :, 32:]        # [nb, 2, 32] each
    q0 = (ql_a & 0x0F) | (((qh >> 0) & 3) << 4)
    q1 = (ql_b & 0x0F) | (((qh >> 2) & 3) << 4)
    q2 = (ql_a >> 4) | (((qh >> 4) & 3) << 4)
    q3 = (ql_b >> 4) | (((qh >> 6) & 3) << 4)
    q = np.concatenate([q0, q1, q2, q3], axis=2)     # [nb, 2, 128]
    q = q.reshape(-1, 16, 16).astype(np.float32) - 32.0
    out = d[:, :, None] * sc[:, :, None] * q
    return out.reshape(-1)[:n]


def _dequant_q2_k(raw: bytes, n: int) -> np.ndarray:
    """Q2_K (84B/256): 16B scale/min nibble pairs (16 sub-blocks of 16),
    64B 2-bit quants, f16 d, f16 dmin. x = d*(sc&0xF)*q - dmin*(sc>>4).
    Layout: each 32-byte qs chunk holds 128 elements; shift (j//16)%4*2
    selects the 2 bits; llama.cpp iterates 2-bit planes of 32 bytes."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 84)
    sc = blk[:, 0:16]
    qs = blk[:, 16:80].reshape(-1, 2, 32)            # two 128-element halves
    d = _f16(blk[:, 80:82])
    dmin = _f16(blk[:, 82:84])
    planes = [((qs >> s) & 3) for s in (0, 2, 4, 6)]  # each [nb, 2, 32]
    q = np.concatenate(planes, axis=2)                # [nb, 2, 128]
    q = q.reshape(-1, 16, 16).astype(np.float32)
    scales = (sc & 0x0F).astype(np.float32)
    mins = (sc >> 4).astype(np.float32)
    out = (d[:, :, None] * scales[:, :, None] * q
           - dmin[:, :, None] * mins[:, :, None])
    return out.reshape(-1)[:n]


def _dequant_q3_k(raw: bytes, n: int) -> np.ndarray:
    """Q3_K (110B/256): 32B high-bit mask, 64B 2-bit lows, 12B 6-bit scales
    (16 sub-blocks of 16), f16 d. x = d * (sc - 32) * (q - (hbit ? 0 : 4)).
    Scale packing (llama.cpp): 16 6-bit values from 12 bytes."""
    blk = np.frombuffer(raw, np.uint8).reshape(-1, 110)
    hmask = blk[:, 0:32]
    qs = blk[:, 32:96].reshape(-1, 2, 32)
    scb = blk[:, 96:108]
    d = _f16(blk[:, 108:110])
    # scales: low 4 bits from bytes 0..7 (nibbles), high 2 bits from 8..11
    sc = np.empty(blk.shape[:1] + (16,), np.int8)
    lo = np.concatenate([scb[:, 0:8] & 0x0F, scb[:, 0:8] >> 4], axis=1)  # [nb, 16]
    hi_src = scb[:, 8:12]
    hi = np.concatenate([(hi_src >> s) & 3 for s in (0, 2, 4, 6)], axis=1)  # [nb, 16]
    sc = (lo | (hi << 4)).astype(np.int8).astype(np.float32) - 32.0
    planes = [((qs >> s) & 3) for s in (0, 2, 4, 6)]
    q = np.concatenate(planes, axis=2).reshape(-1, 2, 128).astype(np.float32)
    # high bit j of element e (within the 256 block) = bit (e // 32) of hmask byte (e % 32)
    bits = np.concatenate([((hmask >> b) & 1) for b in range(8)], axis=1)  # [nb, 256]
    q = q.reshape(-1, 256) - np.where(bits > 0, 0.0, 4.0)
    q = q.reshape(-1, 16, 16)
    out = d[:, :, None] * sc[:, :, None] * q
    return out.reshape(-1)[:n]


_BLOCK_DEQUANT.update({
    GGML_Q4_0: (18, 32, _dequant_q4_0),
    GGML_Q4_1: (20, 32, _dequant_q4_1),
    GGML_Q5_0: (22, 32, _dequant_q5_0),
    GGML_Q5_1: (24, 32, _dequant_q5_1),
    GGML_Q8_0: (34, 32, _dequant_q8_0),
    GGML_Q2_K: (84, 256, _dequant_q2_k),
    GGML_Q3_K: (110, 256, _dequant_q3_k),
    GGML_Q4_K: (144, 256, _dequant_q4_k),
    GGML_Q5_K: (176, 256, _dequant_q5_k),
    GGML_Q6_K: (210, 256, _dequant_q6_k),
})


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
                elif ttype in _BLOCK_DEQUANT:
                    bpb, epb, fn = _BLOCK_DEQUANT[ttype]
                    nbytes = (n // epb) * bpb
                    arr = fn(f.read(nbytes), n).reshape(shape)
                else:
                    logger.warning(f"Skipping tensor {name}: unsupported ggml type {ttype}")
                    continue
                hub_name = map_gguf_name(name) or name
                tensors[hub_name] = arr
        return {"metadata": metadata, "tensors": tensors}


# llama.cpp metadata -> hub config fields (reference
# integrations/ggml.py GGUF_CONFIG_MAPPING, llama subset; keys are read with
# the architecture prefix already stripped).
_GGUF_CONFIG_MAP = {
    "context_length": "max_position_embeddings",
    "block_count": "num_hidden_layers",
    "feed_forward_length": "intermediate_size",
    "embedding_length": "hidden_size",
    "rope.dimension_count": None,  # derived: head_dim
    "rope.freq_base": "rope_theta",
    "attention.head_count": "num_attention_heads",
    "attention.head_count_kv": "num_key_value_heads",
    "attention.layer_norm_rms_epsilon": "rms_norm_eps",
    "vocab_size": "vocab_size",
}


def gguf_config_kwargs(metadata: dict) -> dict:
    """Derive hub-style config kwargs from GGUF metadata (llama-family)."""
    arch = metadata.get("general.architecture", "llama")
    out: dict[str, Any] = {"model_type": arch}
    for gguf_key, hub_key in _GGUF_CONFIG_MAP.items():
        val = metadata.get(f"{arch}.{gguf_key}")
        if val is None or hub_key is None:
            continue
        out[hub_key] = val
    return out
