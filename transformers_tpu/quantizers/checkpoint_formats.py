"""Pre-quantized hub checkpoint consumption — GPTQ / AWQ / compressed-tensors
/ fp8 readers that dequantize packed weights into the plain param tree.

Reference parity: src/transformers/quantizers/ (quantizer_gptq.py,
quantizer_awq.py, quantizer_compressed_tensors.py, quantizer_finegrained_fp8.py)
+ utils/quantization_config.py. The reference dispatches to CUDA kernels
(exllama, awq-gemm, fbgemm); on TPU the right analog is dequantize-on-load:
the packed integer tensors are expanded on host into the target dtype and the
usual loader takes over, so every model family works with every format. A
loaded model can then be re-quantized to the TPU runtime formats
(weight-only int8/int4/fp8) for serving.

Packed layouts implemented here (verified against scalar transcriptions of
the packing code in tests/quantization/test_prequantized_checkpoints.py):

- GPTQ (AutoGPTQ "gptq" format, bits=4/8):
  qweight int32 [K/pack, N] packed along K, qzeros int32 [G, N/pack],
  scales f16 [G, N], g_idx int32 [K]. w[k,n] = s[g_idx[k],n] *
  (q[k,n] - z[g_idx[k],n] - 1)  (the legacy +1 zero offset; the "gptq_v2"
  checkpoint_format drops it). Dequant result is [K, N] = torch-weight.T.
- AWQ (gemm format, bits=4): qweight int32 [K, N/8] with the AWQ nibble
  interleave [0,2,4,6,1,3,5,7], qzeros same packing, scales f16 [G, N].
  w[k,n] = s[g,n] * (q[k,n] - z[g,n]); result [K, N] = torch-weight.T.
- compressed-tensors (pack-quantized int4/int8): weight_packed int32
  [N, K/pack] packed little-endian along K with SIGNED values,
  weight_scale [N, G or 1], optional weight_zero_point. w[n,k] =
  s[n, k//gs] * (q[n,k] - z). Result [N, K] = torch layout.
- fp8 (finegrained / per-tensor): weight float8_e4m3fn [N, K] with either
  weight_scale (per-tensor / per-channel [N,1]) or weight_scale_inv
  [ceil(N/bs), ceil(K/bs)] (DeepSeek 128x128 block quant).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


def detect_prequantized(config_qdict: Optional[dict]) -> Optional[str]:
    """Map a config.json ``quantization_config`` dict to a reader name."""
    if not config_qdict:
        return None
    method = config_qdict.get("quant_method")
    if method in ("gptq", "awq", "fp8", "finegrained_fp8", "fbgemm_fp8"):
        return "fp8" if method != "gptq" and method != "awq" else method
    if method == "compressed-tensors":
        return "compressed-tensors"
    return None


# ----------------------------------------------------------------- unpacking

def _unpack_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """int32 [R/pack, C] -> uint [R, C], values packed along axis 0
    little-endian (GPTQ qweight layout)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    u = packed.view(np.uint32)
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, :, None]
    out = (u[:, None, :] >> shifts) & mask
    return out.reshape(-1, packed.shape[1])


def _unpack_cols(packed: np.ndarray, bits: int, order: Optional[list] = None) -> np.ndarray:
    """int32 [R, C/pack] -> uint [R, C], values packed along axis 1.
    ``order`` maps storage-slot -> logical column offset (AWQ interleave)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    u = packed.view(np.uint32)
    shifts = (np.arange(pack, dtype=np.uint32) * bits)[None, None, :]
    vals = (u[:, :, None] >> shifts) & mask  # [R, C/pack, pack] in storage order
    if order is not None:
        logical = np.empty(pack, np.int64)
        for slot, col in enumerate(order):
            logical[col] = slot
        vals = vals[:, :, logical]
    return vals.reshape(packed.shape[0], -1)


AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


# ------------------------------------------------------------------ dequants

def dequant_gptq(group: dict[str, np.ndarray], qcfg: dict) -> np.ndarray:
    """GPTQ qweight/qzeros/scales/g_idx -> torch-layout [out, in] float32."""
    bits = int(qcfg.get("bits", 4))
    qweight, qzeros, scales = group["qweight"], group["qzeros"], group["scales"]
    K = qweight.shape[0] * (32 // bits)
    g_idx = group.get("g_idx")
    if g_idx is None:
        gs = int(qcfg.get("group_size", 128))
        gs = K if gs in (-1, 0) else gs
        g_idx = np.arange(K) // gs
    g_idx = np.asarray(g_idx, np.int64)
    w = _unpack_rows(qweight, bits).astype(np.int32)          # [K, N]
    z = _unpack_cols(qzeros, bits).astype(np.int32)           # [G, N]
    if qcfg.get("checkpoint_format", "gptq") != "gptq_v2" and not qcfg.get("sym_no_offset"):
        z = z + 1
    s = scales.astype(np.float32)                             # [G, N]
    deq = s[g_idx] * (w - z[g_idx])                           # [K, N]
    return np.ascontiguousarray(deq.T)                        # torch [N, K]


def dequant_awq(group: dict[str, np.ndarray], qcfg: dict) -> np.ndarray:
    """AWQ gemm qweight/qzeros/scales -> torch-layout [out, in] float32."""
    bits = int(qcfg.get("bits", 4))
    qweight, qzeros, scales = group["qweight"], group["qzeros"], group["scales"]
    gs = int(qcfg.get("group_size", 128))
    K = qweight.shape[0]
    gs = K if gs in (-1, 0) else gs
    w = _unpack_cols(qweight, bits, AWQ_ORDER).astype(np.int32)   # [K, N]
    z = _unpack_cols(qzeros, bits, AWQ_ORDER).astype(np.int32)    # [G, N]
    s = scales.astype(np.float32)                                 # [G, N]
    g_idx = np.arange(K) // gs
    deq = s[g_idx] * (w - z[g_idx])
    return np.ascontiguousarray(deq.T)


def dequant_compressed_int(group: dict[str, np.ndarray], qcfg: dict) -> np.ndarray:
    """compressed-tensors pack-quantized -> torch-layout [out, in] float32."""
    packed = group["weight_packed"]
    scale = group["weight_scale"].astype(np.float32)
    bits = int(qcfg.get("num_bits", 4))
    pack = 32 // bits
    shape = group.get("weight_shape")
    N = packed.shape[0]
    K = int(shape[1]) if shape is not None else packed.shape[1] * pack
    vals = _unpack_cols(packed, bits)[:, :K].astype(np.int32)     # [N, K] unsigned
    # stored values are signed two's-complement nibbles
    vals = np.where(vals >= (1 << (bits - 1)), vals - (1 << bits), vals)
    zp = group.get("weight_zero_point")
    if zp is not None:
        vals = vals - zp.astype(np.int32).reshape(N, -1)
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(()) * vals
    scale = scale.reshape(N, -1)                                   # [N, G]
    G = scale.shape[1]
    gs = -(-K // G)
    g_idx = np.arange(K) // gs
    return scale[:, g_idx] * vals


def dequant_fp8(group: dict[str, np.ndarray], qcfg: dict) -> np.ndarray:
    """fp8 weight (+ weight_scale | weight_scale_inv) -> [out, in] float32."""
    w = group["weight"].astype(np.float32)                        # [N, K]
    if "weight_scale_inv" in group:  # DeepSeek block quant
        s = group["weight_scale_inv"].astype(np.float32)
        bs = int(qcfg.get("weight_block_size", [128, 128])[0])
        n_idx = np.arange(w.shape[0]) // bs
        k_idx = np.arange(w.shape[1]) // bs
        return w * s[np.ix_(n_idx, k_idx)]
    s = group.get("weight_scale")
    if s is None:
        return w
    s = s.astype(np.float32)
    if s.size == 1:
        return w * s.reshape(())
    return w * s.reshape(-1, 1)                                   # per-channel


_GROUP_SUFFIXES = {
    "gptq": ("qweight", "qzeros", "scales", "g_idx"),
    "awq": ("qweight", "qzeros", "scales"),
    "compressed-tensors": ("weight_packed", "weight_scale", "weight_zero_point",
                           "weight_shape", "weight_global_scale"),
    "fp8": ("weight_scale", "weight_scale_inv"),
}

_DEQUANT = {
    "gptq": dequant_gptq,
    "awq": dequant_awq,
    "compressed-tensors": dequant_compressed_int,
}


def dequantize_state_dict(tensors: dict[str, np.ndarray], qdict: dict) -> dict[str, np.ndarray]:
    """Convert a pre-quantized checkpoint state dict into plain torch-layout
    float weights. Non-quantized tensors pass through unchanged."""
    method = detect_prequantized(qdict) or qdict.get("quant_method")
    suffixes = _GROUP_SUFFIXES[method]
    out: dict[str, np.ndarray] = {}
    groups: dict[str, dict[str, np.ndarray]] = {}
    for key, val in tensors.items():
        prefix, _, leaf = key.rpartition(".")
        if leaf in suffixes:
            groups.setdefault(prefix, {})[leaf] = val
        elif method == "fp8" and leaf == "weight" and str(val.dtype).startswith("float8"):
            groups.setdefault(prefix, {})["weight"] = val
        else:
            out[key] = val

    # compressed-tensors nests per-group config under config_groups
    qcfg = qdict
    if method == "compressed-tensors":
        cg = qdict.get("config_groups") or {}
        if cg:
            first = next(iter(cg.values()))
            qcfg = {**qdict, **(first.get("weights") or {})}

    for prefix, group in groups.items():
        if method == "fp8":
            out[prefix + ".weight"] = dequant_fp8(group, qcfg)
        elif "qweight" in group or "weight_packed" in group:
            out[prefix + ".weight"] = _DEQUANT[method](group, qcfg)
        else:
            # stray suffix tensors without a packed weight: pass through
            for leaf, val in group.items():
                out[f"{prefix}.{leaf}"] = val
    return out


def load_prequantized_checkpoint(checkpoint_files: list, qdict: dict) -> dict[str, np.ndarray]:
    """Read every tensor from the shard files and dequantize the packed ones."""
    from ..core.loading import open_checkpoint_source

    tensors: dict[str, np.ndarray] = {}
    for file in checkpoint_files:
        with open_checkpoint_source(file) as f:
            for key in f.keys():
                tensors[key] = np.asarray(f.get_tensor(key))
    return dequantize_state_dict(tensors, qdict)
