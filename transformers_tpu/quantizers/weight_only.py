"""Weight-only int8/int4 quantization.

The TPU-relevant first backends of the reference's 26-quantizer zoo
(SURVEY §2.7): symmetric per-output-channel int8, and int4 packed two
nibbles per int8 byte. Dequant happens inside the Linear matmul where XLA
fuses it (decode is HBM-bound, so halving/quartering weight bytes is a
direct tokens/sec win).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .base import QuantizationConfig, Quantizer, register_quantizer


@dataclass
class Int8WeightOnlyConfig(QuantizationConfig):
    quant_method: str = "int8_weight_only"


@dataclass
class Int4WeightOnlyConfig(QuantizationConfig):
    quant_method: str = "int4_weight_only"


@register_quantizer("int8_weight_only")
class Int8WeightOnlyQuantizer(Quantizer):
    def quantize_tensor(self, key, value):
        w = jnp.asarray(value, jnp.float32)  # [in, out]
        scale = jnp.max(jnp.abs(w), axis=0, keepdims=False) / 127.0  # [out]
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)


@register_quantizer("int4_weight_only")
class Int4WeightOnlyQuantizer(Quantizer):
    """Symmetric int4, two values packed per int8 along the input dim."""

    def quantize_tensor(self, key, value):
        w = jnp.asarray(value, jnp.float32)
        in_dim = w.shape[0]
        if in_dim % 2:
            raise ValueError(f"int4 packing needs even input dim, got {in_dim} for {key}")
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7).astype(jnp.int8)
        lo = q[0::2] & 0x0F
        hi = (q[1::2] & 0x0F) << 4
        packed = (lo | hi).astype(jnp.int8)  # [in/2, out]
        return packed, scale.astype(jnp.float32)


def dequantize_int8(q, scale, dtype):
    return q.astype(dtype) * scale.astype(dtype)[None, :]


def unpack_int4(packed, scale, dtype):
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    in_half, out = packed.shape
    w = jnp.stack([lo, hi], axis=1).reshape(in_half * 2, out)
    return w.astype(dtype) * scale.astype(dtype)[None, :]


@dataclass
class Fp8WeightOnlyConfig(QuantizationConfig):
    quant_method: str = "fp8_weight_only"


@register_quantizer("fp8_weight_only")
class Fp8WeightOnlyQuantizer(Quantizer):
    """float8_e4m3 weight-only with per-channel scales (the reference's
    finegrained-FP8 analog; v5e+ MXUs consume fp8 natively)."""

    def quantize_tensor(self, key, value):
        w = jnp.asarray(value, jnp.float32)
        fp8_max = float(jnp.finfo(jnp.float8_e4m3fn).max)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / fp8_max, 1e-8)
        q = (w / scale[None, :]).astype(jnp.float8_e4m3fn)
        return q, scale.astype(jnp.float32)


def dequantize_fp8(q, scale, dtype):
    return q.astype(dtype) * scale.astype(dtype)[None, :]


def unpack_int4_codes(packed):
    """Packed [in/2, out] int8 -> sign-extended int4 codes [in, out] int8
    (no scale applied)."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    in_half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(in_half * 2, out)


def quantized_dot(x, w, scale, out_dtype):
    """y = x @ dequant(w)  computed as  (x @ w_codes) * scale.

    With per-output-channel scales the two are algebraically identical, but
    this form feeds the quantized codes straight into ``dot_general`` so the
    weight streams from HBM at its stored width (int8/fp8 = half/quarter the
    bf16 bytes — decode is HBM-bound, so this is the whole point of
    quantization on TPU; reference executes GPTQ/AWQ through CUDA kernels
    the same way, quantizers/quantizer_gptq.py).
    """
    import jax.lax as lax

    if w.dtype == jnp.float8_e4m3fn:
        w = w.astype(out_dtype)  # convert fuses into the dot operand read
    nd = x.ndim
    y = lax.dot_general(x, w, (((nd - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(out_dtype)
