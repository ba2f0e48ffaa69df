"""Round-5 hub quantization formats: bitsandbytes 4-bit (nf4 + double
quant), bitsandbytes 8-bit (LLM.int8), HQQ, BitNet b1.58.

Each test packs a checkpoint with an independent scalar transcription of
the external format's packing rules and checks our vectorized reader
recovers the exact dequantized weights. The nf4 test additionally anchors
on bitsandbytes' published 16-entry NF4 code table (external constants this
repo did not derive)."""

import json

import numpy as np
import pytest

from transformers_tpu.quantizers.checkpoint_formats import (
    NF4_TABLE,
    dequant_bitnet,
    dequant_bnb_4bit,
    dequant_bnb_8bit,
    dequant_hqq,
    dequantize_state_dict,
    detect_prequantized,
)


def test_detect_new_methods():
    assert detect_prequantized({"quant_method": "bitsandbytes",
                                "load_in_4bit": True}) == "bitsandbytes_4bit"
    assert detect_prequantized({"quant_method": "bitsandbytes",
                                "load_in_8bit": True}) == "bitsandbytes_8bit"
    assert detect_prequantized({"quant_method": "hqq"}) == "hqq"
    assert detect_prequantized({"quant_method": "bitnet"}) == "bitnet"


def _pack_nf4(w, blocksize=64):
    """Scalar transcription of bnb quantize_4bit(nf4): per-block absmax
    scaling, nearest NF4 code, two codes per byte HIGH nibble first."""
    flat = w.reshape(-1)
    n = flat.size
    absmax = np.empty(-(-n // blocksize), np.float32)
    codes = np.empty(n, np.uint8)
    for b in range(absmax.size):
        blk = flat[b * blocksize:(b + 1) * blocksize]
        amax = np.abs(blk).max()
        absmax[b] = amax
        norm = blk / amax if amax else blk
        for i, v in enumerate(norm):
            codes[b * blocksize + i] = int(np.argmin(np.abs(NF4_TABLE - v)))
    packed = np.empty(n // 2, np.uint8)
    for i in range(packed.size):
        packed[i] = (codes[2 * i] << 4) | codes[2 * i + 1]
    return packed.reshape(-1, 1), absmax, codes


def test_bnb4_nf4_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    packed, absmax, codes = _pack_nf4(w)
    meta = {"blocksize": 64, "shape": [8, 64], "dtype": "float32"}
    state = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    group = {"weight": packed, "absmax": absmax, "quant_map": NF4_TABLE,
             "quant_state.bitsandbytes__nf4": state}
    got = dequant_bnb_4bit(group, {})
    # exact expected: code table lookup x per-block absmax
    want = (NF4_TABLE[codes] * np.repeat(absmax, 64)).reshape(8, 64)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # faithful to the source within nf4 resolution
    assert np.abs(got - w).max() < np.abs(w).max() * 0.2


def test_bnb4_double_quant():
    """Double quantization: absmax itself int8-coded over a nested map."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    packed, absmax, codes = _pack_nf4(w)
    # nested quantization of absmax: offset + int8 dynamic map
    offset = float(absmax.mean())
    centered = absmax - offset
    nested_absmax = np.asarray([np.abs(centered).max()], np.float32)
    # dynamic map stand-in: 256 evenly spaced values in [-1, 1]
    nested_map = np.linspace(-1, 1, 256).astype(np.float32)
    codes8 = np.asarray([np.argmin(np.abs(nested_map - c / nested_absmax[0]))
                         for c in centered], np.uint8)
    meta = {"blocksize": 64, "shape": [4, 64], "nested_blocksize": 256,
            "nested_offset": offset, "dtype": "float32"}
    group = {"weight": packed,
             "absmax": codes8,
             "quant_map": NF4_TABLE,
             "nested_absmax": nested_absmax,
             "nested_quant_map": nested_map,
             "quant_state.bitsandbytes__nf4": np.frombuffer(
                 json.dumps(meta).encode(), np.uint8)}
    got = dequant_bnb_4bit(group, {})
    absmax_deq = nested_map[codes8] * nested_absmax[0] + offset
    want = (NF4_TABLE[codes] * np.repeat(absmax_deq, 64)).reshape(4, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bnb8_scb():
    rng = np.random.default_rng(2)
    w8 = rng.integers(-127, 128, (6, 16)).astype(np.int8)
    scb = (rng.random(6).astype(np.float32) + 0.5)
    got = dequant_bnb_8bit({"weight": w8, "SCB": scb}, {})
    want = w8.astype(np.float32) * scb[:, None] / 127.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bnb8_state_dict_end_to_end():
    rng = np.random.default_rng(3)
    w8 = rng.integers(-127, 128, (4, 8)).astype(np.int8)
    scb = rng.random(4).astype(np.float32) + 0.5
    other = rng.standard_normal((4,)).astype(np.float32)
    tensors = {"model.layer.weight": w8, "model.layer.SCB": scb,
               "model.norm.weight": other}
    out = dequantize_state_dict(tensors, {"quant_method": "bitsandbytes",
                                          "load_in_8bit": True})
    np.testing.assert_allclose(out["model.layer.weight"],
                               w8.astype(np.float32) * scb[:, None] / 127.0)
    np.testing.assert_array_equal(out["model.norm.weight"], other)


def test_hqq_4bit_grouped():
    """HQQ axis=1 group quant: W viewed [-1, gs], q = round(W/s + z)."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 32)).astype(np.float32)
    gs = 16
    flat = w.reshape(-1, gs)
    wmax = flat.max(1, keepdims=True)
    wmin = flat.min(1, keepdims=True)
    scale = ((wmax - wmin) / 15.0).astype(np.float32)
    zero = (-wmin / scale).astype(np.float32)
    q = np.clip(np.round(flat / scale + zero), 0, 15).astype(np.uint8)
    # nibble pack along axis 0 (hqq BitPack.pack_4bit_u8: first half of the
    # rows in the HIGH nibble, second half in the low — stacked halves)
    half = q.shape[0] // 2
    packed = (q[:half] << 4) | q[half:]
    meta = {"nbits": 4, "group_size": gs, "axis": 1, "shape": [8, 32]}
    group = {"W_q": packed, "scale": scale.reshape(-1),
             "zero": zero.reshape(-1),
             "meta": np.frombuffer(json.dumps(meta).encode(), np.uint8)}
    got = dequant_hqq(group, {})
    want = ((q.astype(np.float32) - zero) * scale).reshape(8, 32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bitnet_ternary():
    rng = np.random.default_rng(5)
    tern = rng.integers(-1, 2, (16, 8)).astype(np.int8)  # {-1,0,1}
    scale = np.float32(3.5)
    shifted = (tern + 1).astype(np.uint8)  # {0,1,2}
    rows = 4
    packed = np.zeros((rows, 8), np.uint8)
    for i in range(4):
        packed |= shifted[i * rows:(i + 1) * rows] << (2 * i)
    got = dequant_bitnet({"weight": packed,
                          "weight_scale": np.asarray(scale)}, {})
    np.testing.assert_allclose(got, tern.astype(np.float32) / scale)
