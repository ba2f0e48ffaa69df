"""GGUF parsing + trust_remote_code loading."""

import json
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402
from transformers_tpu.modeling_gguf_utils import load_gguf_checkpoint  # noqa: E402


def write_gguf(path, metadata, tensors):
    """Minimal GGUF v3 writer (test fixture; spec-faithful)."""
    def w_str(f, s):
        b = s.encode()
        f.write(struct.pack("<Q", len(b)))
        f.write(b)

    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<q", len(tensors)))
        f.write(struct.pack("<q", len(metadata)))
        for k, v in metadata.items():
            w_str(f, k)
            if isinstance(v, str):
                f.write(struct.pack("<I", 8)); w_str(f, v)
            elif isinstance(v, int):
                f.write(struct.pack("<I", 4)); f.write(struct.pack("<I", v))
            elif isinstance(v, float):
                f.write(struct.pack("<I", 6)); f.write(struct.pack("<f", v))
        offset = 0
        blobs = []
        for name, arr in tensors.items():
            w_str(f, name)
            dims = tuple(reversed(arr.shape))
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            ttype = 0 if arr.dtype == np.float32 else 1
            f.write(struct.pack("<I", ttype))
            f.write(struct.pack("<Q", offset))
            blob = arr.astype(arr.dtype).tobytes()
            blobs.append(blob)
            offset += len(blob)
            offset += (-offset) % 32
        pos = f.tell()
        f.write(b"\0" * ((-pos) % 32))
        for blob in blobs:
            f.write(blob)
            f.write(b"\0" * ((-len(blob)) % 32))


def test_gguf_roundtrip_and_name_mapping(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "token_embd.weight": rng.normal(size=(16, 8)).astype(np.float32),
        "blk.0.attn_q.weight": rng.normal(size=(8, 8)).astype(np.float32),
        "blk.0.ffn_gate.weight": rng.normal(size=(12, 8)).astype(np.float16),
        "output_norm.weight": np.ones(8, np.float32),
    }
    path = str(tmp_path / "model.gguf")
    write_gguf(path, {"general.architecture": "llama", "llama.block_count": 1}, tensors)
    out = load_gguf_checkpoint(path)
    assert out["metadata"]["general.architecture"] == "llama"
    t = out["tensors"]
    np.testing.assert_allclose(t["model.embed_tokens.weight"], tensors["token_embd.weight"])
    np.testing.assert_allclose(t["model.layers.0.self_attn.q_proj.weight"],
                               tensors["blk.0.attn_q.weight"])
    np.testing.assert_allclose(t["model.layers.0.mlp.gate_proj.weight"],
                               tensors["blk.0.ffn_gate.weight"].astype(np.float32), atol=1e-3)
    assert "model.norm.weight" in t


def test_q8_0_dequant():
    from transformers_tpu.modeling_gguf_utils import _dequant_q8_0

    rng = np.random.default_rng(1)
    vals = rng.normal(size=64).astype(np.float32)
    blocks = []
    for i in range(0, 64, 32):
        chunk = vals[i : i + 32]
        scale = np.abs(chunk).max() / 127.0
        q = np.round(chunk / scale).astype(np.int8)
        blocks.append(np.float16(scale).tobytes() + q.tobytes())
    out = _dequant_q8_0(b"".join(blocks), 64)
    np.testing.assert_allclose(out, vals, atol=np.abs(vals).max() / 100)


def test_trust_remote_code(tmp_path):
    """Custom model code shipped with a checkpoint loads only with explicit
    trust_remote_code=True."""
    d = tmp_path / "custom"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "my_custom_net",
        "hidden_size": 8,
        "auto_map": {"AutoModelForCausalLM": "modeling_custom.MyCustomModel"},
    }))
    (d / "modeling_custom.py").write_text(
        "LOADED = True\n"
        "class MyCustomModel:\n"
        "    loaded_via_remote_code = True\n"
        "    @classmethod\n"
        "    def from_pretrained(cls, path, **kw):\n"
        "        return cls()\n")
    with pytest.raises(ValueError, match="trust_remote_code"):
        ttpu.AutoModelForCausalLM.from_pretrained(str(d))
    model = ttpu.AutoModelForCausalLM.from_pretrained(str(d), trust_remote_code=True)
    assert model.loaded_via_remote_code


# ---------------------------------------------------------------------------
# k-quant / legacy-quant dequantization: the vectorized implementations in
# modeling_gguf_utils must match a literal scalar transcription of llama.cpp's
# dequantize_row_* loops (ggml-quants.c) on random block bytes.
# ---------------------------------------------------------------------------

def _rand_blocks(rng, nb, bpb, scale_offsets):
    """Random quant bytes with well-formed (finite, modest) f16 scales at the
    given byte offsets within each block."""
    raw = rng.integers(0, 256, size=(nb, bpb), dtype=np.uint8)
    for off in scale_offsets:
        sc = rng.normal(scale=0.05, size=nb).astype(np.float16)
        raw[:, off : off + 2] = np.frombuffer(sc.tobytes(), np.uint8).reshape(nb, 2)
    return raw


def _scalar_q4_0(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 18 : (i + 1) * 18]
        d = np.frombuffer(b[:2], np.float16)[0].astype(np.float32)
        qs = b[2:].astype(int)
        for j in range(16):
            out[i * 32 + j] = d * ((qs[j] & 0x0F) - 8)
            out[i * 32 + j + 16] = d * ((qs[j] >> 4) - 8)
    return out


def _scalar_q5_1(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 24 : (i + 1) * 24]
        d = np.frombuffer(b[:2], np.float16)[0].astype(np.float32)
        m = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
        qh = int(np.frombuffer(b[4:8], np.uint32)[0])
        qs = b[8:].astype(int)
        for j in range(16):
            xh0 = ((qh >> j) & 1) << 4
            xh1 = ((qh >> (j + 16)) & 1) << 4
            out[i * 32 + j] = d * ((qs[j] & 0x0F) | xh0) + m
            out[i * 32 + j + 16] = d * ((qs[j] >> 4) | xh1) + m
    return out


def _scalar_q4_k(raw, n):
    out = np.empty(n, np.float32)

    def scale_min(j, q):
        if j < 4:
            return q[j] & 63, q[j + 4] & 63
        return ((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4),
                (q[j + 4] >> 4) | ((q[j] >> 6) << 4))

    for i in range(n // 256):
        b = raw[i * 144 : (i + 1) * 144]
        d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
        dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
        scales, qs = b[4:16].astype(int), b[16:].astype(int)
        y = i * 256
        for ci, j in enumerate(range(0, 256, 64)):
            sc1, m1 = scale_min(2 * ci, scales)
            sc2, m2 = scale_min(2 * ci + 1, scales)
            q = qs[ci * 32 : (ci + 1) * 32]
            for l in range(32):
                out[y + j + l] = d * sc1 * (q[l] & 0xF) - dmin * m1
                out[y + j + l + 32] = d * sc2 * (q[l] >> 4) - dmin * m2
    return out


def _scalar_q5_k(raw, n):
    out = np.empty(n, np.float32)

    def scale_min(j, q):
        if j < 4:
            return q[j] & 63, q[j + 4] & 63
        return ((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4),
                (q[j + 4] >> 4) | ((q[j] >> 6) << 4))

    for i in range(n // 256):
        b = raw[i * 176 : (i + 1) * 176]
        d = np.frombuffer(b[0:2], np.float16)[0].astype(np.float32)
        dmin = np.frombuffer(b[2:4], np.float16)[0].astype(np.float32)
        scales, qh = b[4:16].astype(int), b[16:48].astype(int)
        y = i * 256
        u1, u2 = 1, 2
        for ci, j in enumerate(range(0, 256, 64)):
            sc1, m1 = scale_min(2 * ci, scales)
            sc2, m2 = scale_min(2 * ci + 1, scales)
            ql = b[48 + ci * 32 : 48 + (ci + 1) * 32].astype(int)
            for l in range(32):
                out[y + j + l] = d * sc1 * ((ql[l] & 0xF) + (16 if qh[l] & u1 else 0)) - dmin * m1
                out[y + j + l + 32] = d * sc2 * ((ql[l] >> 4) + (16 if qh[l] & u2 else 0)) - dmin * m2
            u1 <<= 2
            u2 <<= 2
    return out


def _scalar_q6_k(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 210 : (i + 1) * 210]
        d = np.frombuffer(b[208:210], np.float16)[0].astype(np.float32)
        sc = b[192:208].view(np.int8).astype(int)
        y = i * 256
        for half in range(2):
            ql = b[half * 64 : half * 64 + 64].astype(int)
            qh = b[128 + half * 32 : 128 + half * 32 + 32].astype(int)
            s = sc[half * 8 : half * 8 + 8]
            base = y + half * 128
            for l in range(32):
                isx = l // 16
                q1 = ((ql[l] & 0xF) | (((qh[l] >> 0) & 3) << 4)) - 32
                q2 = ((ql[l + 32] & 0xF) | (((qh[l] >> 2) & 3) << 4)) - 32
                q3 = ((ql[l] >> 4) | (((qh[l] >> 4) & 3) << 4)) - 32
                q4 = ((ql[l + 32] >> 4) | (((qh[l] >> 6) & 3) << 4)) - 32
                out[base + l] = d * s[isx] * q1
                out[base + l + 32] = d * s[isx + 2] * q2
                out[base + l + 64] = d * s[isx + 4] * q3
                out[base + l + 96] = d * s[isx + 6] * q4
    return out


def _scalar_q2_k(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 84 : (i + 1) * 84]
        d = np.frombuffer(b[80:82], np.float16)[0].astype(np.float32)
        dmin = np.frombuffer(b[82:84], np.float16)[0].astype(np.float32)
        sc = b[0:16].astype(int)
        y = i * 256
        pos = 0
        isx = 0
        for half in range(2):
            q = b[16 + half * 32 : 16 + half * 32 + 32].astype(int)
            for shift in (0, 2, 4, 6):
                for sub in range(2):
                    s = sc[isx]
                    isx += 1
                    dl, ml = d * (s & 0xF), dmin * (s >> 4)
                    for l in range(16):
                        out[y + pos] = dl * ((q[sub * 16 + l] >> shift) & 3) - ml
                        pos += 1
    return out


def _scalar_q3_k(raw, n):
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 110 : (i + 1) * 110]
        hm = b[0:32].astype(int)
        scb = b[96:108].astype(int)
        d = np.frombuffer(b[108:110], np.float16)[0].astype(np.float32)
        # 16 6-bit scales via the aux/kmask unpack
        scales = np.empty(16, np.int8)
        for j in range(16):
            if j < 8:
                lo = scb[j] & 0xF if j < 4 else scb[j] & 0xF
            lo = (scb[j] & 0xF) if j < 8 else (scb[j - 8] >> 4)
            hi = (scb[8 + j % 4] >> (2 * (j // 4))) & 3
            scales[j] = np.int8(lo | (hi << 4))
        y = i * 256
        pos = 0
        isx = 0
        m = 1
        for half in range(2):
            q = b[32 + half * 32 : 32 + half * 32 + 32].astype(int)
            for shift in (0, 2, 4, 6):
                for sub in range(2):
                    s = int(scales[isx]) - 32
                    isx += 1
                    for l in range(16):
                        hbit = 0 if (hm[sub * 16 + l] & m) else 4
                        out[y + pos] = d * s * (((q[sub * 16 + l] >> shift) & 3) - hbit)
                        pos += 1
                m <<= 1
    return out


def test_kquant_dequant_matches_llama_cpp_scalar():
    from transformers_tpu import modeling_gguf_utils as g

    rng = np.random.default_rng(7)
    cases = [
        (g.GGML_Q4_0, 18, 32, (0,), _scalar_q4_0),
        (g.GGML_Q5_1, 24, 32, (0, 2), _scalar_q5_1),
        (g.GGML_Q2_K, 84, 256, (80, 82), _scalar_q2_k),
        (g.GGML_Q3_K, 110, 256, (108,), _scalar_q3_k),
        (g.GGML_Q4_K, 144, 256, (0, 2), _scalar_q4_k),
        (g.GGML_Q5_K, 176, 256, (0, 2), _scalar_q5_k),
        (g.GGML_Q6_K, 210, 256, (208,), _scalar_q6_k),
    ]
    for ttype, bpb, epb, scale_offs, scalar in cases:
        nb = 4
        raw = _rand_blocks(rng, nb, bpb, scale_offs)
        n = nb * epb
        _, _, fn = g._BLOCK_DEQUANT[ttype]
        got = fn(raw.tobytes(), n)
        want = scalar(raw.reshape(-1), n)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=f"ggml type {ttype}")


def test_q41_q50_roundtrip():
    """Q4_1 / Q5_0 checked by quantize→dequantize round-trip accuracy."""
    from transformers_tpu import modeling_gguf_utils as g

    rng = np.random.default_rng(3)
    vals = rng.normal(size=128).astype(np.float32)

    # Q4_1: asymmetric 4-bit, d = (max-min)/15, m = min
    blocks = []
    for i in range(0, 128, 32):
        c = vals[i : i + 32]
        mn, mx = c.min(), c.max()
        d = (mx - mn) / 15.0
        q = np.clip(np.round((c - mn) / d), 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        blocks.append(np.float16(d).tobytes() + np.float16(mn).tobytes() + packed.tobytes())
    out = g._BLOCK_DEQUANT[g.GGML_Q4_1][2](b"".join(blocks), 128)
    np.testing.assert_allclose(out, vals, atol=np.abs(vals).max() / 7)

    # Q5_0: symmetric 5-bit, x = d * (q - 16)
    blocks = []
    for i in range(0, 128, 32):
        c = vals[i : i + 32]
        d = np.abs(c).max() / 15.0
        q = np.clip(np.round(c / d) + 16, 0, 31).astype(np.uint8)
        qh = 0
        for j in range(32):
            qh |= int(q[j] >> 4) << j
        packed = ((q[:16] & 0xF) | ((q[16:] & 0xF) << 4)).astype(np.uint8)
        blocks.append(np.float16(d).tobytes() + np.uint32(qh).tobytes() + packed.tobytes())
    out = g._BLOCK_DEQUANT[g.GGML_Q5_0][2](b"".join(blocks), 128)
    np.testing.assert_allclose(out, vals, atol=np.abs(vals).max() / 14)


def _gguf_name_for(hub_key):
    """Invert the llama hub->gguf map for test fixture writing."""
    from transformers_tpu.modeling_gguf_utils import _LLAMA_BLOCK_MAP, _LLAMA_NAME_MAP

    for src, dst in _LLAMA_NAME_MAP:
        if hub_key == dst:
            return src
    if hub_key.startswith("model.layers."):
        parts = hub_key.split(".")
        idx, rest = parts[2], ".".join(parts[3:])
        for src, dst in _LLAMA_BLOCK_MAP:
            if rest == dst:
                return f"blk.{idx}.{src}"
    return None


def test_gguf_from_pretrained_end_to_end(tmp_path):
    """A GGUF llama checkpoint loads through the public from_pretrained and
    matches the safetensors-loaded model's logits exactly (F32 tensors)."""
    import jax.numpy as jnp
    from tests.parity_utils import make_tiny_torch_llama

    d = str(tmp_path / "ckpt")
    make_tiny_torch_llama(d)

    import torch
    from transformers import LlamaForCausalLM

    tm = LlamaForCausalLM.from_pretrained(d)
    tensors = {}
    for k, v in tm.state_dict().items():
        gname = _gguf_name_for(k)
        if gname is None:
            continue
        tensors[gname] = v.float().numpy()
    write_gguf(str(tmp_path / "ckpt" / "model.gguf"),
               {"general.architecture": "llama", "llama.block_count": 2}, tensors)

    m_st = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    m_gg = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32", gguf_file="model.gguf")
    ids = jnp.asarray([[3, 17, 9, 42, 7]])
    l_st = m_st(m_st.params, input_ids=ids).logits
    l_gg = m_gg(m_gg.params, input_ids=ids).logits
    np.testing.assert_allclose(np.asarray(l_gg), np.asarray(l_st), atol=1e-6)


def test_legacy_pytorch_bin_loading(tmp_path):
    """pytorch_model.bin checkpoints load with logit parity vs the torch
    oracle (reference modeling_utils.py:319 legacy torch.load branch)."""
    import jax.numpy as jnp
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, attn_implementation="eager")
    tm = LlamaForCausalLM(cfg).eval()
    d = str(tmp_path / "binckpt")
    tm.save_pretrained(d, safe_serialization=False)
    import os
    assert os.path.exists(os.path.join(d, "pytorch_model.bin"))

    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = [[5, 9, 3, 22]]
    ours = np.asarray(m(m.params, input_ids=jnp.asarray(ids)).logits)
    with torch.no_grad():
        ref = tm(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)
