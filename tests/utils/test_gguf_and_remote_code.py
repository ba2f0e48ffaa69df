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
