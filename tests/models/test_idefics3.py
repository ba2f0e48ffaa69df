"""Idefics3 / SmolVLM parity vs torch: NaViT vision encoder with bucketized
positions, pixel-shuffle connector, image-token scatter into llama."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


def _cfg(transformers, cls):
    return cls(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        text_config=dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128),
        image_token_id=99, scale_factor=2, pad_token_id=0,
    )


@pytest.mark.parametrize("family", ["idefics3", "smolvlm"])
def test_idefics3_family_parity(family, tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    if family == "idefics3":
        cfg = _cfg(transformers, transformers.Idefics3Config)
        tm = transformers.Idefics3ForConditionalGeneration(cfg).eval()
    else:
        cfg = _cfg(transformers, transformers.SmolVLMConfig)
        tm = transformers.SmolVLMForConditionalGeneration(cfg).eval()
    d = str(tmp_path / family)
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # 1 image of 32x32 -> 4x4 patches -> pixel shuffle /4 -> 4 image tokens
    pix = RNG.normal(size=(1, 1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 99, 99, 99, 99, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 5e-5, f"{family}: logit diff {diff}"
