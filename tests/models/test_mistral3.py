"""Pixtral vision encoder + Mistral3 VLM parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


def test_pixtral_vision_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=64, patch_size=8)
    tm = transformers.PixtralVisionModel(cfg).eval()
    d = str(tmp_path / "pixtral")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    pix = RNG.normal(size=(2, 3, 32, 32)).astype(np.float32)  # 4x4 grids x2
    with torch.no_grad():
        ref = tm(torch.from_numpy(pix)).last_hidden_state.numpy()
    out = m(m.params, jnp.asarray(pix))
    diff = np.abs(np.asarray(out.last_hidden_state) - ref).max()
    assert diff < 5e-5, diff


def test_mistral3_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.Mistral3Config(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, image_size=64, patch_size=8),
        text_config=dict(vocab_size=128, hidden_size=48, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=12,
                         max_position_embeddings=128, sliding_window=None),
        image_token_index=99, spatial_merge_size=2)
    tm = transformers.Mistral3ForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "mistral3")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # one 32x32 image -> 4x4 patches -> merged /4 -> 4 image tokens
    pix = RNG.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 99, 99, 99, 99, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pix),
                 image_sizes=torch.tensor([[32, 32]])).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 5e-5, diff
