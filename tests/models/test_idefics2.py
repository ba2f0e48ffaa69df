"""Idefics2 parity: NaViT vision + perceiver-resampler connector + mistral."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


def test_idefics2_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Idefics2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=8),
        perceiver_config=dict(hidden_size=48, resampler_n_latents=4, resampler_depth=2,
                              resampler_n_heads=4, resampler_head_dim=8,
                              num_key_value_heads=2),
        text_config=dict(model_type="mistral", vocab_size=128, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, sliding_window=None),
        image_token_id=99, pad_token_id=0,
    )
    tm = transformers.Idefics2ForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "idefics2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForImageTextToText.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    # 1 image -> 4 resampled latents -> 4 image tokens
    pix = RNG.normal(size=(1, 1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[5, 99, 99, 99, 99, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pix)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), pixel_values=jnp.asarray(pix))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 5e-5, f"logit diff {diff}"
