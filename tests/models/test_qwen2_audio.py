"""Qwen2-Audio parity: whisper-style tower + pooling + token scatter."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_forward_logit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2AudioConfig(
        audio_config=dict(d_model=32, encoder_layers=2, encoder_attention_heads=4,
                          encoder_ffn_dim=64, num_mel_bins=24, max_source_positions=20),
        text_config=dict(model_type="qwen2", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128),
        audio_token_index=98)
    tm = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "qwen2audio")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    mel_len = 40
    feats = rng.normal(size=(1, 24, mel_len)).astype(np.float32)
    fmask = np.ones((1, mel_len), np.int64)
    fmask[0, 32:] = 0  # padded tail: lengths 32 -> feat 16 -> 8 audio tokens
    n_audio = 8
    ids = np.array([[90] + [98] * n_audio + [7, 9, 4]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 input_features=torch.tensor(feats),
                 feature_attention_mask=torch.tensor(fmask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            input_features=jnp.asarray(feats),
            feature_attention_mask=jnp.asarray(fmask)).logits
    assert max_abs_diff(out, ref) < 5e-5
