"""Voxtral parity: whisper-style tower + frame regrouping + token scatter."""

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
    cfg = transformers.VoxtralConfig(
        audio_config=dict(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          num_mel_bins=8, max_source_positions=8),
        text_config=dict(model_type="llama", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128,
                         tie_word_embeddings=False),
        audio_token_id=98)
    tm = transformers.VoxtralForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "voxtral")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    # expected mel length = max_source_positions * 2 (conv2 stride)
    feats = rng.normal(size=(1, 8, 16)).astype(np.float32)
    # 8 encoder frames regrouped by intermediate/hidden=2 -> 4 audio tokens
    n_audio = 4
    ids = np.array([[90] + [98] * n_audio + [7, 9, 4]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 input_features=torch.tensor(feats)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            input_features=jnp.asarray(feats)).logits
    assert max_abs_diff(out, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.VoxtralConfig(
        audio_config=dict(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          num_mel_bins=8, max_source_positions=8),
        text_config=dict(model_type="llama", vocab_size=99, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128,
                         tie_word_embeddings=False),
        audio_token_id=98)
    tm = transformers.VoxtralForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "voxtral")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 8, 16)).astype(np.float32)
    ids = np.array([[90, 98, 98, 98, 98, 7, 9, 4]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids),
                          input_features=torch.tensor(feats),
                          max_new_tokens=6, do_sample=False,
                          pad_token_id=0).numpy()
    out = m.generate(m.params, input_ids=jnp.asarray(ids),
                     input_features=jnp.asarray(feats),
                     max_new_tokens=6, prompt_pad_multiple=8)
    np.testing.assert_array_equal(np.asarray(out)[0], ref[0])
