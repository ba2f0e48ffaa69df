"""MusicGen Melody parity: conditioning prefix (chroma + text) decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers):
    return transformers.MusicgenMelodyConfig(
        num_chroma=12, chroma_length=6,
        text_encoder=dict(model_type="t5", vocab_size=99, d_model=32, d_kv=8,
                          d_ff=64, num_layers=2, num_heads=4,
                          relative_attention_num_buckets=8),
        audio_encoder=dict(model_type="encodec", audio_channels=1, num_filters=4,
                           num_residual_layers=1, upsampling_ratios=[4, 2],
                           codebook_size=64, codebook_dim=16, hidden_size=16,
                           num_lstm_layers=1, kernel_size=3, last_kernel_size=3,
                           residual_kernel_size=3, compress=2,
                           target_bandwidths=[30.0]),
        decoder=dict(vocab_size=66, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, ffn_dim=64, num_codebooks=2,
                     max_position_embeddings=128))


def test_forward_logit_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.MusicgenMelodyForConditionalGeneration(_cfg(transformers)).eval()
    d = str(tmp_path / "musicgen_melody")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[5, 9, 3, 22, 1]])
    mask = np.ones_like(ids)
    feats = np.random.default_rng(0).standard_normal((1, 4, 12)).astype(np.float32)
    dec = np.array([[66, 4, 7], [66, 12, 3]])  # [B*K, T]
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 input_features=torch.tensor(feats),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            input_features=jnp.asarray(feats),
            decoder_input_ids=jnp.asarray(dec)).logits
    assert max_abs_diff(out, ref) < 5e-5


def test_default_chroma(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.MusicgenMelodyForConditionalGeneration(_cfg(transformers)).eval()
    d = str(tmp_path / "mgm2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    ids = np.array([[5, 9, 3]])
    mask = np.ones_like(ids)
    dec = np.array([[66, 4], [66, 12]])
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            decoder_input_ids=jnp.asarray(dec)).logits
    assert max_abs_diff(out, ref) < 5e-5
