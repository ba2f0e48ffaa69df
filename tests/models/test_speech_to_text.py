"""Speech2Text parity: conv-GLU subsampler + pre-LN seq2seq vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64, num_conv_layers=2,
            conv_channels=32, conv_kernel_sizes=(5, 5), input_feat_per_channel=24,
            input_channels=1, max_source_positions=64, max_target_positions=64,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("s2t"))
    torch.manual_seed(0)
    cfg = transformers.Speech2TextConfig(**TINY, attn_implementation="eager")
    tm = transformers.Speech2TextForConditionalGeneration(cfg).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _inputs():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 40, 24)).astype(np.float32)
    mask = np.ones((2, 40), np.int64)
    mask[1, 28:] = 0
    dec = np.array([[2, 11, 13], [2, 7, 9]], dtype=np.int64)
    return feats, mask, dec


def test_forward_logit_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    feats, mask, dec = _inputs()
    with torch.no_grad():
        ref = tm(input_features=torch.tensor(feats), attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_features=jnp.asarray(feats), attention_mask=jnp.asarray(mask),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    feats, mask, _ = _inputs()
    with torch.no_grad():
        ref = tm.generate(input_features=torch.tensor(feats),
                          attention_mask=torch.tensor(mask),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    out = np.asarray(m.generate(m.params, input_features=jnp.asarray(feats),
                                attention_mask=jnp.asarray(mask), max_new_tokens=6))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
