"""Moonshine parity vs torch: conv frontend, interleaved partial rope,
SwiGLU decoder, cached greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(vocab_size=96, hidden_size=32, intermediate_size=48,
           encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
           encoder_num_attention_heads=4, decoder_num_attention_heads=4,
           max_position_embeddings=64, decoder_start_token_id=1,
           bos_token_id=1, eos_token_id=2, pad_token_id=2)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("moonshine"))
    torch.manual_seed(0)
    tm = transformers.MoonshineForConditionalGeneration(
        transformers.MoonshineConfig(**CFG, attn_implementation="eager")).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def _audio(b=2, t=4000, seed=0):
    return np.random.default_rng(seed).normal(size=(b, t)).astype(np.float32) * 0.1


def test_forward_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    wav = _audio()
    dec = np.array([[1, 5, 9], [1, 7, 2]])
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(wav),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(wav),
            decoder_input_ids=jnp.asarray(dec))
    # the 127-tap stride-64 conv accumulates ~2e-4 of backend (oneDNN vs
    # XLA) fp32 summation-order noise which the groupnorm then amplifies;
    # greedy generate below checks exact token-level agreement
    assert max_abs_diff(out.logits, ref) < 5e-3, max_abs_diff(out.logits, ref)


def test_head_dim_padding_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = dict(CFG, pad_head_dim_to_multiple_of=16)  # head_dim 8 -> padded 16
    tm = transformers.MoonshineForConditionalGeneration(
        transformers.MoonshineConfig(**cfg, attn_implementation="eager")).eval()
    d = str(tmp_path / "pad")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    wav = _audio(b=1)
    dec = np.array([[1, 5]])
    with torch.no_grad():
        ref = tm(input_values=torch.tensor(wav),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_values=jnp.asarray(wav),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-3


def test_greedy_generate_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSpeechSeq2Seq.from_pretrained(d, dtype="float32")
    wav = _audio(b=1, seed=3)
    with torch.no_grad():
        ref = tm.generate(input_values=torch.tensor(wav), max_new_tokens=6,
                          do_sample=False)
    out = m.generate(m.params, input_values=jnp.asarray(wav), max_new_tokens=6)
    n = min(np.asarray(out).shape[1], ref.shape[1])
    np.testing.assert_array_equal(np.asarray(out)[0, :n], ref.numpy()[0, :n])
