"""Moshi parity vs torch: wrapped-linear temporal decoder with chunked-gating
MLP, flexible-linear depth decoder, audio-code embedding summation."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.moshi import (MoshiDepthDecoder,  # noqa: E402
                                           MoshiForCausalLM,
                                           MoshiForConditionalGeneration)

RNG = np.random.default_rng(0)

MIMI = dict(sampling_rate=2400, hidden_size=32, num_filters=8,
            num_residual_layers=1, upsampling_ratios=[4, 2], kernel_size=7,
            last_kernel_size=3, residual_kernel_size=3, codebook_size=64,
            codebook_dim=16, num_quantizers=4, num_semantic_quantizers=1,
            vector_quantization_hidden_dimension=16, upsample_groups=32,
            num_hidden_layers=1, intermediate_size=64, num_attention_heads=4,
            num_key_value_heads=4, sliding_window=16)
CFG = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
           num_key_value_heads=2, head_dim=8, ffn_dim=64, max_position_embeddings=128,
           sliding_window=64, num_codebooks=4, audio_vocab_size=64,
           depth_decoder_config=dict(vocab_size=99, hidden_size=16, input_size=32,
                                     num_hidden_layers=2, num_attention_heads=4,
                                     num_key_value_heads=2, head_dim=4, ffn_dim=32,
                                     max_position_embeddings=4, sliding_window=4,
                                     num_codebooks=4, audio_vocab_size=64),
           audio_encoder_config=MIMI)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.MoshiConfig(**CFG)
    tm = transformers.MoshiForConditionalGeneration(cfg).eval()
    d = str(tmp_path_factory.mktemp("moshi") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_moshi_text_decoder_parity(ckpt):
    import torch
    import transformers

    d, tm = ckpt
    torch.manual_seed(0)
    tdec = transformers.MoshiForCausalLM(transformers.MoshiConfig(**CFG)).eval()
    import tempfile

    d2 = tempfile.mkdtemp()
    tdec.save_pretrained(d2, safe_serialization=True)
    m = MoshiForCausalLM.from_pretrained(d2, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[3, 17, 9, 42, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tdec(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_moshi_conditional_forward_parity(ckpt):
    """Text + both audio streams summed into the temporal decoder."""
    import torch

    d, tm = ckpt
    m = MoshiForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[3, 17, 9]], dtype=np.int64)
    moshi_codes = RNG.integers(0, 64, size=(1, 4, 3))
    user_codes = RNG.integers(0, 64, size=(1, 4, 3))
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 moshi_audio_codes=torch.from_numpy(moshi_codes),
                 user_audio_codes=torch.from_numpy(user_codes)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            moshi_audio_codes=jnp.asarray(moshi_codes),
            user_audio_codes=jnp.asarray(user_codes))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_moshi_depth_decoder_parity(ckpt):
    import torch

    d, tm = ckpt
    m = MoshiForConditionalGeneration.from_pretrained(d, dtype="float32")
    # depth decoder sees [text_token, cb0, cb1] + temporal hidden state
    ids = np.array([[5, 10, 20]], dtype=np.int64)
    last_hidden = RNG.normal(size=(1, 3, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm.depth_decoder(
            input_ids=torch.from_numpy(ids),
            last_hidden_state=torch.from_numpy(last_hidden)).logits.numpy()
    out = m.depth_decoder(m.params["depth_decoder"], input_ids=jnp.asarray(ids),
                          last_hidden_state=jnp.asarray(last_hidden))
    # the flexible-linear weights are unnormalized N(0,1) draws, so logits are
    # O(1e3); compare relatively
    rel = max_abs_diff(out.logits, ref) / np.abs(ref).max()
    assert rel < 1e-5, f"relative diff {rel}"
