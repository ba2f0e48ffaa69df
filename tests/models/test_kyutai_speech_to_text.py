"""Kyutai STT parity vs torch: offset-summed text+codebook embeddings into a
Moshi-style sliding-window decoder with a text LM head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

MIMI = dict(model_type="mimi", sampling_rate=2400, hidden_size=32,
            num_filters=8, num_residual_layers=1, upsampling_ratios=[4, 2],
            kernel_size=7, last_kernel_size=3, residual_kernel_size=3,
            codebook_size=16, codebook_dim=16, num_quantizers=4,
            num_semantic_quantizers=1,
            vector_quantization_hidden_dimension=16, upsample_groups=32,
            num_hidden_layers=2, intermediate_size=64, num_attention_heads=4,
            num_key_value_heads=4, sliding_window=16,
            attn_implementation="eager")


def _cfg():
    return transformers.KyutaiSpeechToTextConfig(
        codebook_vocab_size=17, vocab_size=50, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=8, ffn_dim=64,
        num_codebooks=4, audio_bos_token_id=16,
        audio_pad_token_id=50 + 4 * 17, bos_token_id=1, pad_token_id=3,
        codec_config=dict(MIMI))


def test_kyutai_stt_parity(tmp_path):
    from transformers_tpu.models.kyutai_speech_to_text import (
        KyutaiSpeechToTextForConditionalGeneration,
    )

    torch.manual_seed(0)
    tm = transformers.KyutaiSpeechToTextForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "kstt")
    tm.save_pretrained(d, safe_serialization=True)

    m = KyutaiSpeechToTextForConditionalGeneration.from_pretrained(
        d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    # [B, S, 1+ncb]: col0 text tokens, cols 1..4 codebook ids (some pads)
    ids = np.zeros((1, 10, 5), np.int64)
    ids[0, :, 0] = rng.integers(4, 49, 10)
    ids[0, :, 1:] = rng.integers(0, 16, (10, 4))
    ids[0, 0, 1:] = 50 + 4 * 17  # audio pad id passes through un-offset
    # explicit attention_mask: the torch oracle only builds its sliding-window
    # mask when one is provided; ours applies the window unconditionally
    am = np.ones((1, 10), np.int64)
    with torch.no_grad():
        ref = tm.model(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(am)).last_hidden_state
        logits_ref = tm.lm_head(ref)
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(am))
    assert max_abs_diff(out.logits, logits_ref.numpy()) < 2e-4
