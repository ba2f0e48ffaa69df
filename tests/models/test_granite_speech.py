"""Granite Speech parity vs torch: conformer CTC encoder (Shaw blocked
attention + GLU conv + mid-stack CTC re-injection) -> Q-Former window
projector -> granite LLM with audio-token scatter."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    return transformers.GraniteSpeechConfig(
        text_config=dict(model_type="granite", vocab_size=150, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         logits_scaling=2.0, embedding_multiplier=3.0,
                         residual_multiplier=0.5, attention_multiplier=0.25),
        encoder_config=dict(input_dim=20, num_layers=2, hidden_dim=32,
                            feedforward_mult=2, num_heads=4, output_dim=10,
                            context_size=12, max_pos_emb=32,
                            conv_kernel_size=5, dropout=0.0),
        projector_config=dict(model_type="blip_2_qformer", hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=64, encoder_hidden_size=32,
                              cross_attention_frequency=1),
        audio_token_index=149, window_size=15, downsample_rate=5)


def test_granite_speech_parity(tmp_path):
    from transformers_tpu.models.granite_speech import (
        GraniteSpeechForConditionalGeneration,
    )

    torch.manual_seed(0)
    tm = transformers.GraniteSpeechForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "gspeech")
    tm.save_pretrained(d, safe_serialization=True)

    m = GraniteSpeechForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    # 29 mel frames -> ceil(29/15)=2 windows -> 2*3=6 audio tokens
    feats = rng.standard_normal((1, 29, 20)).astype(np.float32)
    ids = np.concatenate([np.full((1, 6), 149), rng.integers(3, 140, (1, 5))],
                         axis=1).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 input_features=torch.from_numpy(feats))
    out = m(m.params, input_ids=jnp.asarray(ids),
            input_features=jnp.asarray(feats))
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 3e-4
