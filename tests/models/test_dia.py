"""Dia parity vs torch: unscaled-attention byte encoder + multi-channel
codebook decoder with cross-attention, flattened (B*C, T, V) logits."""

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
    return transformers.DiaConfig(
        encoder_config=dict(max_position_embeddings=64, num_hidden_layers=2,
                            hidden_size=32, num_attention_heads=4,
                            num_key_value_heads=4, head_dim=8,
                            intermediate_size=64, vocab_size=64),
        decoder_config=dict(max_position_embeddings=64, num_hidden_layers=2,
                            hidden_size=32, intermediate_size=64,
                            num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8, cross_num_attention_heads=4,
                            cross_head_dim=8, cross_num_key_value_heads=4,
                            cross_hidden_size=32, vocab_size=40,
                            num_channels=3),
        delay_pattern=[0, 1, 2])


def test_dia_parity(tmp_path):
    from transformers_tpu.models.dia import DiaForConditionalGeneration

    torch.manual_seed(0)
    tm = transformers.DiaForConditionalGeneration(_cfg()).eval()
    d = str(tmp_path / "dia")
    tm.save_pretrained(d, safe_serialization=True)

    m = DiaForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 60, size=(1, 7)).astype(np.int64)
    dec = rng.integers(0, 39, size=(1, 5, 3)).astype(np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec))
    out = m(m.params, input_ids=jnp.asarray(ids),
            decoder_input_ids=jnp.asarray(dec))
    assert out.logits.shape == tuple(ref.logits.shape)
    assert max_abs_diff(out.logits, ref.logits.numpy()) < 2e-4


def test_dia_cached_decode_matches_full():
    import jax

    from transformers_tpu.models.dia import DiaForConditionalGeneration
    from transformers_tpu.models.dia.configuration_dia import DiaConfig

    cfg = DiaConfig(
        encoder_config=dict(num_hidden_layers=2, hidden_size=32,
                            num_attention_heads=4, num_key_value_heads=4,
                            head_dim=8, intermediate_size=64, vocab_size=64),
        decoder_config=dict(num_hidden_layers=2, hidden_size=32,
                            intermediate_size=64, num_attention_heads=4,
                            num_key_value_heads=2, head_dim=8,
                            cross_num_attention_heads=4, cross_head_dim=8,
                            cross_num_key_value_heads=4, cross_hidden_size=32,
                            vocab_size=40, num_channels=3),
        delay_pattern=[0, 1, 2])
    m = DiaForConditionalGeneration(cfg, dtype=jnp.float32)
    params = m.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 60, size=(1, 6)).astype(np.int64)
    dec = rng.integers(0, 39, size=(1, 4, 3)).astype(np.int64)
    full = m(params, input_ids=jnp.asarray(ids), decoder_input_ids=jnp.asarray(dec))

    cache = m.init_cache(1, 4)
    enc = full.encoder_last_hidden_state
    step = None
    for t in range(4):
        step = m(params, encoder_outputs=enc,
                 decoder_input_ids=jnp.asarray(dec[:, t:t + 1]),
                 past_key_values=cache, cache_position=t)
        cache = step.past_key_values
    np.testing.assert_allclose(
        np.asarray(step.logits[:, -1]), np.asarray(full.logits[:, -1]),
        atol=2e-4)
