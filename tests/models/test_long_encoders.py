"""Longformer (sliding window + global attention) and BigBird (original_full)
MLM parity vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def test_longformer_mlm_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LongformerConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, attention_window=4, max_position_embeddings=80,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    tm = transformers.LongformerForMaskedLM(cfg).eval()
    d = str(tmp_path / "longformer")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 99, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    ids[1, 9:] = cfg.pad_token_id
    glob = np.zeros((2, 12), np.int64)
    glob[:, 0] = 1  # CLS global
    glob[0, 5] = 1
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 global_attention_mask=torch.tensor(glob)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            global_attention_mask=jnp.asarray(glob)).logits
    # torch pads to a window multiple then unpads; compare the real region
    assert max_abs_diff(out, ref[:, :12]) < 5e-5


def test_longformer_no_global_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = transformers.LongformerConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, attention_window=[4, 8], max_position_embeddings=80,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    tm = transformers.LongformerForMaskedLM(cfg).eval()
    d = str(tmp_path / "longformer2")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    ids = np.arange(2, 18)[None, :] % 90 + 4
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids)).logits
    assert max_abs_diff(out, ref[:, :16]) < 5e-5


def test_big_bird_mlm_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.BigBirdConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, attention_type="original_full",
        max_position_embeddings=80, rescale_embeddings=True)
    tm = transformers.BigBirdForMaskedLM(cfg).eval()
    d = str(tmp_path / "big_bird")
    tm.save_pretrained(d, safe_serialization=True)

    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 0, 0, 0, 0]])
    mask = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]])
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits
    assert max_abs_diff(out, ref) < 5e-5
