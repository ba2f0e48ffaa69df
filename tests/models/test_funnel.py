"""Funnel parity vs torch: pooled blocks + relative-shift attention + decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)
B, S = 2, 16
IDS = RNG.integers(1, 60, size=(B, S)).astype(np.int64)
MASK = np.ones((B, S), np.int64)
MASK[1, -4:] = 0
TT = np.zeros((B, S), np.int64)
TT[:, 0] = 2
TT[:, 9:] = 1


def _cfg(transformers, **kw):
    return transformers.FunnelConfig(
        vocab_size=64, block_sizes=[2, 2, 2], num_decoder_layers=1, d_model=32,
        n_head=4, d_head=8, d_inner=48, **kw)


def test_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.FunnelModel(_cfg(transformers)).eval()
    d = str(tmp_path / "funnel")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 token_type_ids=torch.from_numpy(TT)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            token_type_ids=jnp.asarray(TT))
    assert np.abs(np.asarray(out.last_hidden_state) - ref).max() < 5e-5


def test_base_and_heads_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.FunnelForSequenceClassification(
        _cfg(transformers, num_labels=3)).eval()
    d = str(tmp_path / "funnel_sc")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    tm2 = transformers.FunnelForMaskedLM(_cfg(transformers)).eval()
    d2 = str(tmp_path / "funnel_mlm")
    tm2.save_pretrained(d2, safe_serialization=True)
    m2 = ttpu.AutoModelForMaskedLM.from_pretrained(d2, dtype="float32")
    assert not m2.load_report.missing_keys, m2.load_report.missing_keys
    with torch.no_grad():
        ref2 = tm2(input_ids=torch.from_numpy(IDS),
                   attention_mask=torch.from_numpy(MASK)).logits.numpy()
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS),
              attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out2.logits) - ref2).max() < 5e-5


def test_factorized_attention_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(2)
    tm = transformers.FunnelModel(
        _cfg(transformers, attention_type="factorized")).eval()
    d = str(tmp_path / "funnel_fact")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert np.abs(np.asarray(out.last_hidden_state) - ref).max() < 5e-5
