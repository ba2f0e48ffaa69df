"""TAPAS parity vs torch: 7-way type embeddings + segmented cell/column logits."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)
B, S = 2, 12
IDS = RNG.integers(1, 60, size=(B, S)).astype(np.int64)
MASK = np.ones((B, S), np.int64)
MASK[1, -3:] = 0
# token types: [segment, col, row, prev, col_rank, inv_rank, numeric_rel]
TT = np.zeros((B, S, 7), np.int64)
TT[:, 4:, 0] = 1                                # table segment
TT[:, 4:, 1] = RNG.integers(1, 4, size=(B, S - 4))  # column ids
TT[:, 4:, 2] = RNG.integers(1, 5, size=(B, S - 4))  # row ids


def _cfg(transformers, **kw):
    return transformers.TapasConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=64, type_vocab_sizes=[3, 8, 8, 2, 8, 8, 4],
        max_num_rows=8, max_num_columns=4, **kw)


def test_qa_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.TapasForQuestionAnswering(
        _cfg(transformers, num_aggregation_labels=4)).eval()
    d = str(tmp_path / "tapas_qa")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForTableQuestionAnswering.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 token_type_ids=torch.from_numpy(TT))
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            token_type_ids=jnp.asarray(TT))
    assert np.abs(np.asarray(out.logits) - ref.logits.numpy()).max() < 5e-5
    assert np.abs(np.asarray(out.logits_aggregation)
                  - ref.logits_aggregation.numpy()).max() < 5e-5


def test_mlm_and_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    tm = transformers.TapasForMaskedLM(_cfg(transformers)).eval()
    d = str(tmp_path / "tapas_mlm")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 token_type_ids=torch.from_numpy(TT)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
            token_type_ids=jnp.asarray(TT))
    assert np.abs(np.asarray(out.logits) - ref).max() < 5e-5

    tm2 = transformers.TapasForSequenceClassification(
        _cfg(transformers, num_labels=3)).eval()
    d2 = str(tmp_path / "tapas_sc")
    tm2.save_pretrained(d2, safe_serialization=True)
    m2 = ttpu.AutoModelForSequenceClassification.from_pretrained(d2, dtype="float32")
    with torch.no_grad():
        ref2 = tm2(input_ids=torch.from_numpy(IDS),
                   token_type_ids=torch.from_numpy(TT)).logits.numpy()
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS), token_type_ids=jnp.asarray(TT))
    assert np.abs(np.asarray(out2.logits) - ref2).max() < 5e-5
