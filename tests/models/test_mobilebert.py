"""MobileBERT parity vs torch: bottleneck stream, NoNorm, trigram input,
stacked FFNs, concatenated-projection MLM head."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 0, 0, 0, 0]],
               dtype=np.int64)
MASK = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.int64)


def test_mlm_and_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.MobileBertConfig(
        vocab_size=99, hidden_size=32, embedding_size=16,
        intra_bottleneck_size=16, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=64,
        num_feedforward_networks=2, num_labels=3)
    tm = transformers.MobileBertForMaskedLM(config).eval()
    d = str(tmp_path / "mb")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS),
                 attention_mask=torch.tensor(MASK)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5

    torch.manual_seed(1)
    tm2 = transformers.MobileBertForSequenceClassification(config).eval()
    d2 = str(tmp_path / "mb-cls")
    tm2.save_pretrained(d2, safe_serialization=True)
    m2 = ttpu.AutoModelForSequenceClassification.from_pretrained(d2, dtype="float32")
    assert not m2.load_report.missing_keys, m2.load_report.missing_keys
    assert not m2.load_report.unexpected_keys, m2.load_report.unexpected_keys
    with torch.no_grad():
        ref2 = tm2(input_ids=torch.tensor(IDS),
                   attention_mask=torch.tensor(MASK)).logits.numpy()
    out2 = m2(m2.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out2.logits, ref2) < 5e-5
