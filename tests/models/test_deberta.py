"""DeBERTa v1 parity vs torch: packed in_proj disentangled attention."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.deberta import (  # noqa: E402
    DebertaForMaskedLM,
    DebertaForSequenceClassification,
)


def _cfg(transformers, **kw):
    return transformers.DebertaConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2, **kw)


@pytest.mark.parametrize("rel", [False, True])
def test_deberta_mlm_parity(tmp_path, rel):
    import torch
    import transformers

    torch.manual_seed(0)
    kw = dict(relative_attention=True, max_relative_positions=16,
              pos_att_type="c2p|p2c") if rel else {}
    cfg = _cfg(transformers, **kw)
    tm = transformers.DebertaForMaskedLM(cfg).eval()
    d = str(tmp_path / "deberta")
    tm.save_pretrained(d, safe_serialization=True)
    m = DebertaForMaskedLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3, 5, 8]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 1, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    # compare only valid positions: the reference zeroes masked embeddings too
    assert max_abs_diff(out.logits[:, :7], ref[:, :7]) < 5e-5


def test_deberta_sequence_classification_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = _cfg(transformers, relative_attention=True, max_relative_positions=16,
               pos_att_type="c2p|p2c", num_labels=3)
    tm = transformers.DebertaForSequenceClassification(cfg).eval()
    d = str(tmp_path / "deberta_cls")
    tm.save_pretrained(d, safe_serialization=True)
    m = DebertaForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5
