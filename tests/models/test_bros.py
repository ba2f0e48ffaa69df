"""BROS parity vs torch: bbox-biased BERT + SPADE heads."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


def _cfg(transformers, **kw):
    return transformers.BrosConfig(
        vocab_size=99, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0, **kw)


def _inputs():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 99, size=(2, 9))
    bbox = rng.uniform(size=(2, 9, 4)).astype(np.float32)
    mask = np.ones((2, 9), np.int64)
    mask[1, 7:] = 0
    return ids, bbox, mask


def test_bros_model_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    tm = transformers.BrosModel(_cfg(transformers)).eval()
    d = str(tmp_path / "bros")
    tm.save_pretrained(d, safe_serialization=True)
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids, bbox, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=ids, bbox=bbox, attention_mask=mask)
    assert max_abs_diff(out.last_hidden_state, ref.last_hidden_state.numpy()) < 3e-5
    assert max_abs_diff(out.pooler_output, ref.pooler_output.numpy()) < 3e-5


def test_bros_spade_ee_parity(tmp_path):
    import torch
    import transformers

    torch.manual_seed(1)
    cfg = _cfg(transformers, num_labels=5)
    tm = transformers.BrosSpadeEEForTokenClassification(cfg).eval()
    d = str(tmp_path / "bros_ee")
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.bros import BrosSpadeEEForTokenClassification
    m = BrosSpadeEEForTokenClassification.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids, bbox, mask = _inputs()
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), bbox=torch.tensor(bbox),
                 attention_mask=torch.tensor(mask))
    out = m(m.params, input_ids=ids, bbox=bbox, attention_mask=mask)
    assert max_abs_diff(out.initial_token_logits,
                        ref.initial_token_logits.numpy()) < 3e-5
    ours = np.asarray(out.subsequent_token_logits)
    want = ref.subsequent_token_logits.numpy()
    finite = np.isfinite(want) & np.isfinite(ours)
    assert (np.isfinite(ours) == np.isfinite(want)).all()
    assert np.abs(ours[finite] - want[finite]).max() < 3e-5
