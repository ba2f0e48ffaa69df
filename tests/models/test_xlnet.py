"""XLNet parity vs torch: relative attention (content+position+segment
scores, rel-shift), LM head + sequence classification."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.xlnet import (  # noqa: E402
    XLNetForSequenceClassification, XLNetLMHeadModel)

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 11, 0, 0, 0]],
               dtype=np.int64)
MASK = np.array([[1] * 8, [1, 1, 1, 1, 1, 0, 0, 0]], dtype=np.int64)
TT = np.array([[0, 0, 0, 0, 1, 1, 1, 1], [0, 0, 1, 1, 1, 0, 0, 0]],
              dtype=np.int64)


def make_tiny(tmp_dir, arch):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.XLNetConfig(
        vocab_size=99, d_model=32, n_layer=2, n_head=4, d_inner=64,
        num_labels=3)
    tm = getattr(transformers, arch)(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_lm_head_parity(tmp_path):
    import torch

    d = str(tmp_path / "lm")
    tm = make_tiny(d, "XLNetLMHeadModel")
    model = XLNetLMHeadModel.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 token_type_ids=torch.tensor(TT)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS),
                attention_mask=jnp.asarray(MASK), token_type_ids=jnp.asarray(TT))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_sequence_classification_parity(tmp_path):
    import torch

    d = str(tmp_path / "cls")
    tm = make_tiny(d, "XLNetForSequenceClassification")
    model = XLNetForSequenceClassification.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS),
                 attention_mask=torch.tensor(MASK)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS),
                attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5
