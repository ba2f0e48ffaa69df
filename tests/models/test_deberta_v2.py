"""DeBERTa-v2/v3 parity vs torch (disentangled attention variants)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=64, type_vocab_size=0)

# v3-style (shared att key, log buckets, LN on rel embeddings) and
# v2-style (separate pos projections, conv layer)
CASES = {
    "v3-style": dict(relative_attention=True, position_buckets=8, share_att_key=True,
                     norm_rel_ebd="layer_norm", pos_att_type="p2c|c2p",
                     position_biased_input=False),
    "v2-style": dict(relative_attention=True, max_relative_positions=16,
                     share_att_key=False, pos_att_type="c2p|p2c", conv_kernel_size=3,
                     position_biased_input=True),
    "absolute": dict(relative_attention=False, position_biased_input=True),
}

IDS = np.array([[2, 5, 9, 3, 7, 11, 4, 6], [2, 8, 15, 3, 1, 1, 1, 1]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.int64)


def make_tiny(tmp_dir, cls_name, over):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DebertaV2Config(**{**TINY, **over}, attn_implementation="eager")
    tm = getattr(transformers, cls_name)(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("case", sorted(CASES))
def test_base_parity(case, tmp_path):
    import torch

    d = str(tmp_path / case)
    tm = make_tiny(d, "DebertaV2Model", CASES[case])
    m = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS),
                 attention_mask=torch.tensor(MASK)).last_hidden_state.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    diff = float(np.max(np.abs(np.asarray(out.last_hidden_state) - ref) * MASK[..., None]))
    assert diff < 5e-5, case


def test_sequence_classification_parity(tmp_path):
    import torch

    d = str(tmp_path / "cls")
    tm = make_tiny(d, "DebertaV2ForSequenceClassification",
                   {**CASES["v3-style"], "num_labels": 3})
    m = ttpu.AutoModelForSequenceClassification.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_masked_lm_parity(tmp_path):
    import torch

    d = str(tmp_path / "mlm")
    tm = make_tiny(d, "DebertaV2ForMaskedLM", CASES["v3-style"])
    m = ttpu.AutoModelForMaskedLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK))
    diff = float(np.max(np.abs(np.asarray(out.logits) - ref) * MASK[..., None]))
    assert diff < 1e-4
