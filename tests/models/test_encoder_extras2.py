"""Parity vs torch: IBert (fp mode), XLM-RoBERTa-XL (pre-LN), Nystromformer."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402


def _roundtrip(tm, cls, tmp_path, name):
    d = str(tmp_path / name)
    tm.save_pretrained(d, safe_serialization=True)
    m = cls.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    return m


def test_ibert_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.ibert import IBertForMaskedLM

    torch.manual_seed(0)
    cfg = transformers.IBertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                   num_attention_heads=4, intermediate_size=64,
                                   max_position_embeddings=64, quant_mode=False)
    tm = transformers.IBertForMaskedLM(cfg).eval()
    m = _roundtrip(tm, IBertForMaskedLM, tmp_path, "ibert")
    ids = np.array([[0, 17, 9, 42, 7, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_xlm_roberta_xl_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.xlm_roberta_xl import XLMRobertaXLForMaskedLM

    torch.manual_seed(1)
    cfg = transformers.XLMRobertaXLConfig(vocab_size=99, hidden_size=32,
                                          num_hidden_layers=2, num_attention_heads=4,
                                          intermediate_size=64,
                                          max_position_embeddings=64)
    tm = transformers.XLMRobertaXLForMaskedLM(cfg).eval()
    m = _roundtrip(tm, XLMRobertaXLForMaskedLM, tmp_path, "xlmr_xl")
    ids = np.array([[0, 17, 9, 42, 7, 2]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5


@pytest.mark.parametrize("landmarks", [8, 4])
def test_nystromformer_parity(tmp_path, landmarks):
    import torch
    import transformers

    from transformers_tpu.models.nystromformer import NystromformerForMaskedLM

    torch.manual_seed(2)
    cfg = transformers.NystromformerConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
        segment_means_seq_len=8, num_landmarks=landmarks, conv_kernel_size=3)
    tm = transformers.NystromformerForMaskedLM(cfg).eval()
    m = _roundtrip(tm, NystromformerForMaskedLM, tmp_path, f"nystrom{landmarks}")
    ids = np.array([[0, 17, 9, 42, 7, 2, 11, 3]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5
