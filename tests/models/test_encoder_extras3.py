"""Parity vs torch: YOSO (expectation attention), X-MOD (language adapters),
RoCBert (shape/pronunciation embeddings)."""

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


@pytest.mark.parametrize("conv_window", [None, 3])
def test_yoso_parity(tmp_path, conv_window):
    import torch
    import transformers

    from transformers_tpu.models.yoso import YosoForMaskedLM

    torch.manual_seed(0)
    cfg = transformers.YosoConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  max_position_embeddings=64, use_expectation=True,
                                  conv_window=conv_window)
    tm = transformers.YosoForMaskedLM(cfg).eval()
    m = _roundtrip(tm, YosoForMaskedLM, tmp_path, f"yoso{conv_window}")
    ids = np.array([[0, 17, 9, 42, 7, 2]], dtype=np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask).float()).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert max_abs_diff(out.logits, ref) < 5e-5


@pytest.mark.parametrize("pre_norm", [False, True])
def test_xmod_parity(tmp_path, pre_norm):
    import torch
    import transformers

    from transformers_tpu.models.xmod import XmodForMaskedLM

    torch.manual_seed(1)
    cfg = transformers.XmodConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=4, intermediate_size=64,
                                  max_position_embeddings=64,
                                  languages=["en_XX", "de_DE"],
                                  default_language="de_DE", pre_norm=pre_norm)
    tm = transformers.XmodForMaskedLM(cfg).eval()
    m = _roundtrip(tm, XmodForMaskedLM, tmp_path, f"xmod{pre_norm}")
    ids = np.array([[0, 17, 9, 42, 7, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5
    # explicit per-sample lang ids hit the other adapter
    with torch.no_grad():
        ref0 = tm(input_ids=torch.from_numpy(ids),
                  lang_ids=torch.zeros(1, dtype=torch.long)).logits.numpy()
    out0 = m(m.params, input_ids=jnp.asarray(ids), lang_ids=jnp.zeros((1,), jnp.int32))
    assert max_abs_diff(out0.logits, ref0) < 5e-5


@pytest.mark.parametrize("concat_input", [True, False])
def test_roc_bert_parity(tmp_path, concat_input):
    import torch
    import transformers

    from transformers_tpu.models.roc_bert import RoCBertForMaskedLM

    torch.manual_seed(2)
    # the averaged (non-concat) branch adds the streams, so their dims must
    # equal hidden_size there (reference :133-141)
    pdim, sdim = (16, 24) if concat_input else (32, 32)
    cfg = transformers.RoCBertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                                     num_attention_heads=4, intermediate_size=64,
                                     max_position_embeddings=64,
                                     pronunciation_vocab_size=50, shape_vocab_size=60,
                                     pronunciation_embed_dim=pdim, shape_embed_dim=sdim,
                                     concat_input=concat_input)
    tm = transformers.RoCBertForMaskedLM(cfg).eval()
    m = _roundtrip(tm, RoCBertForMaskedLM, tmp_path, f"rocbert{concat_input}")
    ids = np.array([[2, 17, 9, 42, 7, 3]], dtype=np.int64)
    shape_ids = np.array([[1, 5, 8, 13, 21, 34]], dtype=np.int64)
    pron_ids = np.array([[3, 1, 4, 15, 9, 26]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 input_shape_ids=torch.from_numpy(shape_ids),
                 input_pronunciation_ids=torch.from_numpy(pron_ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            input_shape_ids=jnp.asarray(shape_ids),
            input_pronunciation_ids=jnp.asarray(pron_ids))
    assert max_abs_diff(out.logits, ref) < 5e-5
