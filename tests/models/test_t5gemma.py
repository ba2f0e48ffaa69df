"""T5Gemma parity vs torch: Gemma2-block encoder-decoder with cross attn."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.t5gemma import T5GemmaForConditionalGeneration  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    enc = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=8,
               layer_types=["full_attention", "sliding_attention"],
               sliding_window=8, query_pre_attn_scalar=8,
               attn_logit_softcapping=50.0, final_logit_softcapping=30.0)
    return transformers.T5GemmaConfig(encoder=enc, vocab_size=99,
                                      pad_token_id=0)


def test_t5gemma_parity(tmp_path):
    torch.manual_seed(0)
    cfg = _cfg()
    tm = transformers.T5GemmaForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "t5gemma")
    tm.save_pretrained(d, safe_serialization=True)

    m = T5GemmaForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[3, 17, 9, 42, 7, 1]], dtype=np.int64)
    dec = np.array([[2, 5, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids),
            decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5

    # padded encoder input parity (cross-attn mask path)
    mask = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref2 = tm(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask),
                  decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    out2 = m(m.params, input_ids=jnp.asarray(ids),
             attention_mask=jnp.asarray(mask),
             decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out2.logits, ref2) < 5e-5


def test_t5gemma_greedy_generate(tmp_path):
    torch.manual_seed(1)
    cfg = _cfg()
    tm = transformers.T5GemmaForConditionalGeneration(cfg).eval()
    d = str(tmp_path / "t5gemma_gen")
    tm.save_pretrained(d, safe_serialization=True)
    m = T5GemmaForConditionalGeneration.from_pretrained(d, dtype="float32")

    ids = np.array([[3, 17, 9, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(torch.from_numpy(ids), max_new_tokens=6,
                          do_sample=False, num_beams=1)
    got = m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=6,
                     eos_token_id=-1)
    ref_new = ref.numpy()[0][1:]  # drop decoder start
    got_new = np.asarray(got)[0][1:1 + len(ref_new)]
    np.testing.assert_array_equal(got_new, ref_new)
