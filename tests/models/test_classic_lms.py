"""Parity for CTRL, OpenAI GPT, XLM vs torch."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

RNG = np.random.default_rng(0)
IDS = np.array([[3, 17, 9, 42, 7, 11]], dtype=np.int64)


def test_ctrl_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.ctrl import CTRLLMHeadModel

    torch.manual_seed(0)
    cfg = transformers.CTRLConfig(vocab_size=99, n_embd=32, n_layer=2, n_head=4,
                                  dff=64, n_positions=64)
    tm = transformers.CTRLLMHeadModel(cfg).eval()
    d = str(tmp_path / "ctrl")
    tm.save_pretrained(d, safe_serialization=True)
    m = CTRLLMHeadModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_openai_gpt_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.openai import OpenAIGPTLMHeadModel

    torch.manual_seed(0)
    cfg = transformers.OpenAIGPTConfig(vocab_size=99, n_embd=32, n_layer=2,
                                       n_head=4, n_positions=64)
    tm = transformers.OpenAIGPTLMHeadModel(cfg).eval()
    d = str(tmp_path / "gpt1")
    tm.save_pretrained(d, safe_serialization=True)
    m = OpenAIGPTLMHeadModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_xlm_parity(tmp_path):
    import torch
    import transformers

    from transformers_tpu.models.xlm import XLMWithLMHeadModel

    torch.manual_seed(0)
    cfg = transformers.XLMConfig(vocab_size=99, emb_dim=32, n_layers=2, n_heads=4,
                                 max_position_embeddings=64, n_langs=2,
                                 use_lang_emb=True, gelu_activation=True)
    tm = transformers.XLMWithLMHeadModel(cfg).eval()
    d = str(tmp_path / "xlm")
    tm.save_pretrained(d, safe_serialization=True)
    m = XLMWithLMHeadModel.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    mask = np.array([[1, 1, 1, 1, 1, 0]], dtype=np.int64)
    langs = np.zeros_like(IDS)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(mask),
                 langs=torch.from_numpy(langs)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(mask),
            langs=jnp.asarray(langs))
    assert max_abs_diff(out.logits, ref) < 5e-5
