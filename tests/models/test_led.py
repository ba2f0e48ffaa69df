"""LED parity: Longformer encoder (window+global) + BART decoder."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_encoder_position_embeddings=64, max_decoder_position_embeddings=64,
            attention_window=4, dropout=0.0, attention_dropout=0.0)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("led"))
    torch.manual_seed(0)
    cfg = transformers.LEDConfig(**TINY, attn_implementation="eager")
    tm = transformers.LEDForConditionalGeneration(cfg).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_logit_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    ids = np.array([[0, 5, 9, 3, 22, 7, 14, 2], [0, 8, 15, 2, 1, 1, 1, 1]])
    mask = np.array([[1] * 8, [1, 1, 1, 1, 0, 0, 0, 0]])
    glob = np.zeros((2, 8), np.int64)
    glob[:, 0] = 1
    dec = np.array([[2, 11, 13], [2, 7, 9]])
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                 global_attention_mask=torch.tensor(glob),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            global_attention_mask=jnp.asarray(glob), decoder_input_ids=jnp.asarray(dec))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    ids = np.array([[0, 5, 9, 3, 22, 7, 14, 2]])
    with torch.no_grad():
        ref = tm.generate(torch.tensor(ids), max_new_tokens=6, do_sample=False,
                          num_beams=1).numpy()
    out = np.asarray(m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=6))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
