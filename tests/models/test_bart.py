"""BART parity tests vs torch reference."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

BART_TINY = dict(vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
                 encoder_attention_heads=4, decoder_attention_heads=4,
                 encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64)

IDS = np.array([[0, 5, 9, 3, 2], [0, 8, 15, 2, 1]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1], [1, 1, 1, 1, 0]], dtype=np.int64)
DEC = np.array([[2, 0, 11], [2, 0, 7]], dtype=np.int64)


@pytest.fixture(scope="module")
def bart_ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("bart"))
    torch.manual_seed(0)
    config = transformers.BartConfig(**BART_TINY, attn_implementation="eager")
    tm = transformers.BartForConditionalGeneration(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_logit_parity(bart_ckpt):
    import torch

    d, tm = bart_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
                decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(bart_ckpt):
    import torch

    d, tm = bart_ckpt
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK), max_new_tokens=6,
                                    forced_bos_token_id=tm.generation_config.forced_bos_token_id))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
