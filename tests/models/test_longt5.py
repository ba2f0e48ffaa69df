"""LongT5 parity vs torch: block-local and transient-global encoder
attention on sequences longer than one block, plus greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

rng = np.random.RandomState(0)
# 11 tokens: with local_radius=3 (block_len 4) → 3 blocks incl. a ragged one
IDS = rng.randint(3, 90, size=(2, 11)).astype(np.int64)
MASK = np.ones((2, 11), dtype=np.int64)
MASK[1, 8:] = 0
DEC = np.array([[0, 11, 13], [0, 7, 9]], dtype=np.int64)

CFG = dict(vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
           num_heads=4, relative_attention_num_buckets=8,
           relative_attention_max_distance=16, local_radius=3,
           global_block_size=2, decoder_start_token_id=0)


def make_tiny(tmp_dir, attention_type):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.LongT5Config(**CFG, encoder_attention_type=attention_type,
                                       attn_implementation="eager")
    tm = transformers.LongT5ForConditionalGeneration(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("attention_type", ["local", "transient-global"])
def test_forward_logit_parity(attention_type, tmp_path):
    import torch

    d = str(tmp_path / attention_type)
    tm = make_tiny(d, attention_type)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS),
                attention_mask=jnp.asarray(MASK), decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5, attention_type


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "local-gen")
    tm = make_tiny(d, "local")
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK), max_new_tokens=6))
    n = ref.shape[1]
    np.testing.assert_array_equal(out[:, :n], ref)
