"""RecurrentGemma (Griffin) parity vs torch: RG-LRU recurrent blocks +
sliding-window attention, forward logits + greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[2, 5, 9, 3, 22, 7, 14, 4], [2, 8, 15, 4, 11, 17, 6, 9]],
               dtype=np.int64)
MASK = np.ones_like(IDS)


def make_tiny(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.RecurrentGemmaConfig(
        num_hidden_layers=3, vocab_size=99, hidden_size=32,
        intermediate_size=96, num_attention_heads=4, lru_width=32,
        attention_window_size=16, conv1d_width=4,
        block_types=("recurrent", "recurrent", "attention"),
        attn_implementation="eager")
    tm = transformers.RecurrentGemmaForCausalLM(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_forward_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "rg")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS),
                 attention_mask=torch.tensor(MASK)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS),
                attention_mask=jnp.asarray(MASK))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "rg-gen")
    tm = make_tiny(d)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(IDS),
                          attention_mask=torch.tensor(MASK), max_new_tokens=8,
                          do_sample=False).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK),
                                    max_new_tokens=8,
                                    prompt_pad_multiple=IDS.shape[1]))
    np.testing.assert_array_equal(out[:, :ref.shape[1]], ref)
