"""NLLB-MoE parity vs torch: top-2 routed seq2seq forward, capacity drops,
batch-prioritized routing, greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

BASE = dict(vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=4, decoder_attention_heads=4,
            encoder_ffn_dim=48, decoder_ffn_dim=48, num_experts=4,
            encoder_sparse_step=2, decoder_sparse_step=2,
            max_position_embeddings=64, pad_token_id=1, bos_token_id=0,
            eos_token_id=2, decoder_start_token_id=2)


def build(tmp_path, **over):
    import torch
    import transformers

    cfg = transformers.NllbMoeConfig(**{**BASE, **over})
    torch.manual_seed(0)
    tm = transformers.NllbMoeForConditionalGeneration(cfg).eval()
    d = str(tmp_path)
    tm.save_pretrained(d, safe_serialization=True)
    from transformers_tpu.models.nllb_moe import NllbMoeForConditionalGeneration

    m = NllbMoeForConditionalGeneration.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    return tm, m


IDS = np.array([[4, 17, 9, 3, 22, 7, 14, 2], [5, 12, 9, 3, 1, 1, 1, 1]])
MASK = (IDS != 1).astype(np.int64)
DEC = np.array([[2, 8, 11, 6], [2, 9, 13, 5]])


@pytest.mark.parametrize("over", [
    {},
    {"batch_prioritized_routing": True, "normalize_router_prob_before_dropping": True},
    {"moe_eval_capacity_token_fraction": 0.4},
])
def test_forward_parity(tmp_path, over):
    import torch

    tm, m = build(tmp_path, **over)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(IDS),
                 attention_mask=torch.from_numpy(MASK),
                 decoder_input_ids=torch.from_numpy(DEC)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS),
            attention_mask=jnp.asarray(MASK),
            decoder_input_ids=jnp.asarray(DEC)).logits
    assert max_abs_diff(out, ref) < 2e-4, max_abs_diff(out, ref)


def test_greedy_generate_matches(tmp_path):
    import torch

    tm, m = build(tmp_path)
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.from_numpy(IDS),
                          attention_mask=torch.from_numpy(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1)
    got = m.generate(m.params, input_ids=jnp.asarray(IDS),
                     attention_mask=jnp.asarray(MASK),
                     max_new_tokens=6, do_sample=False)
    got = np.asarray(got)[:, : ref.shape[1]]
    assert np.array_equal(got, ref.numpy()[:, : got.shape[1]]), (got, ref)
