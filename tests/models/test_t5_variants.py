"""UMT5 (per-layer relative bias) and Switch Transformers (top-1 MoE FF)
parity vs torch — both ride the shared T5 stack."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[5, 9, 3, 22, 7, 1], [4, 8, 15, 1, 0, 0]], dtype=np.int64)
MASK = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]], dtype=np.int64)
DEC = np.array([[0, 11, 13], [0, 7, 9]], dtype=np.int64)

FAMILIES = {
    "umt5": ("UMT5Config", "UMT5ForConditionalGeneration", dict(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        decoder_start_token_id=0)),
    "switch": ("SwitchTransformersConfig", "SwitchTransformersForConditionalGeneration", dict(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_sparse_encoder_layers=1, num_sparse_decoder_layers=1,
        num_heads=4, num_experts=4, expert_capacity=64,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        router_jitter_noise=0.0, decoder_start_token_id=0)),
    "switch-tight-capacity": ("SwitchTransformersConfig", "SwitchTransformersForConditionalGeneration", dict(
        vocab_size=99, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_sparse_encoder_layers=1, num_sparse_decoder_layers=1,
        num_heads=4, num_experts=4, expert_capacity=2,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        router_jitter_noise=0.0, decoder_start_token_id=0)),
}


def make_tiny(tmp_dir, family):
    import torch
    import transformers

    cfg_name, arch_name, cfg = FAMILIES[family]
    torch.manual_seed(0)
    config = getattr(transformers, cfg_name)(**cfg, attn_implementation="eager")
    tm = getattr(transformers, arch_name)(config).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_forward_logit_parity(family, tmp_path):
    import torch

    d = str(tmp_path / family)
    tm = make_tiny(d, family)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                 decoder_input_ids=torch.tensor(DEC)).logits.numpy()
    out = model(model.params, input_ids=jnp.asarray(IDS), attention_mask=jnp.asarray(MASK),
                decoder_input_ids=jnp.asarray(DEC))
    assert max_abs_diff(out.logits, ref) < 5e-5, family


@pytest.mark.parametrize("family", ["umt5", "switch"])
def test_greedy_generate_matches_torch(family, tmp_path):
    import torch

    d = str(tmp_path / family)
    tm = make_tiny(d, family)
    model = ttpu.AutoModelForSeq2SeqLM.from_pretrained(d, dtype="float32")
    with torch.no_grad():
        ref = tm.generate(torch.tensor(IDS), attention_mask=torch.tensor(MASK),
                          max_new_tokens=6, do_sample=False, num_beams=1).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(IDS),
                                    attention_mask=jnp.asarray(MASK), max_new_tokens=6))
    n = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :n], ref[:, :n])
