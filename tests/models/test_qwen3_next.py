"""Qwen3-Next parity vs torch: gated DeltaNet linear-attention layers, gated
full-attention layers (partial rotary + sigmoid output gate), stacked-tensor
sparse MoE with shared expert, zero-centered RMSNorms."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import transformers_tpu as ttpu  # noqa: E402

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def torch_model(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen3NextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.25,
        linear_conv_kernel_dim=4, linear_key_head_dim=8, linear_value_head_dim=16,
        linear_num_key_heads=2, linear_num_value_heads=4,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        full_attention_interval=4, max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    tm = transformers.Qwen3NextForCausalLM(cfg).eval()
    d = str(tmp_path_factory.mktemp("qwen3_next") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return tm, d


def test_qwen3_next_parity(torch_model):
    import torch

    tm, d = torch_model
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[3, 17, 9, 42, 7, 11, 88, 5, 21, 60]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    diff = np.abs(np.asarray(out.logits) - ref).max()
    assert diff < 1e-4, f"logit diff {diff}"


def test_qwen3_next_cached_decode_matches_full(torch_model):
    """Prefill + recurrent single-token steps == one-shot forward: exercises
    the conv-window carry, the recurrent delta-rule step, and the KV cache."""
    _, d = torch_model
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[3, 17, 9, 42, 7, 11, 88, 5]], dtype=np.int64)
    full = m(m.params, input_ids=jnp.asarray(ids)).logits

    cache = m.init_cache(1, 8, dtype=jnp.float32)
    mask = np.zeros((1, 8), np.int32)
    mask[:, :5] = 1
    out = m(m.params, input_ids=jnp.asarray(ids[:, :5]), past_key_values=cache,
            attention_mask=jnp.asarray(mask), cache_position=0)
    cache = out.past_key_values
    logits = [np.asarray(out.logits)[:, -1]]
    for t in range(5, 8):
        mask[:, t] = 1
        step = m(m.params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                 attention_mask=jnp.asarray(mask),
                 position_ids=jnp.asarray([[t]]),
                 past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        logits.append(np.asarray(step.logits)[:, 0])
    stepped = np.stack(logits, axis=1)
    diff = np.abs(stepped - np.asarray(full)[:, 4:]).max()
    assert diff < 2e-4, f"cached decode diff {diff}"


def test_qwen3_next_generate_greedy_parity(torch_model):
    import torch

    tm, d = torch_model
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[3, 17, 9, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.from_numpy(ids), max_new_tokens=8,
                          do_sample=False)
    gen = m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=8,
                     prompt_pad_multiple=4)
    ours = np.asarray(gen)[0]
    ours = ours[ours != 0][-ref.shape[1]:]  # strip left pad bucket
    assert ours.tolist() == ref[0].tolist()
