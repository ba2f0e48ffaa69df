"""Hybrid SSM+attention decoder families (Bamba/Jamba/...) — parity vs torch:
full-forward logits, cached decode self-consistency, greedy generate."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = np.array([[1, 5, 9, 3, 22, 7, 14, 2, 41, 6]], dtype=np.int64)

# family -> (hf config class, tiny config)
FAMILIES = {
    "bamba": ("BambaConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, attn_layer_indices=[1, 3],
        mamba_n_heads=8, mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_n_groups=2, mamba_chunk_size=4, max_position_embeddings=256)),
    "jamba": ("JambaConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=4,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=256,
        use_mamba_kernels=False)),
    "granitemoehybrid": ("GraniteMoeHybridConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, shared_intermediate_size=48,
        num_local_experts=4, num_experts_per_tok=2, mamba_n_heads=8, mamba_d_head=8,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_n_groups=2,
        mamba_chunk_size=4, embedding_multiplier=6.0, logits_scaling=3.0,
        residual_multiplier=0.5, attention_multiplier=0.3,
        layer_types=["mamba", "attention", "mamba", "attention"],
        max_position_embeddings=256)),
    "granitemoehybrid-rope-dense": ("GraniteMoeHybridConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, shared_intermediate_size=48,
        num_local_experts=0, position_embedding_type="rope", mamba_n_heads=8,
        mamba_d_head=8, mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_n_groups=2, mamba_chunk_size=4,
        layer_types=["mamba", "attention", "mamba", "attention"],
        max_position_embeddings=256)),
    "falcon_h1": ("FalconH1Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, mamba_n_heads=4,
        mamba_d_head=8, mamba_d_state=8, mamba_d_conv=4, mamba_d_ssm=32,
        mamba_n_groups=2, mamba_chunk_size=4, max_position_embeddings=256,
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        mlp_multipliers=[0.5, 2.0], key_multiplier=0.7,
        attention_in_multiplier=1.5, attention_out_multiplier=0.6,
        ssm_multipliers=[0.9, 1.1, 0.8, 1.2, 1.3],
        ssm_in_multiplier=1.4, ssm_out_multiplier=0.9)),
    "falcon_h1-rmsnorm": ("FalconH1Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, mamba_n_heads=4,
        mamba_d_head=8, mamba_d_state=8, mamba_d_conv=4, mamba_d_ssm=32,
        mamba_n_groups=2, mamba_chunk_size=4, max_position_embeddings=256,
        mamba_rms_norm=True, mamba_norm_before_gate=True)),
}


def make_torch(name, tmp_dir):
    import torch
    import transformers

    cfg_name, cfg_kwargs = FAMILIES[name]
    torch.manual_seed(0)
    cfg = getattr(transformers, cfg_name)(**cfg_kwargs)
    model_cls = getattr(transformers, cfg.architectures[0]) if cfg.architectures else None
    if model_cls is None:
        from transformers import AutoModelForCausalLM

        tm = AutoModelForCausalLM.from_config(cfg).eval()
    else:
        tm = model_cls(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_logit_parity(name, tmp_path):
    import torch

    d = str(tmp_path / name)
    tm = make_torch(name, d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 3e-5


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_cached_decode_matches_full_forward(name, tmp_path):
    d = str(tmp_path / (name + "_cache"))
    make_torch(name, d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    full = m(m.params, input_ids=jnp.asarray(IDS)).logits

    cache = m.init_cache(1, IDS.shape[1] + 4)
    prefill = m(m.params, input_ids=jnp.asarray(IDS[:, :6]),
                attention_mask=jnp.ones((1, IDS.shape[1] + 4), jnp.int32),
                past_key_values=cache)
    cache = prefill.past_key_values
    logits_steps = [prefill.logits[:, -1]]
    for t in range(6, IDS.shape[1]):
        step = m(m.params, input_ids=jnp.asarray(IDS[:, t:t + 1]),
                 attention_mask=jnp.ones((1, IDS.shape[1] + 4), jnp.int32),
                 past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        logits_steps.append(step.logits[:, -1])
    for i, l in enumerate(logits_steps):
        assert max_abs_diff(l, np.asarray(full[:, 5 + i])) < 2e-5, i


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_greedy_generate_matches_torch(name, tmp_path):
    import torch

    d = str(tmp_path / (name + "_gen"))
    tm = make_torch(name, d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    gen = m.generate(m.params, input_ids=jnp.asarray(IDS), max_new_tokens=6,
                     do_sample=False, prompt_pad_multiple=8)
    with torch.no_grad():
        tgen = tm.generate(torch.from_numpy(IDS), max_new_tokens=6, do_sample=False)
    # torch stops at EOS; compare the region torch actually generated
    tnew = tgen.numpy()[0, IDS.shape[1]:]
    assert len(tnew) >= 1
    np.testing.assert_array_equal(np.asarray(gen)[0, -6:][: len(tnew)], tnew)
