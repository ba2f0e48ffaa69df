"""Round-3 decoder families absent from the installed wheel — parity vs the
reference SOURCE TREE (v5.15-dev) through the subprocess oracle
(tests/ref_oracle.py): cwm, jais2, solar_open, granite_swa."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402
from ref_oracle import reference_run  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

IDS = [[1, 5, 9, 3, 22, 7, 14, 2]]

# family -> (reference classes, tiny config kwargs, post-build snippet)
FAMILIES = {
    "cwm": ("CwmConfig", "CwmForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        sliding_window=4, max_position_embeddings=128), ""),
    "jais2": ("Jais2Config", "Jais2ForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128), ""),
    "solar_open": ("SolarOpenConfig", "SolarOpenForCausalLM", dict(
        vocab_size=99, hidden_size=32, moe_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, n_routed_experts=4, num_experts_per_tok=2, n_group=1,
        topk_group=1, n_shared_experts=1, max_position_embeddings=128), ""),
    "granite_swa": ("GraniteSWAConfig", "GraniteSWAForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, sliding_window=4,
        max_position_embeddings=128, embedding_multiplier=2.0,
        logits_scaling=3.0, residual_multiplier=0.5, attention_multiplier=0.3,
        layer_rope_theta=[10000.0, 0, 10000.0, 500000.0]),
     # randomize the (zero-init) sinks so the test actually exercises them
     "for l in m.model.layers:\n"
     "    torch.nn.init.normal_(l.self_attn.sinks)\n"),
    "minimax_m2": ("MiniMaxM2Config", "MiniMaxM2ForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_local_experts=4, num_experts_per_tok=2, bos_token_id=1,
        eos_token_id=2, max_position_embeddings=128),
     # randomize the router-choice bias buffers (zero-init)
     "for l in m.model.layers:\n"
     "    torch.nn.init.normal_(l.mlp.e_score_correction_bias)\n"),
    "glm4_moe_lite": ("Glm4MoeLiteConfig", "Glm4MoeLiteForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, n_routed_experts=4, num_experts_per_tok=2,
        kv_lora_rank=16, q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=8,
        v_head_dim=8, max_position_embeddings=128),
     "for l in m.model.layers[1:]:\n"
     "    torch.nn.init.normal_(l.mlp.gate.e_score_correction_bias)\n"),
    "minicpm3": ("MiniCPM3Config", "MiniCPM3ForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=16,
        q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        scale_emb=2.0, scale_depth=1.4, dim_model_base=16,
        max_position_embeddings=128), ""),
    "youtu": ("YoutuConfig", "YoutuForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=16,
        q_lora_rank=24, qk_rope_head_dim=8, qk_nope_head_dim=8, v_head_dim=8,
        bos_token_id=1, eos_token_id=2, max_position_embeddings=128), ""),
    "exaone_moe": ("ExaoneMoeConfig", "ExaoneMoeForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128),
     "for l in m.model.layers[1:]:\n"
     "    torch.nn.init.normal_(l.mlp.gate.e_score_correction_bias)\n"),
    "lfm2_moe": ("Lfm2MoeConfig", "Lfm2MoeForCausalLM", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=32, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        num_dense_layers=1, max_position_embeddings=128,
        layer_types=["conv", "full_attention", "conv", "full_attention"]),
     "for l in m.model.layers[1:]:\n"
     "    torch.nn.init.normal_(l.feed_forward.expert_bias)\n"),
}


def _oracle_build(tmp_path, family):
    cfg_cls, model_cls, cfg, extra = FAMILIES[family]
    d = str(tmp_path / family)
    out = reference_run(f"""
from transformers import {cfg_cls}, {model_cls}
cfg = {cfg_cls}(**{cfg!r})
m = {model_cls}(cfg).eval()
{extra}
m.save_pretrained({d!r}, safe_serialization=True)
ids = torch.tensor({IDS!r})
with torch.no_grad():
    logits = m(ids).logits
outputs = {{"logits": logits}}
""")
    return d, out["logits"]


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_logit_parity(family, tmp_path):
    d, ref = _oracle_build(tmp_path, family)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    out = m(m.params, input_ids=jnp.asarray(np.asarray(IDS)))
    diff = max_abs_diff(out.logits, ref)
    # glm4_moe_lite's routed_scaling_factor=1.8 over fp32 MLA amplifies
    # reduction-order noise slightly past the usual 3e-5
    tol = 1e-4 if family == "glm4_moe_lite" else 3e-5
    assert diff < tol, f"{family}: logit diff {diff}"


@pytest.mark.parametrize("family", ["cwm", "granite_swa"])
def test_cached_decode_matches_full(family, tmp_path):
    """Sliding windows + NoPE/per-theta rope under cache geometry."""
    d, _ = _oracle_build(tmp_path, family)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.asarray(IDS, np.int32)
    full = m(m.params, input_ids=jnp.asarray(ids))
    cache = m.init_cache(1, 8, dtype=jnp.float32)
    mask = np.zeros((1, 8), np.int32)
    mask[:, :4] = 1
    out = m(m.params, input_ids=jnp.asarray(ids[:, :4]),
            attention_mask=jnp.asarray(mask), past_key_values=cache,
            cache_position=0)
    assert max_abs_diff(out.logits, full.logits[:, :4]) < 1e-4
    cache = out.past_key_values
    for t in range(4, 8):
        mask[:, t] = 1
        step = m(m.params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                 attention_mask=jnp.asarray(mask), position_ids=jnp.asarray([[t]]),
                 past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full.logits[:, t]) < 1e-4, f"step {t}"
