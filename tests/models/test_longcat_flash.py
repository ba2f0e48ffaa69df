"""LongCat-Flash parity vs torch: dual-sublayer MLA blocks with shortcut MoE
including zero-computation identity experts."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _cfg():
    return transformers.LongcatFlashConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_attention_heads=4,
        ffn_hidden_size=64, q_lora_rank=24, kv_lora_rank=16,
        qk_nope_head_dim=8, qk_rope_head_dim=8, v_head_dim=8, head_dim=8,
        moe_topk=3,
        n_routed_experts=4, zero_expert_num=2, expert_ffn_hidden_size=32,
        routed_scaling_factor=1.5)


def test_longcat_flash_parity(tmp_path):
    from transformers_tpu.models.longcat_flash import LongcatFlashForCausalLM

    torch.manual_seed(0)
    tm = transformers.LongcatFlashForCausalLM(_cfg()).eval()
    # give the correction bias distinct values so top-k selection differs
    # from plain score order (exercises the corrected-selection path)
    with torch.no_grad():
        for layer in tm.model.layers:
            layer.mlp.router.e_score_correction_bias.uniform_(-0.05, 0.05)
    d = str(tmp_path / "longcat")
    tm.save_pretrained(d, safe_serialization=True)

    m = LongcatFlashForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys

    ids = np.array([[3, 17, 9, 42, 7, 11, 23, 5]], np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref.numpy()) < 3e-4


def test_longcat_flash_cached_decode(tmp_path):
    import jax

    from transformers_tpu.models.longcat_flash import (
        LongcatFlashConfig,
        LongcatFlashForCausalLM,
    )

    cfg = LongcatFlashConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_attention_heads=4,
        ffn_hidden_size=64, q_lora_rank=24, kv_lora_rank=16,
        qk_nope_head_dim=8, qk_rope_head_dim=8, v_head_dim=8, moe_topk=2,
        n_routed_experts=4, zero_expert_num=2, expert_ffn_hidden_size=32)
    m = LongcatFlashForCausalLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.key(0))
    ids = np.array([[3, 17, 9, 42, 7, 11]], np.int64)
    full = m(params, input_ids=jnp.asarray(ids))
    cache = m.init_cache(1, 6)
    am = np.zeros((1, 6), np.int32)
    am[0, :5] = 1
    pre = m(params, input_ids=jnp.asarray(ids[:, :5]), past_key_values=cache,
            cache_position=0, attention_mask=jnp.asarray(am))
    am[0, :6] = 1
    step = m(params, input_ids=jnp.asarray(ids[:, 5:6]),
             past_key_values=pre.past_key_values, cache_position=5,
             attention_mask=jnp.asarray(am))
    np.testing.assert_allclose(np.asarray(step.logits[0, -1]),
                               np.asarray(full.logits[0, -1]), atol=2e-4)
