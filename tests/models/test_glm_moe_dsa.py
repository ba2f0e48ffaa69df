"""GLM-MoE-DSA (GLM-5): reference-only family (no torch oracle in this
image's transformers build) — structural + behavioral tests: save/load
round-trip, cached decode == full forward through the shared-indexer path,
and the sparse top-k actually masking."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _cfg(**over):
    from transformers_tpu.models.glm_moe_dsa import GlmMoeDsaConfig

    kw = dict(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=8,
        qk_rope_head_dim=8, v_head_dim=8, n_routed_experts=4,
        n_shared_experts=1, num_experts_per_tok=2, first_k_dense_replace=1,
        n_group=2, topk_group=1, index_topk=4, index_head_dim=16,
        index_n_heads=2, index_topk_freq=2, index_skip_topk_offset=1)
    kw.update(over)
    return GlmMoeDsaConfig(**kw)


def test_glm_moe_dsa_roundtrip_and_sharing(tmp_path):
    from transformers_tpu.models.glm_moe_dsa import GlmMoeDsaForCausalLM

    cfg = _cfg()
    assert "shared" in cfg.indexer_types and "full" in cfg.indexer_types
    m = GlmMoeDsaForCausalLM(cfg, dtype=jnp.float32)
    m.params = m.init(jax.random.key(0))
    # shared layers carry no indexer params
    for i, kind in enumerate(cfg.indexer_types):
        has = "indexer" in m.params["model"]["layers"][str(i)]["self_attn"]
        assert has == (kind == "full"), (i, kind)

    ids = jnp.asarray([[3, 17, 9, 42, 7, 11, 23, 5]], jnp.int32)
    ref = m(m.params, input_ids=ids)
    assert np.isfinite(np.asarray(ref.logits)).all()

    d = str(tmp_path / "glmdsa")
    m.save_pretrained(d)
    m2 = GlmMoeDsaForCausalLM.from_pretrained(d, dtype="float32")
    assert not m2.load_report.missing_keys, m2.load_report.missing_keys
    out2 = m2(m2.params, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out2.logits), np.asarray(ref.logits),
                               atol=1e-6)


def test_glm_moe_dsa_cached_decode_matches_full():
    from transformers_tpu.models.glm_moe_dsa import GlmMoeDsaForCausalLM

    # index_topk >= seq so the sparse mask admits the full causal set and
    # cached decode must agree with the one-shot forward exactly
    cfg = _cfg(index_topk=16)
    m = GlmMoeDsaForCausalLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.key(1))
    ids = np.array([[3, 17, 9, 42, 7, 11]], np.int64)
    full = m(params, input_ids=jnp.asarray(ids))

    cache = m.init_cache(1, 6)
    pre = m(params, input_ids=jnp.asarray(ids[:, :4]), past_key_values=cache,
            cache_position=0,
            attention_mask=jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32))
    out = None
    for t in range(4, 6):
        am = np.zeros((1, 6), np.int32)
        am[0, :t + 1] = 1
        out = m(params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                past_key_values=out.past_key_values if out else pre.past_key_values,
                cache_position=t, attention_mask=jnp.asarray(am))
    np.testing.assert_allclose(np.asarray(out.logits[0, -1]),
                               np.asarray(full.logits[0, -1]), atol=2e-4)


def test_glm_moe_dsa_sparse_mask_bites():
    from transformers_tpu.models.glm_moe_dsa import GlmMoeDsaForCausalLM

    m_sparse = GlmMoeDsaForCausalLM(_cfg(index_topk=2), dtype=jnp.float32)
    params = m_sparse.init(jax.random.key(2))
    m_dense = GlmMoeDsaForCausalLM(_cfg(index_topk=16), dtype=jnp.float32)
    ids = jnp.asarray([[3, 17, 9, 42, 7, 11, 23, 5]], jnp.int32)
    a = np.asarray(m_sparse(params, input_ids=ids).logits)
    b = np.asarray(m_dense(params, input_ids=ids).logits)
    # early positions (<= topk keys available) agree; later ones diverge
    np.testing.assert_allclose(a[0, 0], b[0, 0], atol=1e-5)
    assert np.abs(a[0, -1] - b[0, -1]).max() > 1e-4
