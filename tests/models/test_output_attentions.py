"""``output_attentions=True`` parity vs torch (reference returns per-layer
[B, H, Q, KV] softmax probabilities from the eager path)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import transformers_tpu as ttpu  # noqa: E402


def test_llama_attentions_match_torch(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        attn_implementation="eager")
    tm = transformers.LlamaForCausalLM(config).eval()
    d = str(tmp_path / "llama")
    tm.save_pretrained(d, safe_serialization=True)

    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), output_attentions=True)
    out = model(model.params, input_ids=jnp.asarray(ids), output_attentions=True)

    assert out.attentions is not None and len(out.attentions) == 3
    for ours, theirs in zip(out.attentions, ref.attentions):
        assert ours.shape == tuple(theirs.shape)  # [B, H, Q, KV]
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-6)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(np.asarray(out.attentions[0]).sum(-1), 1.0, atol=1e-5)


def test_llama_attentions_with_cache_decode(tmp_path):
    """Single-token decode step returns [B, H, 1, max_len] probs (padded kv
    slots get ~0 mass)."""
    config = ttpu.LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64)
    model = ttpu.LlamaForCausalLM(config, dtype=jnp.float32)
    params = model.init_params(0)
    ids = jnp.asarray([[1, 5, 9, 3]])
    cache = model.init_cache(1, 8)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]])
    prefill_mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]])
    out = model(params, input_ids=ids, attention_mask=prefill_mask,
                past_key_values=cache, cache_position=0)
    step = model(params, input_ids=jnp.asarray([[7]]), attention_mask=mask,
                 past_key_values=out.past_key_values, cache_position=4,
                 output_attentions=True)
    probs = np.asarray(step.attentions[0])
    assert probs.shape == (1, 4, 1, 8)
    np.testing.assert_allclose(probs[..., 5:].sum(), 0.0, atol=1e-6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_bert_attentions_match_torch(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.BertConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        attn_implementation="eager")
    tm = transformers.BertModel(config).eval()
    d = str(tmp_path / "bert")
    tm.save_pretrained(d, safe_serialization=True)

    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    ids = np.array([[2, 5, 9, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), output_attentions=True)
    out = model(model.params, input_ids=jnp.asarray(ids), output_attentions=True)
    assert len(out.attentions) == 2
    for ours, theirs in zip(out.attentions, ref.attentions):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-6)


def test_vit_attentions_match_torch(tmp_path):
    import torch
    import transformers

    torch.manual_seed(0)
    config = transformers.ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8, num_channels=3,
        attn_implementation="eager")
    tm = transformers.ViTModel(config).eval()
    d = str(tmp_path / "vit")
    tm.save_pretrained(d, safe_serialization=True)

    model = ttpu.AutoModel.from_pretrained(d, dtype="float32")
    pixels = np.random.default_rng(0).normal(size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(pixels), output_attentions=True)
    out = model(model.params, pixel_values=jnp.asarray(pixels), output_attentions=True)
    assert len(out.attentions) == 2
    for ours, theirs in zip(out.attentions, ref.attentions):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=3e-6)
