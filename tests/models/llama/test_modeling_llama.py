"""Llama unit + parity tests (reference pattern: tests/models/llama/test_modeling_llama.py
with tests/causal_lm_tester.py tiny-config testers + logit-parity goldens)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from parity_utils import make_tiny_torch_llama, max_abs_diff, torch_logits  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_llama"))
    torch_model, config = make_tiny_torch_llama(d)
    return d, torch_model


def test_forward_logit_parity(tiny_ckpt):
    d, torch_model = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    ref = torch_logits(torch_model, ids)
    out = model(model.params, input_ids=jnp.asarray(ids))
    diff = max_abs_diff(out.logits, ref)
    assert diff < 2e-5, f"logit diff {diff}"


def test_padded_batch_parity(tiny_ckpt):
    """Left-padded batch rows must match per-row unpadded logits (explicit
    position_ids, as the reference's generate() provides them)."""
    d, torch_model = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[0, 0, 4, 8, 15, 16], [23, 42, 11, 7, 2, 9]], dtype=np.int64)
    mask = np.array([[0, 0, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]], dtype=np.int64)
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    out = model(model.params, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                position_ids=jnp.asarray(pos))
    # row 0 unpadded
    ref0 = torch_logits(torch_model, ids[:1, 2:])
    diff0 = max_abs_diff(out.logits[0, 2:], ref0[0])
    # row 1 full
    ref1 = torch_logits(torch_model, ids[1:])
    diff1 = max_abs_diff(out.logits[1], ref1[0])
    assert diff0 < 2e-5 and diff1 < 2e-5, (diff0, diff1)


def test_cached_decode_matches_full_forward(tiny_ckpt):
    """Incremental decode with StaticKVCache == one-shot full forward."""
    d, _ = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    params = model.params
    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int32)
    full = model(params, input_ids=jnp.asarray(ids))
    cache = model.init_cache(1, 8, dtype=jnp.float32)
    mask = np.zeros((1, 8), np.int32)
    # prefill first 4
    mask[:, :4] = 1
    out = model(params, input_ids=jnp.asarray(ids[:, :4]), attention_mask=jnp.asarray(mask),
                past_key_values=cache, cache_position=0)
    assert max_abs_diff(out.logits, full.logits[:, :4]) < 1e-4
    cache = out.past_key_values
    # decode one at a time
    for t in range(4, 8):
        mask[:, t] = 1
        step = model(params, input_ids=jnp.asarray(ids[:, t : t + 1]),
                     attention_mask=jnp.asarray(mask),
                     position_ids=jnp.asarray([[t]]),
                     past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full.logits[:, t]) < 1e-4, f"step {t}"


def test_greedy_generate_matches_torch(tiny_ckpt):
    d, torch_model = tiny_ckpt
    import torch

    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model.generate(
            torch.tensor(ids), max_new_tokens=10, do_sample=False,
            pad_token_id=0,
        ).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=10, prompt_pad_multiple=4))
    # ours is left-padded to bucket 4 == prompt, so sequences align directly
    assert out.shape == (1, 14)
    np.testing.assert_array_equal(out[0], ref[0])


def test_generate_batch_left_padding(tiny_ckpt):
    """Batched generation with ragged prompts == per-row generation."""
    d, _ = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    p1 = np.array([4, 8, 15], dtype=np.int32)
    p2 = np.array([23, 42, 11, 7, 2], dtype=np.int32)
    # batched: left-pad to 5
    ids = np.stack([np.concatenate([[0, 0], p1]), p2])
    mask = np.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], np.int32)
    batched = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                        attention_mask=jnp.asarray(mask),
                                        max_new_tokens=6, prompt_pad_multiple=1))
    single1 = np.asarray(model.generate(model.params, input_ids=jnp.asarray(p1[None]),
                                        max_new_tokens=6, prompt_pad_multiple=1))
    single2 = np.asarray(model.generate(model.params, input_ids=jnp.asarray(p2[None]),
                                        max_new_tokens=6, prompt_pad_multiple=1))
    np.testing.assert_array_equal(batched[0, 5:], single1[0, 3:9])
    np.testing.assert_array_equal(batched[1, 5:], single2[0, 5:11])


def test_save_load_roundtrip(tiny_ckpt, tmp_path):
    d, _ = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    out_dir = str(tmp_path / "resaved")
    model.save_pretrained(out_dir)
    model2 = ttpu.AutoModelForCausalLM.from_pretrained(out_dir, dtype="float32")
    ids = jnp.asarray([[1, 5, 9, 3]])
    l1 = model(model.params, input_ids=ids).logits
    l2 = model2(model2.params, input_ids=ids).logits
    assert max_abs_diff(l1, l2) == 0.0


def test_saved_checkpoint_loads_in_torch(tiny_ckpt, tmp_path):
    """Hub-compat: our save_pretrained must be loadable by the reference."""
    d, torch_model = tiny_ckpt
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    out_dir = str(tmp_path / "torch_compat")
    model.save_pretrained(out_dir)
    from transformers import LlamaForCausalLM

    reloaded = LlamaForCausalLM.from_pretrained(out_dir)
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    ref = torch_logits(torch_model, ids)
    new = torch_logits(reloaded, ids)
    assert max_abs_diff(ref, new) < 1e-6


def test_tied_embeddings(tmp_path):
    d = str(tmp_path / "tied")
    torch_model, _ = make_tiny_torch_llama(d, tie_word_embeddings=True)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    ref = torch_logits(torch_model, ids)
    out = model(model.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 2e-5


def test_gqa_and_rope_scaling(tmp_path):
    d = str(tmp_path / "scaled")
    torch_model, _ = make_tiny_torch_llama(
        d, num_attention_heads=4, num_key_value_heads=1,
        rope_scaling={"rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
                      "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
    )
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[7, 3, 1, 9, 4, 4, 2]], dtype=np.int64)
    ref = torch_logits(torch_model, ids)
    out = model(model.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 2e-5


def test_loss_computation(tiny_ckpt):
    d, torch_model = tiny_ckpt
    import torch

    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3, 22, 7]], dtype=np.int64)
    labels = np.array([[1, 5, -100, 3, 22, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model(input_ids=torch.tensor(ids), labels=torch.tensor(labels)).loss.item()
    out = model(model.params, input_ids=jnp.asarray(ids), labels=jnp.asarray(labels))
    assert abs(float(out.loss) - ref) < 1e-5
