"""Mamba2 (SSD) parity vs torch: chunked scan prefill, recurrent decode,
greedy generate, left padding."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(vocab_size=99, hidden_size=32, state_size=8, num_hidden_layers=2,
            conv_kernel=4, expand=2, num_heads=8, head_dim=8, n_groups=2,
            chunk_size=4)
IDS = np.array([[1, 5, 9, 3, 22, 7, 14, 2, 41, 6]], dtype=np.int64)


def make_torch(tmp_dir):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Mamba2Config(**TINY)
    tm = transformers.Mamba2ForCausalLM(cfg).eval()
    tm.save_pretrained(tmp_dir, safe_serialization=True)
    return tm


def test_logit_parity(tmp_path):
    import torch

    d = str(tmp_path / "mamba2")
    tm = make_torch(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys
    assert not m.load_report.unexpected_keys
    with torch.no_grad():
        ref = tm(torch.from_numpy(IDS)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(IDS)).logits
    assert max_abs_diff(out, ref) < 3e-5


def test_cached_decode_matches_full_forward(tmp_path):
    d = str(tmp_path / "mamba2_cache")
    make_torch(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    full = m(m.params, input_ids=jnp.asarray(IDS)).logits

    cache = m.init_cache(1, 16)
    prefill = m(m.params, input_ids=jnp.asarray(IDS[:, :6]), past_key_values=cache)
    cache = prefill.past_key_values
    assert cache.initialized
    logits_steps = [prefill.logits[:, -1]]
    for t in range(6, IDS.shape[1]):
        step = m(m.params, input_ids=jnp.asarray(IDS[:, t:t + 1]), past_key_values=cache)
        cache = step.past_key_values
        logits_steps.append(step.logits[:, -1])
    for i, l in enumerate(logits_steps):
        assert max_abs_diff(l, np.asarray(full[:, 5 + i])) < 2e-5, i


def test_chunked_prefill_with_state(tmp_path):
    """Prefill in two multi-token pieces == one-shot prefill (conv window +
    SSD initial_state path)."""
    d = str(tmp_path / "mamba2_chunked")
    make_torch(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    full = m(m.params, input_ids=jnp.asarray(IDS)).logits

    cache = m.init_cache(1, 16)
    p1 = m(m.params, input_ids=jnp.asarray(IDS[:, :5]), past_key_values=cache)
    p2 = m(m.params, input_ids=jnp.asarray(IDS[:, 5:]), past_key_values=p1.past_key_values)
    assert max_abs_diff(p2.logits[:, -1], np.asarray(full[:, -1])) < 2e-5


def test_greedy_generate_matches_torch(tmp_path):
    import torch

    d = str(tmp_path / "mamba2_gen")
    tm = make_torch(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    gen = m.generate(m.params, input_ids=jnp.asarray(IDS), max_new_tokens=6,
                     do_sample=False, prompt_pad_multiple=8, eos_token_id=-1)
    with torch.no_grad():
        tgen = tm.generate(torch.from_numpy(IDS), max_new_tokens=6, do_sample=False)
    np.testing.assert_array_equal(np.asarray(gen)[0, -6:], tgen.numpy()[0, -6:])


def test_left_padded_prefill_state_exact(tmp_path):
    d = str(tmp_path / "mamba2_pad")
    make_torch(d)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ref = m(m.params, input_ids=jnp.asarray(IDS)).logits[:, -1]
    padded = np.concatenate([np.zeros((1, 4), np.int64), IDS], axis=1)
    mask = np.concatenate([np.zeros((1, 4), np.int64), np.ones_like(IDS)], axis=1)
    out = m(m.params, input_ids=jnp.asarray(padded),
            attention_mask=jnp.asarray(mask)).logits[:, -1]
    assert max_abs_diff(out, np.asarray(ref)) < 2e-5
