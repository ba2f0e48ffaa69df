"""Zamba parity: shared attention block over concat(h, embeds) + multi-head
mamba1 mixers with per-head selective B/C."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

CFG = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
           num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=4,
           attn_layer_period=3, attn_layer_offset=2, mamba_expand=2,
           mamba_d_state=8, mamba_d_conv=4, mamba_dt_rank=4, n_mamba_heads=2,
           max_position_embeddings=128, tie_word_embeddings=False,
           use_mamba_kernels=False,
           pad_token_id=0, bos_token_id=1, eos_token_id=2)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    d = str(tmp_path_factory.mktemp("zamba"))
    torch.manual_seed(0)
    config = transformers.ZambaConfig(**CFG, attn_implementation="eager")
    tm = transformers.ZambaForCausalLM(config).eval()
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_forward_logit_parity(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.array([[5, 9, 3, 22, 7, 11, 4, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_cached_decode_matches_full(ckpt):
    d, _ = ckpt
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[5, 9, 3, 22, 7, 11]], dtype=np.int64)
    full = m(m.params, input_ids=jnp.asarray(ids)).logits

    cache = m.init_cache(1, 16)
    out = m(m.params, input_ids=jnp.asarray(ids[:, :4]),
            attention_mask=jnp.asarray((np.arange(16) < 4)[None].astype(np.int64)),
            past_key_values=cache, cache_position=0)
    cache = out.past_key_values
    logits = [out.logits[:, -1]]
    for t in range(4, 6):
        out = m(m.params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                attention_mask=jnp.asarray((np.arange(16) <= t)[None].astype(np.int64)),
                past_key_values=cache, cache_position=t)
        cache = out.past_key_values
        logits.append(out.logits[:, -1])
    inc = jnp.stack(logits, axis=1)
    assert max_abs_diff(inc, full[:, 3:6]) < 2e-4


def test_greedy_generate_matches_torch(ckpt):
    import torch

    d, tm = ckpt
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[5, 9, 3, 22, 7, 11, 4, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = tm.generate(input_ids=torch.tensor(ids), max_new_tokens=6,
                          do_sample=False, pad_token_id=0).numpy()
    out = m.generate(m.params, input_ids=jnp.asarray(ids), max_new_tokens=6,
                     prompt_pad_multiple=8)
    np.testing.assert_array_equal(np.asarray(out)[0], ref[0])
