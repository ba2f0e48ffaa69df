"""LFM2 parity vs torch: gated short-conv layers + q/k-normed attention."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

from transformers_tpu.models.lfm2 import Lfm2ForCausalLM  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Lfm2Config(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, conv_L_cache=3,
        block_multiple_of=16, layer_types=["conv", "full_attention",
                                           "conv", "full_attention"],
        max_position_embeddings=128)
    tm = transformers.Lfm2ForCausalLM(cfg).eval()
    d = str(tmp_path_factory.mktemp("lfm2") / "ckpt")
    tm.save_pretrained(d, safe_serialization=True)
    return d, tm


def test_lfm2_parity(ckpt):
    import torch

    d, tm = ckpt
    m = Lfm2ForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.array([[3, 17, 9, 42, 7, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_lfm2_cached_decode_matches_full(ckpt):
    d, _ = ckpt
    m = Lfm2ForCausalLM.from_pretrained(d, dtype="float32")
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
                 attention_mask=jnp.asarray(mask), position_ids=jnp.asarray([[t]]),
                 past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        logits.append(np.asarray(step.logits)[:, 0])
    stepped = np.stack(logits, axis=1)
    diff = np.abs(stepped - np.asarray(full)[:, 4:]).max()
    assert diff < 2e-4, f"cached decode diff {diff}"
