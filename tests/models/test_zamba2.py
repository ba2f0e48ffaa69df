"""Zamba2 parity: cycled shared transformer blocks (num_mem_blocks) with
untied LoRA-style adapters + optional mem-rope over Mamba2 SSD mixers."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

BASE = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=4,
            layers_block_type=["mamba", "hybrid", "mamba", "hybrid", "mamba",
                               "hybrid"],
            mamba_expand=2, mamba_d_state=8, mamba_d_conv=4, mamba_ngroups=1,
            n_mamba_heads=4, chunk_size=8, max_position_embeddings=128,
            tie_word_embeddings=False, use_mamba_kernels=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)

VARIANTS = {
    "base": dict(BASE, num_mem_blocks=1),
    "two-blocks-adapters-rope": dict(
        BASE, num_mem_blocks=2, use_shared_attention_adapter=True,
        adapter_rank=4, use_mem_rope=True),
}


def _build(name, tmp_path):
    import torch
    import transformers

    d = str(tmp_path / name)
    torch.manual_seed(0)
    config = transformers.Zamba2Config(**VARIANTS[name], attn_implementation="eager")
    tm = transformers.Zamba2ForCausalLM(config).eval()
    # the wheel's safetensors save rejects the tied shared-block tensors;
    # the legacy .bin writer handles shared storage (and exercises our
    # legacy-checkpoint reader)
    tm.save_pretrained(d, safe_serialization=False)
    return d, tm


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_forward_logit_parity(name, tmp_path):
    import torch

    d, tm = _build(name, tmp_path)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not m.load_report.missing_keys, m.load_report.missing_keys
    assert not m.load_report.unexpected_keys, m.load_report.unexpected_keys
    ids = np.array([[5, 9, 3, 22, 7, 11, 4, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids)).logits.numpy()
    out = m(m.params, input_ids=jnp.asarray(ids))
    assert max_abs_diff(out.logits, ref) < 5e-5


def test_cached_decode_matches_full(tmp_path):
    d, _ = _build("two-blocks-adapters-rope", tmp_path)
    m = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[5, 9, 3, 22, 7, 11]], dtype=np.int64)
    full = m(m.params, input_ids=jnp.asarray(ids)).logits
    cache = m.init_cache(1, 16)
    mask = np.zeros((1, 16), np.int64)
    mask[:, :4] = 1
    out = m(m.params, input_ids=jnp.asarray(ids[:, :4]),
            attention_mask=jnp.asarray(mask), past_key_values=cache,
            cache_position=0)
    assert max_abs_diff(out.logits, full[:, :4]) < 1e-4
    cache = out.past_key_values
    for t in range(4, 6):
        mask[:, t] = 1
        step = m(m.params, input_ids=jnp.asarray(ids[:, t:t + 1]),
                 attention_mask=jnp.asarray(mask),
                 position_ids=jnp.asarray([[t]]), past_key_values=cache,
                 cache_position=t)
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full[:, t]) < 1e-4, f"step {t}"
