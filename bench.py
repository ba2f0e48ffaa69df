"""Headline benchmark: Llama decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved
(decode is bandwidth-bound: every generated token must stream all params +
the KV cache through HBM once). The reference publishes no absolute numbers
(BASELINE.md), so the roofline is the honest baseline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Llama-3.2-1B geometry (random init; bench measures compute, not weights)
VOCAB = 32000
HIDDEN = 2048
INTER = 8192
LAYERS = 16
HEADS = 32
KV_HEADS = 8
HEAD_DIM = 64

BATCH = 8
PROMPT = 128
GEN = 128

# v5e: ~819 GB/s HBM BW
HBM_BW = 819e9


def main():
    from transformers_tpu import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        max_position_embeddings=PROMPT + GEN + 64,
    )
    model = LlamaForCausalLM(config, dtype=jnp.bfloat16)
    params = model.init_params(0)
    n_params = model.num_parameters(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(BATCH, PROMPT)), jnp.int32)

    def run():
        out = model.generate(params, input_ids=ids, max_new_tokens=GEN,
                             do_sample=False, prompt_pad_multiple=PROMPT,
                             eos_token_id=-1)
        # Force host materialization: on the tunneled axon platform
        # block_until_ready alone can return before execution finishes.
        return np.asarray(jax.block_until_ready(out))

    run()  # compile
    run()  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    total_tokens = BATCH * GEN
    tok_per_sec = total_tokens / dt

    # Roofline: per decode step, stream all params (bf16) + written KV cache.
    param_bytes = n_params * 2
    kv_bytes_per_tok = 2 * LAYERS * KV_HEADS * HEAD_DIM * 2  # k+v, bf16
    avg_ctx = PROMPT + GEN / 2
    step_bytes = param_bytes + BATCH * avg_ctx * kv_bytes_per_tok
    roofline_steps_per_sec = HBM_BW / step_bytes
    roofline_tok_per_sec = roofline_steps_per_sec * BATCH
    vs = tok_per_sec / roofline_tok_per_sec

    print(json.dumps({
        "metric": "llama1b_bf16_decode_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
