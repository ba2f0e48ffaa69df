"""Headline benchmark: Llama-3-8B steady-state decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Geometry is the real Llama-3-8B (BASELINE.md north star): 32 layers, 4096
hidden, 14336 intermediate, 32 heads / 8 KV heads, head_dim 128, 128256
vocab, untied lm_head — 8.03B params, 14.96 GiB bf16, deliberately sized to
the chip (v5e 15.75 GiB usable). Params are zero-initialized directly in
bf16 on device: MXU/HBM timing is data-independent and random init would
need f32 temporaries that do not fit next to the full parameter set.

Methodology (TPOT — time per output token): generation is timed at TWO
generation lengths (64 and 192 tokens) and the difference taken, so prefill
cost, host dispatch, and the test harness's per-call RPC overhead (~25ms on
the tunneled axon platform, an artifact of the tunnel, not the framework)
cancel out and the result is the pure per-token decode rate, the quantity
serving throughput is made of. The differencing is conservative: the short
run's steps attend over a smaller KV cache than the long run's, so the
subtraction slightly *over*counts decode time.

``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved
(decode is bandwidth-bound: every generated token must stream all params +
the KV cache through HBM once). The reference publishes no absolute numbers
(BASELINE.md), so the roofline is the honest baseline.

Measured context (2026-08-16/17, v5e via axon):
- pure weight-streaming while_loop hits 824 GB/s (=100.6% of nominal), so
  the roofline is reachable by XLA;
- fusing q/k/v and gate/up into single matmuls is a null result — XLA
  already saturates HBM with separate weight streams; do not re-attempt;
- decode attention over a [B,KVH,S,D] cache streams at full rate; the old
  [B,S,KVH,D] layout was the 1B-geometry bottleneck (strided KV reads);
- ablations (2026-08-17): attention+rope+cache-update cost ~1.35 ms of the
  ~21 ms step and a fused Pallas decode-step kernel matches (not beats) the
  XLA ops at this context length — the remaining gap to the roofline is the
  M=8 weight-streaming GEMMs themselves (~752 GB/s effective vs 819 peak).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Llama-3-8B geometry (reference models/llama config for Meta-Llama-3-8B)
VOCAB = 128256
HIDDEN = 4096
INTER = 14336
LAYERS = 32
HEADS = 32
KV_HEADS = 8
HEAD_DIM = 128

BATCH = 8
PROMPT = 128
GEN_SHORT = 64
GEN_LONG = 192

# v5e: ~819 GB/s HBM BW
HBM_BW = 819e9


def zero_params(model, formats=None):
    """Materialize the parameter pytree as bf16 zeros on device, directly in
    the decode-preferred layouts (no f32 init temporaries and no layout
    copies — the full tree is 14.96 GiB)."""
    spec = model.init_abstract()
    mk = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), spec),
                 out_shardings=formats)
    return mk()


def main():
    from transformers_tpu import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        max_position_embeddings=PROMPT + GEN_LONG,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(config, dtype=jnp.bfloat16)
    formats = model.decode_param_formats(BATCH, PROMPT + GEN_LONG)
    params = zero_params(model, formats)
    n_params = model.num_parameters(params)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(BATCH, PROMPT)), jnp.int32)

    def run(gen_tokens: int) -> None:
        out = model.generate(params, input_ids=ids, max_new_tokens=gen_tokens,
                             do_sample=False, prompt_pad_multiple=PROMPT,
                             eos_token_id=-1)
        # Force host materialization: on the tunneled axon platform
        # block_until_ready alone can return before execution finishes.
        np.asarray(jax.block_until_ready(out))

    def timed(gen_tokens: int) -> float:
        run(gen_tokens)  # compile
        run(gen_tokens)  # warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(gen_tokens)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_short = timed(GEN_SHORT)
    t_long = timed(GEN_LONG)
    decode_steps = GEN_LONG - GEN_SHORT
    dt = (t_long - t_short) / decode_steps  # seconds per decode step
    tok_per_sec = BATCH / dt

    # Roofline: per decode step, stream all params (bf16) + the KV cache at
    # the differenced window's average context length.
    param_bytes = n_params * 2
    kv_bytes_per_tok = 2 * LAYERS * KV_HEADS * HEAD_DIM * 2  # k+v, bf16
    avg_ctx = PROMPT + (GEN_SHORT + GEN_LONG) / 2
    step_bytes = param_bytes + BATCH * avg_ctx * kv_bytes_per_tok
    roofline_tok_per_sec = HBM_BW / step_bytes * BATCH
    vs = tok_per_sec / roofline_tok_per_sec

    print(json.dumps({
        "metric": "llama3_8b_bf16_steady_state_decode_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
