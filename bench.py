"""Headline benchmark: Llama-3-8B steady-state decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Geometry is the real Llama-3-8B (BASELINE.md north star): 32 layers, 4096
hidden, 14336 intermediate, 32 heads / 8 KV heads, head_dim 128, 128256
vocab, untied lm_head — 8.03B params, 14.96 GiB bf16, deliberately sized to
the chip (v5e 15.75 GiB usable). Params are zero-initialized directly in
bf16 on device: MXU/HBM timing is data-independent and random init would
need f32 temporaries that do not fit next to the full parameter set.

Methodology (TPOT — time per output token): generation is timed at TWO
generation lengths and the difference taken, so prefill cost, host dispatch,
and the test harness's per-call RPC overhead (~25ms on the tunneled axon
platform, an artifact of the tunnel, not the framework) cancel out and the
result is the pure per-token decode rate, the quantity serving throughput is
made of. The differencing is conservative: the short run's steps attend over
a smaller KV cache than the long run's, so the subtraction slightly
*over*counts decode time.

``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved
(decode is bandwidth-bound: every generated token must stream all params +
the live KV context through HBM once). The reference publishes no absolute
numbers (BASELINE.md), so the roofline is the honest baseline.

Two configurations are measured and carried in the artifact:
- bf16 (the headline): full-precision weights, fraction of the bf16 roofline;
- int8 weight-only (quantizers/weight_only.py runtime path — codes stream
  from HBM at int8 width through ``quantized_dot``): the TPU-honest serving
  config; decode is HBM-bound so halving weight bytes nearly doubles
  absolute tokens/s. Reported against ITS OWN (int8) roofline.

Measured context (2026-08-16/17, v5e via axon):
- pure weight-streaming while_loop hits 824 GB/s (=100.6% of nominal), so
  the roofline is reachable by XLA;
- fusing q/k/v and gate/up into single matmuls is a null result — XLA
  already saturates HBM with separate weight streams; do not re-attempt;
- decode attention over a [B,KVH,S,D] cache streams at full rate; the old
  [B,S,KVH,D] layout was the 1B-geometry bottleneck (strided KV reads);
- ablations (2026-08-17): attention+rope+cache cost ~1.35 ms of the ~21 ms
  step; the fused Pallas decode-step kernel (ops/pallas/fused_decode.py)
  carries rope+cache-write+attention per layer;
- (2026-08-19) the decode window was retuned: the whole-slab decode kernel
  reads the full allocated cache, so allocating S=224 (prompt 128 + 96
  generated) instead of S=320 removes dead-slot streaming the live-token
  roofline never credits;
- (2026-08-20) decode_pad_multiple landed: both TPOT timing points share ONE
  compiled program (runtime while_loop bound), halving the compile bill; the
  int8 leg moved FIRST and measured 1326 tok/s = 0.960 of its own roofline
  (the >=0.95 target) at batch 16; bf16 b8 0.9436; bf16 b16 does not fit
  (17.02G vs 15.75G HBM: 14.96G params + 2.06G prefill temps).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: repeat runs skip the ~10 min of XLA compiles
    # (kept inside the repo so the driver's end-of-round invocation reuses the
    # cache warmed during the build session; .gitignore'd)
    import os as _os

    _cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# Llama-3-8B geometry (reference models/llama config for Meta-Llama-3-8B)
VOCAB = 128256
HIDDEN = 4096
INTER = 14336
LAYERS = 32
HEADS = 32
KV_HEADS = 8
HEAD_DIM = 128

PROMPT = 128
GEN_SHORT = 32
GEN_LONG = 96

BATCH_BF16 = 8
BATCH_INT8 = 16

# v5e: ~819 GB/s HBM BW
HBM_BW = 819e9

KV_BYTES_PER_TOK = 2 * LAYERS * KV_HEADS * HEAD_DIM * 2  # k+v, bf16
AVG_CTX = PROMPT + (GEN_SHORT + GEN_LONG) / 2


def build_model():
    from transformers_tpu import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        max_position_embeddings=PROMPT + GEN_LONG,
        tie_word_embeddings=False,
    )
    return LlamaForCausalLM(config, dtype=jnp.bfloat16)


def _formats_cache_path(batch):
    import os

    # tracked in git (not .jax_cache/): the known-good layout draw rides with
    # the repo so the driver's fresh environment replays it deterministically
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"generate_formats_b{batch}.json")


def _ser_layout(layout):
    tiling = getattr(layout, "tiling", getattr(layout, "_tiling", None))
    sub = getattr(layout, "sub_byte_element_size_in_bits",
                  getattr(layout, "_sub_byte_element_size_in_bits", 0))
    return {"m2m": list(layout.major_to_minor),
            "tiling": None if tiling is None else [list(t) for t in tiling],
            "sub": sub or 0}


def _de_layout(d, dev):
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    tiling = (None if d["tiling"] is None
              else tuple(tuple(t) for t in d["tiling"]))
    return Format(Layout(major_to_minor=tuple(d["m2m"]), tiling=tiling,
                         sub_byte_element_size_in_bits=d["sub"]),
                  SingleDeviceSharding(dev))


def _load_pinned_formats(model, batch):
    path = _formats_cache_path(batch)
    spec = model.init_abstract()
    leaves, treedef = jax.tree_util.tree_flatten(spec)
    try:
        with open(path, encoding="utf-8") as f:
            recorded = json.load(f)
        dev = jax.devices()[0]
        fmts = [_de_layout(d, dev) for d in recorded]
        assert len(fmts) == len(leaves)
        return jax.tree_util.tree_unflatten(treedef, fmts)
    except (OSError, ValueError, KeyError, AssertionError):
        return None


def _save_pinned_formats(formats, batch):
    flat = jax.tree_util.tree_flatten(
        formats, is_leaf=lambda x: hasattr(x, "layout"))[0]
    try:
        with open(_formats_cache_path(batch), "w", encoding="utf-8") as f:
            json.dump([_ser_layout(fmt.layout) for fmt in flat], f)
    except (OSError, TypeError):
        pass


def compile_generate_aot(model, batch, *, fresh_probe=False):
    """AOT-compile the FULL generate program (prefill + while_loop decode)
    and return ``(compiled_executable, param_formats)``.

    Round-4 post-mortem (BENCH_r04.json tail): the one-step *decode* probe's
    preferred layouts are not always the layouts the *generate* program's
    layout assignment picks — the mismatch materializes as program-lifetime
    ``copy`` HLO temps (twenty 32 MB bf16[4096,4096] copies ≈ 640 MB) that
    tip the 14.96 GiB tree into compile-OOM. Probing the generate program
    itself (``aot="auto"``) makes the at-rest layouts exactly what the
    program consumes — entry copy-free by construction — and the winning
    draw is pinned to a git-tracked JSON so the driver's fresh run replays
    it instead of re-rolling (r4's retry replayed the same bad draw)."""
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(batch, PROMPT)), jnp.int32)
    pinned = None if fresh_probe else _load_pinned_formats(model, batch)
    compiled, formats = model.generate(
        model.init_abstract(), input_ids=ids, max_new_tokens=GEN_LONG,
        do_sample=False, prompt_pad_multiple=PROMPT,
        decode_pad_multiple=GEN_LONG, eos_token_id=-1,
        aot=pinned if pinned is not None else "auto")
    if pinned is None:
        _save_pinned_formats(formats, batch)
    return compiled, formats


def zero_params_in_formats(model, formats):
    """Materialize the parameter pytree as bf16 zeros on device, directly in
    the generate-program layouts (no f32 init temporaries and no layout
    copies — the full tree is 14.96 GiB). The result is VERIFIED leaf by
    leaf: the persistent compile cache has been observed returning a stale
    zeros-program executable whose output layouts ignore ``out_shardings``
    (cache key does not hash them), so any leaf whose layout disagrees is
    repaired with an on-device ``device_put`` relayout copy (~32 MB peak per
    leaf, params stay resident)."""
    spec = model.init_abstract()
    mk = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), spec),
                 out_shardings=formats)
    params = mk()
    flat, treedef = jax.tree_util.tree_flatten(params)
    flat_fmt = jax.tree_util.tree_flatten(
        formats, is_leaf=lambda x: hasattr(x, "layout"))[0]
    fixed = 0
    out = []
    for leaf, fmt in zip(flat, flat_fmt):
        if leaf.format.layout != fmt.layout:
            new = jax.device_put(leaf, fmt)
            jax.block_until_ready(new)
            leaf.delete()
            leaf = new
            fixed += 1
        out.append(leaf)
    if fixed:
        import sys

        print(f"zero_params_in_formats: relaid out {fixed} stale-layout leaves",
              file=sys.stderr)
    return jax.tree_util.tree_unflatten(treedef, out)


def int8_params(model):
    """Materialize the int8 weight-only tree directly (codes zero, scales
    one) — the shapes/dtypes ``quantize_params`` produces at load time."""
    from transformers_tpu.quantizers import Int8WeightOnlyConfig
    from transformers_tpu.quantizers.base import get_quantizer
    from transformers_tpu.utils.generic import flatten_dict, set_nested

    qz = get_quantizer(Int8WeightOnlyConfig())
    qspec = {}
    for k, v in flatten_dict(model.init_abstract()).items():
        if qz.should_quantize(k, v):
            set_nested(qspec, k, jax.ShapeDtypeStruct(v.shape, jnp.int8))
            set_nested(qspec, k + "_scale", jax.ShapeDtypeStruct((v.shape[1],), jnp.float32))
        else:
            set_nested(qspec, k, v)
    mk = jax.jit(lambda: jax.tree.map(
        lambda s: (jnp.ones if (s.dtype == jnp.float32 and len(s.shape) == 1)
                   else jnp.zeros)(s.shape, s.dtype), qspec))
    return mk()


def measure_aot(compiled, params, batch):
    """TPOT by two-point differencing against the ONE AOT generate
    executable (``gen_tokens`` is a runtime while_loop bound); returns
    (tokens/s, fraction of the bf16 HBM roofline)."""
    from transformers_tpu.utils.generic import flatten_dict

    param_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                      for v in flatten_dict(params).values())
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(batch, PROMPT)), jnp.int32)
    mask = jnp.ones((batch, PROMPT), jnp.int32)
    key = jax.random.key(0)

    def run(gen_tokens: int) -> None:
        out = compiled(params, ids, mask, key,
                       jnp.asarray(gen_tokens, jnp.int32))
        np.asarray(jax.block_until_ready(out))

    def timed(gen_tokens: int) -> float:
        run(gen_tokens)  # warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(gen_tokens)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_short = timed(GEN_SHORT)
    t_long = timed(GEN_LONG)
    dt = (t_long - t_short) / (GEN_LONG - GEN_SHORT)
    tok_per_sec = batch / dt
    step_bytes = param_bytes + batch * AVG_CTX * KV_BYTES_PER_TOK
    roofline_tok_per_sec = HBM_BW / step_bytes * batch
    return tok_per_sec, tok_per_sec / roofline_tok_per_sec


def measure(model, params, batch):
    """TPOT by two-point differencing; returns (tokens/s, fraction of the
    HBM roofline for THIS param tree's stored bytes)."""
    from transformers_tpu.utils.generic import flatten_dict

    param_bytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                      for v in flatten_dict(params).values())

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, VOCAB, size=(batch, PROMPT)), jnp.int32)

    def run(gen_tokens: int) -> None:
        # decode_pad_multiple=GEN_LONG: both timing points share ONE compiled
        # program (the cap is the static shape; gen_tokens is a runtime
        # while_loop bound), halving the compile bill per leg.
        out = model.generate(params, input_ids=ids, max_new_tokens=gen_tokens,
                             do_sample=False, prompt_pad_multiple=PROMPT,
                             decode_pad_multiple=GEN_LONG, eos_token_id=-1)
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
    dt = (t_long - t_short) / (GEN_LONG - GEN_SHORT)  # seconds per decode step
    tok_per_sec = batch / dt

    # Roofline: per decode step, stream all stored param bytes + the live KV
    # context at the differenced window's average length.
    step_bytes = param_bytes + batch * AVG_CTX * KV_BYTES_PER_TOK
    roofline_tok_per_sec = HBM_BW / step_bytes * batch
    return tok_per_sec, tok_per_sec / roofline_tok_per_sec


def main():
    """Leg order is deliberate (round-3 lesson: the int8 leg must SURVIVE the
    driver's run, so it goes FIRST): int8 weight-only @ B16, then bf16 @ B8
    (the round-over-round comparable headline), then — budget permitting —
    bf16 @ B16 (weight-stream amortization, the cheapest roofline lever)."""
    import sys
    import traceback

    t_begin = time.perf_counter()
    model = build_model()
    legs: dict[str, dict] = {}

    # ---- leg 1: int8 weight-only (serving config; halved HBM traffic)
    qparams = None
    try:
        qparams = int8_params(model)
        tps, vs = measure(model, qparams, BATCH_INT8)
        legs["int8_b16"] = {"tokens_per_sec": round(tps, 2),
                            "vs_own_roofline": round(vs, 4), "batch": BATCH_INT8}
    except Exception as e:  # noqa: BLE001 — a failed leg must not kill the artifact
        traceback.print_exc(file=sys.stderr)
        print(f"int8 leg failed: {e!r}", file=sys.stderr)
    finally:
        if qparams is not None:
            jax.tree.map(lambda x: x.delete(), qparams)
            del qparams

    # ---- leg 2: bf16 batch 8 (the headline; comparable to r2/r3 artifacts).
    # The 8B bf16 generate program sits exactly at the HBM edge. The program
    # is AOT-compiled with the params' entry layouts taken from the generate
    # program's OWN layout assignment (see compile_generate_aot — r4's
    # compile-OOM was 640 MB of layout-copy temps from a decode-probe/
    # generate-program layout mismatch), and the winning draw rides in git
    # (generate_formats_b8.json). A failed attempt re-probes FRESH (r4's
    # retry replayed the same pinned bad draw and failed identically).
    bf16_tps = bf16_vs = None
    for attempt in range(2):
        params = None
        try:
            compiled, formats = compile_generate_aot(
                model, BATCH_BF16, fresh_probe=attempt > 0)
            params = zero_params_in_formats(model, formats)
            bf16_tps, bf16_vs = measure_aot(compiled, params, BATCH_BF16)
            legs["bf16_b8"] = {"tokens_per_sec": round(bf16_tps, 2),
                               "vs_roofline": round(bf16_vs, 4),
                               "batch": BATCH_BF16}
            break
        except Exception as e:  # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
            print(f"bf16 b8 leg failed (attempt {attempt + 1}): {e!r}",
                  file=sys.stderr)
        finally:
            # a failed leg must still release its 14.96 GiB before leg 3
            if params is not None:
                jax.tree.map(lambda x: x.delete(), params)
                del params
            model._generate_fn_cache = {}

    # ---- leg 3 (optional): int8 batch 32 — amortizes the weight stream
    # further (bf16 b16 measured OOM: 17.02G vs 15.75G HBM, prefill temps;
    # int8's 7.5 GiB tree leaves the headroom).
    if time.perf_counter() - t_begin < 1500:
        qparams = None
        try:
            qparams = int8_params(model)
            tps, vs = measure(model, qparams, 32)
            legs["int8_b32"] = {"tokens_per_sec": round(tps, 2),
                                "vs_own_roofline": round(vs, 4), "batch": 32}
        except Exception as e:  # noqa: BLE001
            print(f"int8 b32 leg skipped: {e!r}", file=sys.stderr)
        finally:
            if qparams is not None:
                jax.tree.map(lambda x: x.delete(), qparams)
                del qparams

    # headline selection: bf16 b8 stays the named metric for comparability;
    # every leg rides in the same JSON line.
    if bf16_tps is None and "int8_b16" in legs:
        out = {
            "metric": "llama3_8b_int8_weight_only_decode_tokens_per_sec_per_chip",
            "value": legs["int8_b16"]["tokens_per_sec"],
            "unit": "tokens/s",
            "vs_baseline": legs["int8_b16"]["vs_own_roofline"],
            "batch": BATCH_INT8,
        }
    else:
        out = {
            "metric": "llama3_8b_bf16_steady_state_decode_tokens_per_sec_per_chip",
            "value": round(bf16_tps, 2) if bf16_tps is not None else None,
            "unit": "tokens/s",
            "vs_baseline": round(bf16_vs, 4) if bf16_vs is not None else None,
            "batch": BATCH_BF16,
        }
    if "int8_b16" in legs:
        out["int8_weight_only_tokens_per_sec"] = legs["int8_b16"]["tokens_per_sec"]
        out["int8_vs_own_roofline"] = legs["int8_b16"]["vs_own_roofline"]
        out["int8_batch"] = BATCH_INT8
    if "int8_b32" in legs:
        out["int8_b32_tokens_per_sec"] = legs["int8_b32"]["tokens_per_sec"]
        out["int8_b32_vs_own_roofline"] = legs["int8_b32"]["vs_own_roofline"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
