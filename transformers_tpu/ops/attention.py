"""Attention kernel registry + reference (eager) implementation.

TPU-native analog of reference ``AttentionInterface``/``ALL_ATTENTION_FUNCTIONS``
(src/transformers/modeling_utils.py:5093-5131) and the eager/sdpa kernels
(src/transformers/integrations/sdpa_attention.py:82).

All kernels use the **BSHD** layout (batch, seq, heads, head_dim) — the native
layout for TPU flash kernels — take GQA k/v with fewer heads directly, and
receive the mask **as data** (q_positions + kv_valid + flags), not as a
materialized bias; only the eager path renders a bias tensor.

Keys (reference A.5 analog):
- ``eager``: pure-jnp dot-product softmax; the parity/debug path.
- ``sdpa``: alias of eager — XLA *is* our fused sdpa.
- ``flash``/``flash_attention_2``: Pallas flash kernel with eager fallback
  for unsupported shapes (ops/pallas/flash_attention.py).
- ``default``: flash on TPU when shapes allow, else eager.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.generic import GeneralInterface
from .masks import bidirectional_mask_bool, causal_mask_bool, to_additive


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, KVH, D] -> [B, S, KVH*n_rep, D] (reference modeling_llama.py repeat_kv)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d))
    return x.reshape(b, s, h * n_rep, d)


def _render_bias(q, k, q_positions, kv_valid, is_causal, sliding_window,
                 chunk_size=None, q_segment_ids=None, kv_segment_ids=None,
                 q_block_ids=None, kv_block_ids=None):
    b, sq = q.shape[0], q.shape[1]
    skv = k.shape[1]
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    if is_causal:
        mask = causal_mask_bool(q_positions, kv_valid, sliding_window=sliding_window,
                                chunk_size=chunk_size, q_segment_ids=q_segment_ids,
                                kv_segment_ids=kv_segment_ids,
                                q_block_ids=q_block_ids, kv_block_ids=kv_block_ids)
    else:
        mask = jnp.broadcast_to(kv_valid.astype(bool)[:, None, None, :], (b, 1, sq, skv))
        if sliding_window is not None:
            # bidirectional window, INCLUSIVE distance (reference
            # masking_utils.py:141 sliding_window_bidirectional_overlay;
            # ModernBERT local attention)
            kv_pos = jnp.arange(skv, dtype=jnp.int32)[None, None, None, :]
            dist = jnp.abs(q_positions[:, None, :, None] - kv_pos)
            mask = mask & (dist <= sliding_window)
    return to_additive(mask, jnp.float32)


def eager_attention(
    q: jnp.ndarray,  # [B, Q, H, D]
    k: jnp.ndarray,  # [B, KV, KVH, D]
    v: jnp.ndarray,  # [B, KV, KVH, D]
    bias: Optional[jnp.ndarray] = None,  # [B, 1, Q, KV] additive; built from
    *,                                   # mask data when absent
    q_positions: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    is_causal: bool = True,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    logit_cap: Optional[float] = None,
    probs_sink: Optional[list] = None,
    sinks: Optional[jnp.ndarray] = None,
    chunk_size: Optional[int] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    q_block_ids: Optional[jnp.ndarray] = None,
    kv_block_ids: Optional[jnp.ndarray] = None,
    **kwargs,
) -> jnp.ndarray:
    """Reference dot-product attention; float32 softmax for numerics.

    GQA runs natively (grouped einsum) — K/V are never replicated across
    query-head groups, so decode reads each KV byte exactly once (the
    reference materializes repeat_kv; XLA cannot always fuse that away).

    ``probs_sink``: the ``output_attentions=True`` channel — when a list is
    supplied, the [B, H, Q, KV] softmax probabilities (query dtype, matching
    reference eager_attention_forward modeling_llama.py:217) are appended to
    it. Threaded through ``attn_args`` so no per-family signature changes.
    """
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    if bias is None:
        bias = _render_bias(q, k, q_positions, kv_valid, is_causal, sliding_window,
                            chunk_size, q_segment_ids, kv_segment_ids,
                            q_block_ids, kv_block_ids)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    qg = q.reshape(b, sq, kvh, g, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logit_cap is not None and logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    # bias [B, 1|H, Q, K] -> broadcast over the group dim
    bias32 = bias.astype(jnp.float32)
    if bias32.shape[1] == 1:
        bias32 = bias32[:, :, None]
    else:
        bias32 = bias32.reshape(b, kvh, g, *bias32.shape[-2:])
    scores = scores + bias32
    if sinks is not None:
        # Attention sinks (reference models/gpt_oss/modeling_gpt_oss.py:251):
        # a learned per-head logit participates in the softmax denominator and
        # its probability mass is dropped — heads can attend to "nothing".
        sink = sinks.astype(jnp.float32).reshape(kvh, g)[None, :, :, None, None]
        sink = jnp.broadcast_to(sink, (b, kvh, g, sq, 1))
        combined = jnp.concatenate([scores, sink], axis=-1)
        probs = jax.nn.softmax(combined, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    if probs_sink is not None:
        probs_sink.append(probs.astype(q.dtype).reshape(b, h, sq, -1))
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    # v may be narrower than q/k (MLA: v_head_dim != qk_head_dim)
    return out.reshape(b, sq, h, v.shape[-1])


def cached_attention_bhsd(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k: jnp.ndarray,  # [B, KVH, S, D]  (bhsd cache buffer)
    v: jnp.ndarray,  # [B, KVH, S, D]
    *,
    q_positions: Optional[jnp.ndarray] = None,  # [B, Sq] absolute slots
    kv_valid: Optional[jnp.ndarray] = None,     # [B, S]
    is_causal: bool = True,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    logit_cap: Optional[float] = None,
    probs_sink: Optional[list] = None,
    sinks: Optional[jnp.ndarray] = None,
    chunk_size: Optional[int] = None,
    **kwargs,
) -> jnp.ndarray:
    """Attention over a [B, KVH, S, D] cache — the decode hot path.

    The bhsd layout makes the KV contraction a clean batched GEMM over
    (batch, kv-head) with contiguous [S, D] slabs, which XLA streams at full
    HBM rate (the bshd layout's strided reads measured ~0.6x peak on v5e).
    Semantics match ``eager_attention`` (reference
    integrations/sdpa_attention.py:82); works for any Sq (single-token
    decode, assisted-decoding verify windows, chunked prefill).
    """
    b, sq, h, d = q.shape
    kvh, skv = k.shape[1], k.shape[2]
    g = h // kvh
    scale = scale if scale is not None else d ** -0.5
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)

    qg = q.reshape(b, sq, kvh, g, d)
    # [B, Sq, KVH, G, D] x [B, KVH, S, D] -> [B, KVH, G, Sq, S]
    scores = jnp.einsum("bqhgd,bhsd->bhgqs", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if logit_cap is not None and logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    kv_pos = jnp.arange(skv, dtype=jnp.int32)[None, :]  # slot index == position
    valid = kv_valid.astype(bool)[:, None, :]           # [B, 1, S] -> vs [B, Sq, S]
    if is_causal:
        visible = valid & (kv_pos[:, None, :] <= q_positions[:, :, None])
        if sliding_window is not None:
            visible &= kv_pos[:, None, :] > (q_positions[:, :, None] - sliding_window)
        if chunk_size is not None:
            visible &= (kv_pos[:, None, :] // chunk_size) == (q_positions[:, :, None] // chunk_size)
    else:
        visible = jnp.broadcast_to(valid, (b, sq, skv))
        if sliding_window is not None:
            dist = jnp.abs(q_positions[:, :, None] - kv_pos[:, None, :])
            visible = visible & (dist <= sliding_window)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(visible[:, None, None], scores, neg)

    if sinks is not None:
        sink = sinks.astype(jnp.float32).reshape(kvh, g)[None, :, :, None, None]
        sink = jnp.broadcast_to(sink, (b, kvh, g, sq, 1))
        combined = jnp.concatenate([scores, sink], axis=-1)
        probs = jax.nn.softmax(combined, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    if probs_sink is not None:
        probs_sink.append(
            probs.astype(q.dtype).reshape(b, h, sq, skv))
    # [B, KVH, G, Sq, S] x [B, KVH, S, D] -> [B, KVH, G, Sq, D]
    out = jnp.einsum("bhgqs,bhsd->bhgqd", probs.astype(v.dtype), v)
    # -> [B, Sq, H, Dv]
    return jnp.moveaxis(out, 3, 1).reshape(b, sq, h, v.shape[-1])


def flash_attention_dispatch(
    q, k, v, bias=None, *,
    q_positions=None, kv_valid=None, is_causal=True, sliding_window=None,
    scale=None, logit_cap=None, probs_sink=None, sinks=None, **kwargs,
):
    """Pallas flash attention with eager fallback for unsupported shapes.
    ``output_attentions`` (a ``probs_sink``) forces the eager path — flash
    never materializes the probability matrix (reference behavior: flash
    attention refuses output_attentions and falls back)."""
    from .pallas.flash_attention import flash_attention, flash_supported

    bidir_window = (not is_causal) and sliding_window is not None
    if (probs_sink is None and bias is None and sinks is None
            and kwargs.get("chunk_size") is None
            and kwargs.get("q_segment_ids") is None
            and kwargs.get("q_block_ids") is None
            and not bidir_window and flash_supported(q, k, v)):
        return flash_attention(
            q, k, v,
            q_positions=q_positions, kv_valid=kv_valid,
            scale=scale, logit_cap=logit_cap, is_causal=is_causal,
            sliding_window=sliding_window,
        )
    return eager_attention(q, k, v, bias, q_positions=q_positions, kv_valid=kv_valid,
                           is_causal=is_causal, sliding_window=sliding_window,
                           scale=scale, logit_cap=logit_cap, probs_sink=probs_sink,
                           sinks=sinks, chunk_size=kwargs.get("chunk_size"),
                           q_segment_ids=kwargs.get("q_segment_ids"),
                           kv_segment_ids=kwargs.get("kv_segment_ids"),
                           q_block_ids=kwargs.get("q_block_ids"),
                           kv_block_ids=kwargs.get("kv_block_ids"))


def ulysses_attention(q, k, v, bias=None, **kwargs):
    """Ulysses sequence parallelism, GSPMD-native (SURVEY §2.8 Ulysses row;
    reference delegates to DeepSpeed's all-to-all adapter, trainer.py:2267).

    Activations arrive sequence-sharded on the ``sequence`` mesh axis. The
    sharding constraints below re-shard q/k/v HEAD-wise over that axis for
    the attention body (XLA lowers the reshard to an all-to-all on ICI), so
    every device computes full-sequence attention for its head slice; the
    output is constrained back to sequence-sharded. Requires an ambient mesh
    (``with mesh:``) carrying a ``sequence`` axis — the Trainer's sp path
    provides it."""
    from jax.lax import with_sharding_constraint as wsc
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import SEQUENCE_AXIS

    seq_in = P(None, SEQUENCE_AXIS, None, None)   # [B, S, H, D] seq-sharded
    head_in = P(None, None, SEQUENCE_AXIS, None)  # [B, S, H, D] head-sharded
    q = wsc(q, head_in)
    k = wsc(k, head_in)
    v = wsc(v, head_in)
    out = eager_attention(q, k, v, bias, **kwargs)
    return wsc(out, seq_in)


class AttentionInterface(GeneralInterface):
    _global_mapping = {
        "eager": eager_attention,
        "sdpa": eager_attention,  # alias: XLA *is* our fused sdpa
        "flash": flash_attention_dispatch,
        "flash_attention_2": flash_attention_dispatch,
        "flash_attention_3": flash_attention_dispatch,
        "default": flash_attention_dispatch,
        "ulysses": ulysses_attention,
    }


ALL_ATTENTION_FUNCTIONS = AttentionInterface()


def get_attention_fn(implementation: Optional[str]):
    key = implementation or "default"
    if key not in ALL_ATTENTION_FUNCTIONS:
        raise KeyError(
            f"Unknown attention implementation {key!r}; valid: {ALL_ATTENTION_FUNCTIONS.valid_keys()}"
        )
    return ALL_ATTENTION_FUNCTIONS[key]
