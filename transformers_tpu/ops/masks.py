"""Attention-mask construction — masks as data, not closures.

TPU-native analog of reference src/transformers/masking_utils.py (mask-function
composition at :48-182, rendered per backend at :372-650). XLA wants static
shapes, so masks here are computed from integer position/validity tensors and
delivered to kernels either as an additive float bias (eager path) or as
(positions, segment ids) consumed directly by Pallas kernels.

Convention: generation uses **left-padding** (decoder-only standard), so every
row's next-token slot is the same static index and KV-cache writes are a
single ``dynamic_update_slice``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def min_value(dtype) -> float:
    return float(jnp.finfo(dtype).min)


def causal_mask_bool(
    q_positions: jnp.ndarray,  # [B, Q] absolute slot index of each query
    kv_valid: jnp.ndarray,  # [B, KV] bool/int — 1 where the kv slot holds a real token
    *,
    sliding_window: Optional[int] = None,
    chunk_size: Optional[int] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,  # [B, Q] packed-sequence ids
    kv_segment_ids: Optional[jnp.ndarray] = None,  # [B, KV]
    q_block_ids: Optional[jnp.ndarray] = None,  # [B, Q] image-block ids, -1 = text
    kv_block_ids: Optional[jnp.ndarray] = None,  # [B, KV]
) -> jnp.ndarray:
    """Boolean mask [B, 1, Q, KV]: query at slot p attends kv slot s iff
    s <= p, the slot is valid, and (optionally) p - s < sliding_window
    (reference masking_utils.py:76 causal, :92 sliding window, :104 chunked).
    Segment ids add the packed-sequence restriction (reference
    masking_utils.py:182 ``packed_sequence_mask``): cross-sequence attention
    within one packed row is forbidden.
    Block ids add the multimodal blockwise overlay (reference
    masking_utils.py:116 ``blockwise_overlay``): tokens sharing a non-negative
    block id (one image's tokens) attend bidirectionally; the overlay is OR-ed
    with causality BEFORE window/chunk restrictions, matching Gemma3's
    AND(sliding, OR(causal, blockwise)) composition
    (reference models/gemma3/modeling_gemma3.py:709-754)."""
    kv = kv_valid.shape[-1]
    kv_pos = jnp.arange(kv, dtype=jnp.int32)[None, None, None, :]
    q_pos = q_positions.astype(jnp.int32)[:, None, :, None]
    allowed = kv_pos <= q_pos
    if q_block_ids is not None and kv_block_ids is not None:
        qb = q_block_ids.astype(jnp.int32)[:, None, :, None]
        kb = kv_block_ids.astype(jnp.int32)[:, None, None, :]
        allowed |= (qb == kb) & (qb >= 0)
    if sliding_window is not None:
        allowed &= kv_pos > q_pos - sliding_window
    if chunk_size is not None:
        allowed &= (kv_pos // chunk_size) == (q_pos // chunk_size)
    if q_segment_ids is not None and kv_segment_ids is not None:
        allowed &= (q_segment_ids.astype(jnp.int32)[:, None, :, None]
                    == kv_segment_ids.astype(jnp.int32)[:, None, None, :])
    valid = kv_valid.astype(bool)[:, None, None, :]
    return allowed & valid


def bidirectional_mask_bool(q_valid: jnp.ndarray, kv_valid: jnp.ndarray) -> jnp.ndarray:
    """Full (encoder) mask [B, 1, Q, KV] from validity vectors."""
    return q_valid.astype(bool)[:, None, :, None] & kv_valid.astype(bool)[:, None, None, :]


def to_additive(mask_bool: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Bool -> additive bias; fully-masked rows stay finite (no NaN softmax)."""
    return jnp.where(mask_bool, jnp.zeros((), dtype), jnp.full((), min_value(dtype) / 2.0, dtype))


def make_causal_bias(
    attention_mask: Optional[jnp.ndarray],  # [B, KV] validity (1 = real token)
    q_len: int,
    kv_len: int,
    q_start: jnp.ndarray | int = 0,  # scalar absolute slot of the first query
    *,
    sliding_window: Optional[int] = None,
    dtype=jnp.float32,
    batch: int = 1,
) -> jnp.ndarray:
    """Additive causal bias [B, 1, Q, KV] (reference masking_utils.py:864
    ``create_causal_mask``). ``q_start`` > 0 is the cached-decode case."""
    if attention_mask is None:
        kv_valid = jnp.ones((batch, kv_len), dtype=bool)
    else:
        kv_valid = attention_mask.astype(bool)
        batch = kv_valid.shape[0]
    q_positions = jnp.asarray(q_start, jnp.int32) + jnp.arange(q_len, dtype=jnp.int32)[None, :]
    q_positions = jnp.broadcast_to(q_positions, (batch, q_len))
    mask = causal_mask_bool(q_positions, kv_valid, sliding_window=sliding_window)
    return to_additive(mask, dtype)


def position_ids_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Left-padding-aware position ids: cumsum(mask)-1 clipped at 0
    (reference generation/utils.py prepare_inputs_for_generation)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)


def segment_ids_from_position_ids(position_ids: jnp.ndarray) -> jnp.ndarray:
    """Packed-row segment ids from position resets: a new sequence starts
    wherever position does not increment by one (reference
    masking_utils.py:159 ``find_packed_sequence_indices``). A plain arange
    yields a single segment, so this is safe to apply unconditionally."""
    pos = position_ids.astype(jnp.int32)
    prev = jnp.concatenate([jnp.full_like(pos[..., :1], -2), pos[..., :-1]], axis=-1)
    new_seq = (pos != prev + 1).astype(jnp.int32)
    return jnp.cumsum(new_seq, axis=-1) - 1
