"""Pallas decode attention — single-token queries over a static KV cache.

Replaces the reference's ``flash_attn_with_kvcache`` decode path
(reference integrations/flash_paged.py:50). Decode is HBM-bound: the win is
reading ONLY the live KV region. The kernel's block index map is clamped by
scalar-prefetched per-row [start, end) block bounds — Mosaic skips the DMA
when the mapped index repeats the previous grid step, so dead cache blocks
(left padding, unwritten tail) cost no bandwidth (the splash/paged-attention
trick, SURVEY §7 hard part #1).

Layout: the cache stays BSHD (no transpose on the hot path); each grid step
loads one [BKV, KVH, D] slab and computes every (kv head x query group) at
once with a head-batched dot.

Perf note (measured on v5e): DMA skipping works and reads only live bytes,
but the in-kernel [BKV, KVH, D] -> [KVH, BKV, D] relayout caps effective
bandwidth (~70 GB/s vs XLA's 340 GB/s full-buffer read). The planned fix is
a BHSD cache layout so slabs arrive transpose-free; until then this kernel
is the building block for paged/continuous-batching attention where the
live fraction is small enough to win anyway.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a, b):
    return -(-a // b)


def _decode_kernel(
    # scalar prefetch
    start_blk_ref,  # [B] int32 first live block per row
    end_blk_ref,    # [B] int32 one-past-last live block per row
    start_ref,      # [B] int32 first live slot
    end_ref,        # [B] int32 one-past-last live slot
    # inputs
    q_ref,   # [1, KVH, G, D]
    k_ref,   # [1, BKV, KVH, D]
    v_ref,   # [1, BKV, KVH, D]
    # outputs
    out_ref,  # [1, KVH, G, D]
    # scratch
    m_scratch,    # [H, 128]
    l_scratch,    # [H, 128]
    acc_scratch,  # [H, D]
    *,
    scale: float,
    block_kv: int,
    sliding_window: Optional[int],
):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    num_kv = pl.num_programs(1)
    kvh, g = q_ref.shape[1], q_ref.shape[2]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    live = (ki >= start_blk_ref[b]) & (ki < end_blk_ref[b])

    @pl.when(live)
    def _compute():
        q = q_ref[0].astype(jnp.float32)            # [KVH, G, D]
        # VMEM transpose so the batched dots share axis-0 batch dims
        k = jnp.swapaxes(k_ref[0], 0, 1).astype(jnp.float32)  # [KVH, BKV, D]
        # head-batched scores: [KVH, G, BKV]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale
        slots = ki * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = (slots >= start_ref[b]) & (slots < end_ref[b])
        if sliding_window is not None:
            mask &= slots > (end_ref[b] - 1 - sliding_window)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        s2 = s.reshape(kvh * g, block_kv)
        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s2 - m_next)                     # [H, BKV]
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = jnp.swapaxes(v_ref[0], 0, 1).astype(jnp.float32)  # [KVH, BKV, D]
        # [KVH, G, BKV] @ [KVH, BKV, D] batched over KVH -> [KVH, G, D]
        pv = jax.lax.dot_general(p.reshape(kvh, g, block_kv), v,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha + pv.reshape(kvh * g, -1)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out = (acc_scratch[...] / safe_l)
        out_ref[0] = out.reshape(kvh, g, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window", "block_kv"))
def decode_attention(
    q,  # [B, 1, H, D]
    k,  # [B, S, KVH, D] (static cache buffer)
    v,
    valid_start,  # [B] int32 first live slot
    valid_end,    # [B] int32 one-past-last live slot
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    block_kv: int = 256,
):
    b, sq, h, d = q.shape
    _, skv, kvh, _ = k.shape
    g = h // kvh
    bkv = min(block_kv, skv)
    skv_pad = _cdiv(skv, bkv) * bkv
    if skv_pad != skv:
        k = jnp.pad(k, ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0)))
    num_blocks = skv_pad // bkv

    # group query heads by their kv head: head h = kv*g + i (repeat_kv order)
    qg = q.reshape(b, kvh, g, d)

    start = valid_start.astype(jnp.int32)
    end = valid_end.astype(jnp.int32)
    if sliding_window is not None:
        start = jnp.maximum(start, end - sliding_window)
    start_blk = start // bkv
    end_blk = (end + bkv - 1) // bkv

    def clamp(bi, ki, start_blk_ref, end_blk_ref, *_):
        # dead blocks repeat a boundary index -> Mosaic skips the re-DMA
        j = jnp.clip(ki, start_blk_ref[bi], jnp.maximum(end_blk_ref[bi] - 1, 0))
        return (bi, j, 0, 0)

    kernel = functools.partial(_decode_kernel, scale=scale, block_kv=bkv,
                               sliding_window=sliding_window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, num_blocks),
        in_specs=[
            pl.BlockSpec((1, kvh, g, d), lambda bi, ki, *_: (bi, 0, 0, 0)),
            pl.BlockSpec((1, bkv, kvh, d), clamp),
            pl.BlockSpec((1, bkv, kvh, d), clamp),
        ],
        out_specs=pl.BlockSpec((1, kvh, g, d), lambda bi, ki, *_: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(start_blk, end_blk, start, end, qg, k, v)
    return out.reshape(b, 1, h, d)


def decode_supported(q, k) -> bool:
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    if sq != 1 or h % kvh != 0:
        return False
    if d % 128 != 0 or d > 512:
        return False
    return True
