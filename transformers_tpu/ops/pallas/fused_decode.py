"""Fused single-token decode step: rope + cache write + attention.

One Pallas kernel per layer per decode step replaces the ~10 XLA ops the
unfused path launches (rope mults, two cache dynamic-update-slices, score/
softmax/PV chain). This is the TPU analog of the reference's
``flash_attn_with_kvcache`` (integrations/flash_paged.py:50), which likewise
updates the cache inside the attention kernel. Measured motivation: at
Llama-3-8B decode geometry the removable ops cost ~1.35 ms of a ~21 ms step
(ablation 2026-08-17); decode is HBM-bound so the fused kernel's KV read is
effectively free under the weight streams.

Contract:
- q, k_new, v_new are PRE-rope (llama rotate-half rope is applied in-kernel
  from per-row cos/sin vectors).
- caches are bhsd [B, KVH, S, D] and returned updated (aliased in place).
- the new token's k/v never round-trips: it is written to slot ``pos`` via
  DMA while attention reads cache slots < pos and scores the new token
  in-register as an extra lane column.
- masking is exact: the per-row kv-validity vector rides along in VMEM, so
  holes in user masks behave like the eager path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _rotate_half(x, d):
    # rotate_half(x) = concat(-x2, x1): roll by d/2 then flip the first
    # half's sign. Mosaic's rotate only handles 32-bit data, so bf16 inputs
    # round-trip through f32 (rope is f32 math anyway).
    xf = x.astype(jnp.float32)
    rolled = pltpu.roll(xf, shift=d // 2, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < d // 2, -rolled, rolled)


def _fused_decode_kernel(
    # scalar prefetch
    pos_ref,    # [1] int32 write slot (shared across rows)
    start_ref,  # [B] int32 first live slot per row (pads / sliding window)
    # inputs
    q_ref,      # [1, KVH, Gp, D] VMEM (pre-rope)
    knew_ref,   # [1, KVH, 1, D] VMEM (pre-rope)
    vnew_ref,   # [1, KVH, 1, D] VMEM
    cos_ref,    # [1, 1, D] VMEM
    sin_ref,    # [1, 1, D] VMEM
    valid_ref,  # [1, S] VMEM int32 kv validity
    k_cache_hbm,  # [B, KVH, S, D] ANY
    v_cache_hbm,  # [B, KVH, S, D] ANY
    # outputs
    out_ref,    # [1, KVH, Gp, D] VMEM
    knr_ref,    # [1, KVH, 1, D] VMEM roped new key (cache write happens in XLA)
    # scratch
    k_buf,      # [2, KVH, CH, D] VMEM
    v_buf,      # [2, KVH, CH, D] VMEM
    sems,       # DMA sems [2, 2]
    *,
    scale: float,
    chunk: int,
    seq_len: int,
    precision: jax.lax.Precision,
):
    n = pl.program_id(0)
    kvh, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    ch = chunk

    pos = pos_ref[0]
    start = start_ref[n]

    cos = cos_ref[0].astype(jnp.float32)  # [1, D]
    sin = sin_ref[0].astype(jnp.float32)
    q = q_ref[0]      # [KVH, Gp, D]
    qr = (q.astype(jnp.float32) * cos[None]
          + _rotate_half(q, d) * sin[None]).astype(q.dtype)
    kn = knew_ref[0]  # [KVH, 1, D]
    knr = (kn.astype(jnp.float32) * cos[None]
           + _rotate_half(kn, d) * sin[None]).astype(kn.dtype)
    knr_ref[0] = knr.astype(knr_ref.dtype)

    # chunk walk over cache slots [start, pos) with double buffering; the
    # physical load start is clamped into bounds and re-masked logically
    first_chunk = start // ch
    num_chunks = jnp.maximum(pl.cdiv(pos, ch) - first_chunk, 0)

    def chunk_dma(slot, ci):
        p0 = (first_chunk + ci) * ch  # ch divides seq_len: always in bounds
        kd = pltpu.make_async_copy(
            k_cache_hbm.at[n, :, pl.ds(p0, ch), :], k_buf.at[slot], sems.at[slot, 0])
        vd = pltpu.make_async_copy(
            v_cache_hbm.at[n, :, pl.ds(p0, ch), :], v_buf.at[slot], sems.at[slot, 1])
        return kd, vd, p0

    @pl.when(num_chunks > 0)
    def _():
        kd, vd, _ = chunk_dma(0, 0)
        kd.start()
        vd.start()

    @pl.when(num_chunks > 1)
    def _():
        kd, vd, _ = chunk_dma(1, 1)
        kd.start()
        vd.start()

    qf = qr  # keep compute dtype; dots accumulate f32

    def body(ci, carry):
        m_prev, l_prev, acc = carry
        slot = ci % 2
        kd, vd, p0 = chunk_dma(slot, ci)
        kd.wait()
        vd.wait()
        k = k_buf[slot]  # [KVH, CH, D]
        v = v_buf[slot]
        s = jax.lax.dot_general(qf, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=precision)  # [KVH, Gp, CH]
        s = (s * scale).reshape(kvh * g, ch)
        slots = p0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = (slots >= start) & (slots < pos)
        # per-slot validity from the mask row (exact hole semantics)
        vrow = valid_ref[0]  # [S]
        vchunk = jax.lax.dynamic_slice(vrow, (p0,), (ch,))
        ok &= vchunk[None, :] > 0
        s = jnp.where(ok, s, DEFAULT_MASK_VALUE)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.reshape(kvh, g, ch).astype(v.dtype), v,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        acc = acc * alpha + pv.reshape(kvh * g, d)

        @pl.when(ci + 2 < num_chunks)
        def _():
            kd, vd, _ = chunk_dma(slot, ci + 2)
            kd.start()
            vd.start()

        return m_next, l_next, acc

    m0 = jnp.full((kvh * g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh * g, 1), jnp.float32)
    acc0 = jnp.zeros((kvh * g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    # the new token's own column (always live: a token attends to itself)
    s_new = jnp.sum(qf.astype(jnp.float32) * knr.astype(jnp.float32),
                    axis=-1, keepdims=True).reshape(kvh * g, 1) * scale
    m_next = jnp.maximum(m, s_new)
    alpha = jnp.exp(m - m_next)
    p_new = jnp.exp(s_new - m_next)
    l = l * alpha + p_new
    vn = vnew_ref[0].astype(jnp.float32).reshape(kvh, 1, d)
    pv_new = (p_new.reshape(kvh, g, 1) * vn).reshape(kvh * g, d)
    acc = acc * alpha + pv_new

    out_ref[0] = (acc / l).reshape(kvh, g, d).astype(out_ref.dtype)


def _fused_decode_kernel_whole(
    # scalar prefetch
    pos_ref,    # [1] int32 write slot (shared across rows)
    start_ref,  # [B] int32 (unused here; start_v carries the vector form)
    # inputs
    q_ref,      # [B, KVH, Gp, D] VMEM (pre-rope)
    knew_ref,   # [B, KVH, 1, D] VMEM (pre-rope)
    vnew_ref,   # [B, KVH, 1, D] VMEM
    cos_ref,    # [B, 1, D] VMEM
    sin_ref,    # [B, 1, D] VMEM
    valid_ref,  # [B, S] VMEM int32
    startv_ref,  # [B, 1] int32 VMEM (row starts, vector form)
    k_cache_hbm,  # [B, KVH, S, D] ANY
    v_cache_hbm,
    # outputs
    out_ref,    # [B, KVH, Gp, D] VMEM
    knr_ref,    # [B, KVH, 1, D] VMEM roped new key (cache write happens in XLA)
    # scratch
    k_buf,      # [B, KVH, S, D] VMEM
    v_buf,
    sems,       # DMA [B, 2]
    *,
    scale: float,
    precision: jax.lax.Precision,
):
    """Small-context variant: ONE grid step fetches every row's whole live
    KV slab and scores the batch with two batched MXU dots — minimal launch
    and DMA-wait overhead (the per-row chunked kernel's grid serialization
    costs more than the ops it replaces at short contexts)."""
    b, kvh, g, d = q_ref.shape
    s_len = k_buf.shape[2]

    pos = pos_ref[0]

    # ONE whole-array DMA per pool (the [B, KVH, S, D] slab is contiguous) —
    # issued FIRST so the HBM stream overlaps the rope math below; per-row
    # copies cost b× the scalar-core issue overhead for the same bytes.
    kd = pltpu.make_async_copy(k_cache_hbm, k_buf, sems.at[0, 0])
    vd = pltpu.make_async_copy(v_cache_hbm, v_buf, sems.at[0, 1])
    kd.start()
    vd.start()

    cos = cos_ref[...][:, None].astype(jnp.float32)  # [B, 1, 1, D]
    sin = sin_ref[...][:, None].astype(jnp.float32)
    q = q_ref[...]               # [B, KVH, Gp, D]
    qr = (q.astype(jnp.float32) * cos + _rotate_half(q, d) * sin).astype(q.dtype)
    kn = knew_ref[...]           # [B, KVH, 1, D]
    knr = (kn.astype(jnp.float32) * cos + _rotate_half(kn, d) * sin).astype(kn.dtype)
    knr_ref[...] = knr.astype(knr_ref.dtype)

    kd.wait()
    vd.wait()

    k = k_buf[...].reshape(b * kvh, s_len, d)
    v = v_buf[...].reshape(b * kvh, s_len, d)
    qf = qr.reshape(b * kvh, g, d)
    s = jax.lax.dot_general(qf, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # [B*KVH, Gp, S]
    s = (s * scale).reshape(b, kvh, g, s_len)
    slots = jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1, s_len), 3)
    startv = startv_ref[...][:, None, None, :]  # [B, 1, 1, 1]
    ok = (slots >= startv) & (slots < pos)
    ok &= valid_ref[...][:, None, None, :] > 0
    s = jnp.where(ok, s, DEFAULT_MASK_VALUE)

    # the new token's own column (always live)
    s_new = jnp.sum(qr.astype(jnp.float32) * knr.astype(jnp.float32),
                    axis=-1, keepdims=True) * scale  # [B, KVH, Gp, 1]
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
    p = jnp.exp(s - m)                                # [B, KVH, Gp, S]
    p_new = jnp.exp(s_new - m)
    l = jnp.sum(p, axis=-1, keepdims=True) + p_new
    pv = jax.lax.dot_general(p.reshape(b * kvh, g, s_len).astype(v.dtype), v,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    pv = pv.reshape(b, kvh, g, d)
    vn = vnew_ref[...].astype(jnp.float32)            # [B, KVH, 1, D]
    acc = pv + p_new * vn
    out_ref[...] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_decode_attention(
    q,       # [B, 1, H, D] pre-rope
    k_new,   # [B, 1, KVH, D] pre-rope
    v_new,   # [B, 1, KVH, D]
    cos,     # [B, 1, D]
    sin,     # [B, 1, D]
    k_cache,  # [B, KVH, S, D] (donated/aliased)
    v_cache,
    pos,       # scalar int32 write slot
    start,     # [B] int32 first live slot (pads + sliding window)
    kv_valid,  # [B, S] int32
    *,
    scale: float,
    interpret: Optional[bool] = None,
):
    """Returns (attn_out [B, 1, H, D], k_cache', v_cache')."""
    b, _, h, d = q.shape
    kvh, s = k_cache.shape[1], k_cache.shape[2]
    g = h // kvh
    pad_g = max(g, 8)

    qg = jnp.swapaxes(q, 1, 2).reshape(b, kvh, g, d)
    if pad_g != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, pad_g - g), (0, 0)))
    kng = jnp.swapaxes(k_new, 1, 2)  # [B, KVH, 1, D]
    vng = jnp.swapaxes(v_new, 1, 2)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # f32 caches: the MXU's default f32 matmul is a single bf16 pass (~1e-3
    # error vs interpret mode's true f32); request HIGHEST so compiled ==
    # interpret == oracle. bf16 (the serving path) keeps the fast default.
    precision = (jax.lax.Precision.HIGHEST if k_cache.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    # small contexts: single grid step, whole-slab fetch, batched dots.
    # The scratch K+V buffers together hold exactly slab_bytes; 24 MB leaves
    # ample headroom in v5e's ~128 MB VMEM and covers serving batches
    # (B=16 x S=224 at Llama-3-8B geometry = 14.7 MB).
    slab_bytes = 2 * b * kvh * s * d * jnp.dtype(k_cache.dtype).itemsize
    if slab_bytes <= 24 * 1024 * 1024:
        kernel = functools.partial(_fused_decode_kernel_whole, scale=scale,
                                   precision=precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((b, kvh, pad_g, d), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((b, kvh, 1, d), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((b, kvh, 1, d), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((b, 1, d), lambda *_: (0, 0, 0)),
                pl.BlockSpec((b, 1, d), lambda *_: (0, 0, 0)),
                pl.BlockSpec((b, s), lambda *_: (0, 0)),
                pl.BlockSpec((b, 1), lambda *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=(
                pl.BlockSpec((b, kvh, pad_g, d), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((b, kvh, 1, d), lambda *_: (0, 0, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((b, kvh, s, d), k_cache.dtype),
                pltpu.VMEM((b, kvh, s, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((b, 2)),
            ],
        )
        out, knr = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((b, kvh, pad_g, d), q.dtype),
                jax.ShapeDtypeStruct((b, kvh, 1, d), k_cache.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the whole-slab scratch (up to 24 MB) exceeds Mosaic's
                # default 16 MB scoped-vmem budget; v5e has 128 MB VMEM
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), start.astype(jnp.int32),
          qg, kng, vng, cos.astype(q.dtype), sin.astype(q.dtype),
          kv_valid.astype(jnp.int32), start.astype(jnp.int32)[:, None],
          k_cache, v_cache)
        z = jnp.zeros((), jnp.int32)
        starts = (z, z, jnp.asarray(pos, jnp.int32), z)
        k_cache = jax.lax.dynamic_update_slice(k_cache, knr.astype(k_cache.dtype), starts)
        v_cache = jax.lax.dynamic_update_slice(v_cache, vng.astype(v_cache.dtype), starts)
        out = out[:, :, :g, :].reshape(b, kvh * g, 1, d)
        return jnp.swapaxes(out, 1, 2), k_cache, v_cache

    ch = next(c for c in (512, 384, 256, 128, s) if s % c == 0)
    kernel = functools.partial(_fused_decode_kernel, scale=scale, chunk=ch,
                               seq_len=s, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, pad_g, d), lambda ni, *_: (ni, 0, 0, 0)),
            pl.BlockSpec((1, kvh, 1, d), lambda ni, *_: (ni, 0, 0, 0)),
            pl.BlockSpec((1, kvh, 1, d), lambda ni, *_: (ni, 0, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda ni, *_: (ni, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda ni, *_: (ni, 0, 0)),
            pl.BlockSpec((1, s), lambda ni, *_: (ni, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, kvh, pad_g, d), lambda ni, *_: (ni, 0, 0, 0)),
            pl.BlockSpec((1, kvh, 1, d), lambda ni, *_: (ni, 0, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, ch, d), k_cache.dtype),
            pltpu.VMEM((2, kvh, ch, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out, knr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, kvh, pad_g, d), q.dtype),
            jax.ShapeDtypeStruct((b, kvh, 1, d), k_cache.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), start.astype(jnp.int32),
      qg, kng, vng, cos.astype(q.dtype), sin.astype(q.dtype),
      kv_valid.astype(jnp.int32), k_cache, v_cache)
    z = jnp.zeros((), jnp.int32)
    starts = (z, z, jnp.asarray(pos, jnp.int32), z)
    k_cache = jax.lax.dynamic_update_slice(k_cache, knr.astype(k_cache.dtype), starts)
    v_cache = jax.lax.dynamic_update_slice(v_cache, vng.astype(v_cache.dtype), starts)
    out = out[:, :, :g, :].reshape(b, kvh * g, 1, d)
    return jnp.swapaxes(out, 1, 2), k_cache, v_cache


def fused_decode_supported(q, k_cache, d_head: int) -> bool:
    b, sq, h, d = q.shape
    kvh, s = k_cache.shape[1], k_cache.shape[2]
    if sq != 1 or h % kvh != 0:
        return False
    if d % 128 != 0 or d > 256:
        return False
    # whole-slab mode (everything fits VMEM) has no alignment constraint;
    # the chunked long-context mode needs a 128-aligned chunk dividing S
    slab_bytes = 2 * b * kvh * s * d * jnp.dtype(k_cache.dtype).itemsize
    if slab_bytes <= 24 * 1024 * 1024:
        return True
    return any(s % c == 0 for c in (512, 384, 256, 128))
