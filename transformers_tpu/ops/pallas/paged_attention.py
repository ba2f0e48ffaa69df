"""Pallas block-table paged decode attention.

TPU-native analog of the reference's paged decode path
(``flash_attn_with_kvcache``: integrations/flash_paged.py:50 over
``PagedAttentionCache``: generation/continuous_batching/cache.py:89).
SURVEY §7 hard part #1.

Design:
- Pools are [num_blocks, KVH, block_size, D] (``phsd``): one page's slab —
  all KV heads — is a single contiguous [KVH, block_size, D] region, so a
  page is ONE DMA (e.g. 64 KB at KVH=8, BS=32, D=128 bf16).
- Grid is (N,): one grid step per decode row. K/V pools stay in HBM
  (``memory_space=ANY``); the kernel walks the row's block table in GROUPS
  of pages, landing each page's slab at its head-strided offset inside a
  contiguous [KVH, GROUP*BS, D] group buffer — so each group is scored
  with ONE KVH-batched MXU dot and reduced with ONE PV dot. Two group
  buffers double-buffer DMA against compute. Pages beyond the row's live
  context resolve to the null page (block 0) and are masked.
- Scores/PV run as bf16 MXU dots with float32 accumulation (flash-attn
  numerics); the online softmax state is float32.
- Block tables and per-row context lengths ride in scalar-prefetch SMEM so
  page indices are known ahead of compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

GROUP = 8  # pages fetched/scored together


def _paged_decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [N, MAXB_pad] int32 page ids (padded with 0 = null page)
    ctx_lens_ref,      # [N] int32 live tokens per row
    start_ref,         # [N] int32 first live slot (sliding window)
    # inputs
    q_ref,       # [1, KVH, G_pad, D] VMEM (row n)
    k_pool_ref,  # [P, KVH, BS, D] HBM
    v_pool_ref,  # [P, KVH, BS, D] HBM
    # outputs
    out_ref,     # [1, KVH, G_pad, D] VMEM
    # scratch
    k_buf,       # [2, KVH, GROUP*BS, D] VMEM
    v_buf,       # [2, KVH, GROUP*BS, D] VMEM
    sems,        # DMA sems [2, GROUP, 2]
    *,
    scale: float,
    block_size: int,
    precision: jax.lax.Precision,
):
    n = pl.program_id(0)
    kvh, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    bs = block_size

    ctx = ctx_lens_ref[n]
    start = start_ref[n]
    first_page = start // bs
    num_pages = jnp.maximum(pl.cdiv(ctx, bs) - first_page, 0)
    num_groups = pl.cdiv(num_pages, GROUP)

    def dma(buf_slot, j, gi):
        """DMA page (gi*GROUP + j) into group buffer at concat offset j*bs.

        Dead pages resolve to table entry 0 — the null page, always
        allocated and zero — keeping the fetch branch-free (buffers must
        never hold uninitialized data: 0 * NaN would poison the PV dot)."""
        blk = block_tables_ref[n, first_page + gi * GROUP + j]
        kd = pltpu.make_async_copy(
            k_pool_ref.at[blk], k_buf.at[buf_slot, :, pl.ds(j * bs, bs), :],
            sems.at[buf_slot, j, 0])
        vd = pltpu.make_async_copy(
            v_pool_ref.at[blk], v_buf.at[buf_slot, :, pl.ds(j * bs, bs), :],
            sems.at[buf_slot, j, 1])
        return kd, vd

    def start_group(buf_slot, gi):
        for j in range(GROUP):
            kd, vd = dma(buf_slot, j, gi)
            kd.start()
            vd.start()

    @pl.when(num_groups > 0)
    def _():
        start_group(0, 0)

    @pl.when(num_groups > 1)
    def _():
        start_group(1, 1)

    q = q_ref[0]  # [KVH, G, D]

    def body(gi, carry):
        m_prev, l_prev, acc = carry
        buf_slot = gi % 2

        for j in range(GROUP):
            kd, vd = dma(buf_slot, j, gi)
            kd.wait()
            vd.wait()

        k = k_buf[buf_slot]  # [KVH, GROUP*BS, D]
        v = v_buf[buf_slot]
        # ONE batched MXU dot for the whole group: [KVH, G, GROUP*BS]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=precision)
        s2 = (s * scale).reshape(kvh * g, GROUP * bs)
        page_base = (first_page + gi * GROUP) * bs
        slots = page_base + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
        live = (slots >= start) & (slots < ctx)
        s2 = jnp.where(live, s2, DEFAULT_MASK_VALUE)

        m_cur = jnp.max(s2, axis=-1, keepdims=True)          # [KVH*G, 1]
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s2 - m_next)                             # [KVH*G, GROUP*BS]
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # ONE PV dot: [KVH, G, GROUP*BS] x [KVH, GROUP*BS, D] -> [KVH, G, D]
        pg = p.reshape(kvh, g, GROUP * bs).astype(v.dtype)
        pv = jax.lax.dot_general(pg, v, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
        acc = acc * alpha + pv.reshape(kvh * g, d)

        # refill this buffer with the group after the in-flight one
        @pl.when(gi + 2 < num_groups)
        def _():
            start_group(buf_slot, gi + 2)

        return m_next, l_next, acc

    m0 = jnp.full((kvh * g, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((kvh * g, 1), jnp.float32)
    acc0 = jnp.zeros((kvh * g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_groups, body, (m0, l0, acc0))
    safe_l = jnp.where(l == 0.0, 1.0, l)
    out_ref[0] = (acc / safe_l).reshape(kvh, g, d).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window", "interpret"))
def paged_decode_attention(
    q,             # [N, 1, H, D] one new token per row
    k_pool,        # [P, KVH, BS, D]
    v_pool,        # [P, KVH, BS, D]
    block_tables,  # [N, MAXB] int32
    ctx_lens,      # [N] int32 live context length per row (incl. this token)
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Decode attention reading K/V straight through the block tables.

    The new token's k/v must already be written to its page (the CB runner
    scatters before attention — same ordering as the reference's
    ``flash_attn_with_kvcache`` which updates the cache in-kernel)."""
    n, sq, h, d = q.shape
    assert sq == 1, "paged_decode_attention is the single-token decode path"
    p, kvh, bs, _ = k_pool.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic DMA slices must be 128-aligned on the lane (last) dim; callers
    # gate on paged_decode_supported() and use the gather fallback otherwise.
    assert interpret or d % 128 == 0, \
        f"paged decode kernel needs head_dim % 128 == 0, got {d}"
    g = h // kvh
    pad_g = max(g, 8)  # sublane minimum

    qg = q.reshape(n, kvh, g, d)
    if pad_g != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, pad_g - g), (0, 0)))

    # pad the block table so group fetches may index up to GROUP-1 pages past
    # the last live page (padding = 0 = the null page, fetched branch-free)
    maxb = block_tables.shape[1]
    maxb_pad = (-(-maxb // GROUP) + 1) * GROUP
    block_tables = jnp.pad(block_tables, ((0, 0), (0, maxb_pad - maxb)))

    ctx = ctx_lens.astype(jnp.int32)
    if sliding_window is not None:
        start = jnp.maximum(ctx - sliding_window, 0)
    else:
        start = jnp.zeros_like(ctx)

    # f32 pools: the MXU's default f32 matmul is a single bf16 pass (~1e-3
    # error vs interpret mode's true f32); request HIGHEST so compiled ==
    # interpret == oracle. bf16 pools (the serving path) keep the fast default.
    precision = (jax.lax.Precision.HIGHEST if k_pool.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_paged_decode_kernel, scale=scale, block_size=bs,
                               precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, kvh, pad_g, d), lambda ni, *_: (ni, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, pad_g, d), lambda ni, *_: (ni, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, GROUP * bs, d), k_pool.dtype),
            pltpu.VMEM((2, kvh, GROUP * bs, d), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, kvh, pad_g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), ctx, start, qg, k_pool, v_pool)
    return out[:, :, :g, :].reshape(n, 1, h, d)


def paged_decode_supported(head_dim: int) -> bool:
    """True when the compiled kernel can serve this geometry (Mosaic DMA
    slices must be 128-aligned on the lane dim). Callers fall back to the
    gather path otherwise."""
    return head_dim % 128 == 0
