"""Pallas flash attention (TPU).

Replaces the reference's flash-attn CUDA dependency
(reference src/transformers/integrations/flash_attention.py,
modeling_flash_attention_utils.py — external flash-attn 2/3/4 kernels).

Design (SURVEY §7 "masks as data"):
- BSHD wrapper → BHSD kernel layout (head-major slices are contiguous).
- Online-softmax over KV blocks; grid (batch, heads, q_blocks, kv_blocks)
  with VMEM scratch carrying (m, l, acc) across the kv dimension (TPU grids
  iterate sequentially, last axis fastest).
- Masking from data, not closures: causality is *slot-based*
  (kv_slot <= q_position) with a per-batch kv validity vector — exactly the
  semantics of ops/masks.make_causal_bias, so the kernel slots into the same
  attention registry and passes the same parity tests.
- GQA native: kv blocks are indexed at h // group, no repeat_kv materialize.
- Causal block skipping: fully-masked kv blocks skip the matmuls.

Backward: custom VJP that recomputes attention with the eager path (correct,
O(S^2) memory in backward only); a flash backward kernel is a follow-up.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _flash_kernel(
    # prefetched scalars
    # inputs
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BKV, D]
    v_ref,  # [1, 1, BKV, D]
    qpos_ref,  # [B, BQ] int32 absolute slot of each query row (full batch)
    kvvalid_ref,  # [B, BKV] int32 validity of each kv slot (full batch)
    # outputs
    out_ref,  # [1, 1, BQ, D]
    # scratch
    m_scratch,  # [BQ, 128] f32 (lane-replicated running max)
    l_scratch,  # [BQ, 128] f32 (lane-replicated running denom)
    acc_scratch,  # [BQ, D] f32
    *,
    scale: float,
    block_kv: int,
    kv_seq_len: int,
    causal: bool,
    sliding_window: Optional[int],
    logit_cap: Optional[float],
):
    b_idx = pl.program_id(0)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_pos = qpos_ref[b_idx, :]  # [BQ]
    kv_slot0 = kv_idx * block_kv

    def compute():
        q = q_ref[0, 0, :, :]  # [BQ, D]
        k = k_ref[0, 0, :, :]  # [BKV, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BKV]
        s = s * scale
        if logit_cap is not None and logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)

        kv_slots = kv_slot0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = kvvalid_ref[b_idx, :][None, :] > 0
        if causal:
            mask &= kv_slots <= q_pos[:, None]
        if sliding_window is not None:
            mask &= kv_slots > (q_pos[:, None] - sliding_window)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]  # [BQ, 1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)  # [BQ, 1]
        p = jnp.exp(s - m_next)  # [BQ, BKV]
        # fully-masked rows: p contributes ~0 since s = MASK << m
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0, 0, :, :]  # [BKV, D]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, D]
        acc_scratch[...] = acc_scratch[...] * alpha + pv
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

    if causal:
        # Skip blocks where every kv slot is beyond every query position.
        should_run = kv_slot0 <= jnp.max(q_pos)
        pl.when(should_run)(compute)
    else:
        compute()

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0, :, :] = (acc_scratch[...] / safe_l).astype(out_ref.dtype)


def flash_supported(q, k, v) -> bool:
    """Shapes the kernel handles; else callers fall back to eager."""
    if jax.default_backend() != "tpu":
        return False
    b, sq, h, d = q.shape
    _, skv, kvh, _ = k.shape
    if h % kvh != 0:
        return False
    if d % 8 != 0 or d > 512:
        return False
    if v.shape[-1] != d:  # MLA-style narrow V: eager path handles it
        return False
    if sq < 16:  # decode path: single-token queries use the eager/XLA path
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("scale", "is_causal", "sliding_window", "logit_cap", "block_q", "block_kv"),
)
def _flash_fwd(
    q, k, v, q_positions, kv_valid,
    *, scale: float, is_causal: bool, sliding_window: Optional[int],
    logit_cap: Optional[float], block_q: int, block_kv: int,
):
    b, sq, h, d = q.shape
    _, skv, kvh, _ = k.shape
    group = h // kvh

    # BSHD -> BHSD
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    bq = min(block_q, sq)
    bkv = min(block_kv, skv)
    sq_pad = _cdiv(sq, bq) * bq
    skv_pad = _cdiv(skv, bkv) * bkv
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, sq_pad - sq)))
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, skv_pad - skv)))

    grid = (b, h, sq_pad // bq, skv_pad // bkv)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_kv=bkv,
        kv_seq_len=skv_pad,
        causal=is_causal,
        sliding_window=sliding_window,
        logit_cap=logit_cap,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((b, bq), lambda bi, hi, qi, ki: (0, qi)),
            pl.BlockSpec((b, bkv), lambda bi, hi, qi, ki: (0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * skv_pad * d,
            bytes_accessed=(qt.size + kt.size + vt.size + out_size(b, h, sq_pad, d)) * qt.dtype.itemsize,
            transcendentals=b * h * sq_pad * skv_pad,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt, q_positions.astype(jnp.int32), kv_valid.astype(jnp.int32))

    out = out[:, :, :sq, :]
    return jnp.swapaxes(out, 1, 2)  # back to BSHD


def out_size(b, h, s, d):
    return b * h * s * d


def _eager_reference(q, k, v, q_positions, kv_valid, scale, is_causal, sliding_window, logit_cap):
    from ..attention import eager_attention
    from ..masks import causal_mask_bool, to_additive

    if is_causal:
        mask = causal_mask_bool(q_positions, kv_valid, sliding_window=sliding_window)
    else:
        b, skv = kv_valid.shape
        mask = jnp.broadcast_to(kv_valid.astype(bool)[:, None, None, :],
                                (b, 1, q_positions.shape[1], skv))
    bias = to_additive(mask, jnp.float32)
    return eager_attention(q, k, v, bias, scale=scale, logit_cap=logit_cap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, q_positions, kv_valid, scale, is_causal, sliding_window, logit_cap):
    return _flash_fwd(q, k, v, q_positions, kv_valid, scale=scale, is_causal=is_causal,
                      sliding_window=sliding_window, logit_cap=logit_cap,
                      block_q=512, block_kv=512)


def _flash_vjp_fwd(q, k, v, q_positions, kv_valid, scale, is_causal, sliding_window, logit_cap):
    out = _flash(q, k, v, q_positions, kv_valid, scale, is_causal, sliding_window, logit_cap)
    return out, (q, k, v, q_positions, kv_valid)


def _flash_vjp_bwd(scale, is_causal, sliding_window, logit_cap, residuals, g):
    q, k, v, q_positions, kv_valid = residuals
    # Recompute-based backward through the eager path (numerically identical
    # math; flash backward kernel is a planned optimization).
    def f(q, k, v):
        return _eager_reference(q, k, v, q_positions, kv_valid, scale, is_causal,
                                sliding_window, logit_cap)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q, k, v,
    *,
    q_positions=None,
    kv_valid=None,
    bias=None,
    scale: Optional[float] = None,
    is_causal: bool = True,
    sliding_window: Optional[int] = None,
    logit_cap: Optional[float] = None,
):
    """Public entry (BSHD). ``q_positions``/``kv_valid`` carry the mask data;
    ``bias`` is ignored here (the eager fallback consumes it)."""
    b, sq, h, d = q.shape
    _, skv, _, _ = k.shape
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    if kv_valid is None:
        kv_valid = jnp.ones((b, skv), jnp.int32)
    scale = scale if scale is not None else d**-0.5
    return _flash(q, k, v, q_positions, kv_valid, float(scale), bool(is_causal),
                  sliding_window, logit_cap)
