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

Backward: flash backward kernels (dKV and dQ) with in-kernel recompute from
the forward's saved logsumexp — O(S) memory, matching flash-attn bwd
semantics (reference modeling_flash_attention_utils.py's external kernels).
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
    lse_ref,  # [1, 1, BQ, 128] f32 lane-replicated logsumexp (bwd residual)
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
        # logsumexp residual for the backward kernels; fully-masked rows get
        # -inf -> bwd probabilities exp(s - (-inf)) are forced to 0 via mask
        lse = m_scratch[...] + jnp.log(jnp.where(l_scratch[...] == 0.0, 1.0,
                                                 l_scratch[...]))
        lse_ref[0, 0, :, :] = jnp.where(l_scratch[...] == 0.0, -jnp.inf, lse)


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

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, qi, ki, g=group: (bi, hi // g, ki, 0)),
            pl.BlockSpec((b, bq), lambda bi, hi, qi, ki: (0, qi)),
            pl.BlockSpec((b, bkv), lambda bi, hi, qi, ki: (0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 128), jnp.float32),
        ),
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
    return jnp.swapaxes(out, 1, 2), lse[:, :, :, 0]  # BSHD, [B, H, SQ_pad]


def out_size(b, h, s, d):
    return b * h * s * d


def _recompute_p_ds(q, k, v, do, lse, delta, q_pos, kv_mask, kv_slots, *,
                    scale, causal, sliding_window, logit_cap):
    """Shared bwd block math: probabilities p and logit grads ds (both f32).

    ``lse``/``delta`` are [BQ, 1] columns.

    p = exp(s_capped - lse); ds = dL/d(q.k) including the scale and the
    tanh-softcap chain rule. Masked/padded entries are forced to exact 0.
    """
    s_raw = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    if logit_cap is not None and logit_cap > 0:
        sc = logit_cap * jnp.tanh(s_raw / logit_cap)
    else:
        sc = s_raw
    mask = kv_mask
    if causal:
        mask = mask & (kv_slots <= q_pos[:, None])
    if sliding_window is not None:
        mask = mask & (kv_slots > (q_pos[:, None] - sliding_window))
    p = jnp.where(mask, jnp.exp(sc - lse), 0.0)                 # [BQ, BKV]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BQ, BKV]
    ds = p * (dp - delta)
    if logit_cap is not None and logit_cap > 0:
        ds = ds * (1.0 - (sc / logit_cap) ** 2)
    return p, ds * scale


def _flash_bwd_dkv_kernel(
    q_ref,      # [1, 1, BQ, D]
    k_ref,      # [1, 1, BKV, D]
    v_ref,      # [1, 1, BKV, D]
    do_ref,     # [1, 1, BQ, D]
    lse_ref,    # [1, BQ, H] (queries on sublanes, heads on lanes)
    delta_ref,  # [1, BQ, H]
    qpos_ref,   # [B, BQ]
    kvvalid_ref,  # [B, BKV]
    dk_ref,     # [1, 1, BKV, D] out (per QUERY head; group-summed outside)
    dv_ref,     # [1, 1, BKV, D] out
    dk_acc,     # [BKV, D] f32 scratch
    dv_acc,     # [BKV, D] f32 scratch
    *,
    scale, block_kv, causal, sliding_window, logit_cap,
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_pos = qpos_ref[b_idx, :]
    kv_slot0 = kv_idx * block_kv

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        # extract this head's column with a one-hot dot (Mosaic forbids
        # dynamic single-lane indexing)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (lse_ref.shape[2], 1), 0)
              == h_idx).astype(jnp.float32)
        lse = jax.lax.dot_general(lse_ref[0], oh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)    # [BQ, 1]
        delta = jax.lax.dot_general(delta_ref[0], oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)  # [BQ, 1]
        kv_slots = kv_slot0 + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], k.shape[0]), 1)
        kv_mask = kvvalid_ref[b_idx, :][None, :] > 0
        p, ds = _recompute_p_ds(q, k, v, do, lse, delta, q_pos, kv_mask,
                                kv_slots, scale=scale, causal=causal,
                                sliding_window=sliding_window, logit_cap=logit_cap)
        # dV += P^T dO ; dK += dS^T Q
        dv_acc[...] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dk_acc[...] += jax.lax.dot_general(ds, q.astype(jnp.float32),
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    if causal:
        should_run = kv_slot0 <= jnp.max(q_pos)
        pl.when(should_run)(compute)
    else:
        compute()

    @pl.when(q_idx == num_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qpos_ref, kvvalid_ref,
    dq_ref,     # [1, 1, BQ, D] out
    dq_acc,     # [BQ, D] f32 scratch
    *,
    scale, block_kv, causal, sliding_window, logit_cap,
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q_pos = qpos_ref[b_idx, :]
    kv_slot0 = kv_idx * block_kv

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        # extract this head's column with a one-hot dot (Mosaic forbids
        # dynamic single-lane indexing)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (lse_ref.shape[2], 1), 0)
              == h_idx).astype(jnp.float32)
        lse = jax.lax.dot_general(lse_ref[0], oh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)    # [BQ, 1]
        delta = jax.lax.dot_general(delta_ref[0], oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)  # [BQ, 1]
        kv_slots = kv_slot0 + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], k.shape[0]), 1)
        kv_mask = kvvalid_ref[b_idx, :][None, :] > 0
        p, ds = _recompute_p_ds(q, k, v, do, lse, delta, q_pos, kv_mask,
                                kv_slots, scale=scale, causal=causal,
                                sliding_window=sliding_window, logit_cap=logit_cap)
        dq_acc[...] += jax.lax.dot_general(ds, k.astype(jnp.float32),
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    if causal:
        should_run = kv_slot0 <= jnp.max(q_pos)
        pl.when(should_run)(compute)
    else:
        compute()

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "is_causal", "sliding_window", "logit_cap", "block_q", "block_kv"),
)
def _flash_bwd(
    q, k, v, q_positions, kv_valid, out, lse, do,
    *, scale, is_causal, sliding_window, logit_cap, block_q, block_kv,
):
    """Flash backward: dq/dk/dv with O(S) memory (recompute-in-kernel)."""
    b, sq, h, d = q.shape
    _, skv, kvh, _ = k.shape
    group = h // kvh

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    dot = jnp.swapaxes(do, 1, 2)   # [B, H, SQ, D]
    outt = jnp.swapaxes(out, 1, 2)
    # delta = rowsum(dO * O)
    delta = jnp.sum(dot.astype(jnp.float32) * outt.astype(jnp.float32), axis=-1)  # [B, H, SQ]

    bq = min(block_q, sq)
    bkv = min(block_kv, skv)
    sq_pad = _cdiv(sq, bq) * bq
    skv_pad = _cdiv(skv, bkv) * bkv
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        dot = jnp.pad(dot, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, sq_pad - sq)))
    if lse.shape[-1] != sq_pad:
        lse = lse[:, :, :sq_pad]
    if skv_pad != skv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, skv_pad - skv)))

    # queries on sublanes, heads on lanes: [B, SQ_pad, H] — a (1, bq, H)
    # block is legal (head dim full) and rows slice to [BQ, 1] naturally
    lse_t = jnp.swapaxes(lse, 1, 2)
    delta_t = jnp.swapaxes(delta, 1, 2)

    qpos32 = q_positions.astype(jnp.int32)
    kvv32 = kv_valid.astype(jnp.int32)
    interp = jax.default_backend() != "tpu"

    def in_specs(qm, km):
        """qm/km pick the q-block / kv-block index from the grid's (x, y)."""
        return [
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, xi, yi: (bi, hi, qm(xi, yi), 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, xi, yi: (bi, hi // group, km(xi, yi), 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, xi, yi: (bi, hi // group, km(xi, yi), 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, xi, yi: (bi, hi, qm(xi, yi), 0)),
            pl.BlockSpec((1, bq, h), lambda bi, hi, xi, yi: (bi, qm(xi, yi), 0)),
            pl.BlockSpec((1, bq, h), lambda bi, hi, xi, yi: (bi, qm(xi, yi), 0)),
            pl.BlockSpec((b, bq), lambda bi, hi, xi, yi: (0, qm(xi, yi))),
            pl.BlockSpec((b, bkv), lambda bi, hi, xi, yi: (0, km(xi, yi))),
        ]

    # ---- dK/dV: grid (B, H, KV_blocks, Q_blocks); x = kv block, y = q block
    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, block_kv=bkv, causal=is_causal,
        sliding_window=sliding_window, logit_cap=logit_cap)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, skv_pad // bkv, sq_pad // bq),
        in_specs=in_specs(qm=lambda xi, yi: yi, km=lambda xi, yi: xi),
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, xi, yi: (bi, hi, xi, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda bi, hi, xi, yi: (bi, hi, xi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, skv_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, skv_pad, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qt, kt, vt, dot, lse_t, delta_t, qpos32, kvv32)

    # ---- dQ: grid (B, H, Q_blocks, KV_blocks); x = q block, y = kv block
    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, block_kv=bkv, causal=is_causal,
        sliding_window=sliding_window, logit_cap=logit_cap)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, sq_pad // bq, skv_pad // bkv),
        in_specs=in_specs(qm=lambda xi, yi: xi, km=lambda xi, yi: yi),
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bi, hi, xi, yi: (bi, hi, xi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qt, kt, vt, dot, lse_t, delta_t, qpos32, kvv32)

    dq = jnp.swapaxes(dq[:, :, :sq, :], 1, 2).astype(q.dtype)
    # group-sum per-query-head dK/dV down to the KV heads
    dk = dk[:, :, :skv, :].reshape(b, kvh, group, skv, d).sum(axis=2)
    dv = dv[:, :, :skv, :].reshape(b, kvh, group, skv, d).sum(axis=2)
    dk = jnp.swapaxes(dk, 1, 2).astype(k.dtype)
    dv = jnp.swapaxes(dv, 1, 2).astype(v.dtype)
    return dq, dk, dv


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
    out, _ = _flash_fwd(q, k, v, q_positions, kv_valid, scale=scale, is_causal=is_causal,
                        sliding_window=sliding_window, logit_cap=logit_cap,
                        block_q=512, block_kv=512)
    return out


def _flash_vjp_fwd(q, k, v, q_positions, kv_valid, scale, is_causal, sliding_window, logit_cap):
    out, lse = _flash_fwd(q, k, v, q_positions, kv_valid, scale=scale, is_causal=is_causal,
                          sliding_window=sliding_window, logit_cap=logit_cap,
                          block_q=512, block_kv=512)
    return out, (q, k, v, q_positions, kv_valid, out, lse)


def _flash_vjp_bwd(scale, is_causal, sliding_window, logit_cap, residuals, g):
    q, k, v, q_positions, kv_valid, out, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, q_positions, kv_valid, out, lse, g,
        scale=scale, is_causal=is_causal, sliding_window=sliding_window,
        logit_cap=logit_cap, block_q=512, block_kv=512)
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
