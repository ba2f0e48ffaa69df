"""Ring attention — context parallelism over the sequence mesh axis.

TPU-native analog of the reference's CP path (SURVEY §2.8 row CP:
torch.distributed context_parallel ring attention over SDPA, delegated to
accelerate — reference trainer.py:2235-2310). Here it is a first-class op:
Q/K/V are sequence-sharded on a mesh axis; each device computes its local
attention block with an online-softmax accumulator while K/V chunks rotate
around the ring via ``lax.ppermute`` — nearest-neighbor traffic that maps
exactly onto the TPU ICI torus (SURVEY §5.7 "ring comes from torch CP";
here it rides ICI).

Numerics: flash-style streaming softmax (m, l, acc) over ring steps, so the
result equals full attention to float tolerance regardless of chunking.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attn(q, k, v, bias):
    """One (q_chunk, kv_chunk) block: returns (unnormalized acc, m, l)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s + bias
    m = jnp.max(s, axis=-1)  # [B, H, Q]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_attention_sharded(
    q, k, v,  # local chunks [B, S_local, H|KVH, D]
    q_positions,   # [B, S_local] absolute positions of local queries
    kv_positions,  # [B, S_local] absolute positions of local kv
    kv_valid,      # [B, S_local] validity of local kv
    *,
    axis_name: str,
    scale: float,
    causal: bool = True,
):
    """Body to run inside shard_map with q/k/v sequence-sharded on
    ``axis_name``. K/V (with their position/validity vectors) rotate around
    the ring; the online-softmax state stays local."""
    axis_size = jax.lax.psum(1, axis_name)
    h, kvh = q.shape[2], k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qs = (q.astype(jnp.float32)) * scale

    def bias_for(kv_pos, valid):
        ok = valid.astype(bool)[:, None, None, :]  # [B,1,1,K]
        if causal:
            ok = ok & (kv_pos[:, None, None, :] <= q_positions[:, None, :, None])
        return jnp.where(ok, 0.0, -1e30)

    def step(carry, _):
        k_c, v_c, kvp_c, kvv_c, m, l, acc = carry
        bias = bias_for(kvp_c, kvv_c)
        acc_i, m_i, l_i = _block_attn(qs, k_c.astype(jnp.float32), v_c, bias)
        # online-softmax merge
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        l = l * alpha + l_i * beta
        acc = acc * alpha.transpose(0, 2, 1)[..., None] + acc_i * beta.transpose(0, 2, 1)[..., None]
        # rotate kv to the next ring neighbor (nearest-neighbor ICI hop)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        kvp_c = jax.lax.ppermute(kvp_c, axis_name, perm)
        kvv_c = jax.lax.ppermute(kvv_c, axis_name, perm)
        return (k_c, v_c, kvp_c, kvv_c, m_new, l, acc), None

    b, sq = q.shape[0], q.shape[1]
    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    acc0 = jnp.zeros((b, sq, h, q.shape[-1]), jnp.float32)
    if hasattr(jax.lax, "pvary"):
        # jax>=0.8 varying-axes typing: the accumulator starts device-varying
        m0, l0, acc0 = (jax.lax.pvary(x, (axis_name,)) for x in (m0, l0, acc0))
    carry = (k, v, kv_positions, kv_valid, m0, l0, acc0)
    (k, v, _, _, m, l, acc), _ = jax.lax.scan(step, carry, None, length=axis_size)
    out = acc / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def make_ring_attention(mesh: Mesh, seq_axis: str = "sequence", *, causal: bool = True):
    """shard_map-wrapped ring attention: takes GLOBAL [B, S, H, D] arrays
    sequence-sharded on ``seq_axis`` and returns the full attention output.
    The entry point for context-parallel training (reference CP via
    accelerate ParallelismConfig — SURVEY §2.8)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def fn(q, k, v, q_positions, kv_positions, kv_valid, scale):
        return ring_attention_sharded(
            q, k, v, q_positions, kv_positions, kv_valid,
            axis_name=seq_axis, scale=scale, causal=causal)

    spec4 = P(None, seq_axis, None, None)
    spec2 = P(None, seq_axis)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2, spec2, spec2, P()),
        out_specs=spec4,
    )

    def ring_attention(q, k, v, *, q_positions=None, kv_valid=None, scale=None):
        b, s = q.shape[0], q.shape[1]
        if q_positions is None:
            q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        if kv_valid is None:
            kv_valid = jnp.ones((b, s), jnp.int32)
        scale = scale if scale is not None else q.shape[-1] ** -0.5
        kv_positions = q_positions
        return mapped(q, k, v, q_positions, kv_positions, kv_valid,
                      jnp.asarray(scale, jnp.float32))

    return ring_attention
