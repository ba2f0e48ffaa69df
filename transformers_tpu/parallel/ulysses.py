"""Ulysses sequence parallelism: all-to-all head<->sequence reshard.

Reference analog: the DeepSpeed Ulysses path the reference delegates to
(``sp_backend="deepspeed"`` -> UlyssesSPDataLoaderAdapter, reference
trainer.py:2267-2270). Mechanism: activations arrive sequence-sharded
[B, S/N, H, D]; before attention an all-to-all re-shards to head-sharded
[B, S, H/N, D] so every device computes FULL-sequence attention for its
slice of heads; a second all-to-all restores sequence sharding after.

On a TPU torus the all-to-all rides ICI and costs one activation pass —
usually cheaper than ring attention when H is divisible by the axis (ring
wins for very long sequences where even one full-length activation does not
fit). Implemented as jnp ops inside ``shard_map``:

    seq-sharded local [B, s, H, D]
      -> split heads into N groups  [B, s, N, H/N, D]
      -> all_to_all over the axis   (swap the N group dim with the seq dim)
      -> head-sharded local [B, N*s = S, H/N, D]

``ulysses_attention`` wraps any full-attention callable with the two
reshards and is numerically identical to unsharded attention (tested on the
virtual CPU mesh).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SEQUENCE_AXIS


def _heads_to_seq(x: jnp.ndarray, axis_name: str, n: int) -> jnp.ndarray:
    """[B, s, H, D] seq-sharded -> [B, n*s, H/n, D] head-sharded (local views)."""
    b, s, h, d = x.shape
    x = x.reshape(b, s, n, h // n, d)
    # all_to_all: scatter the head-group dim, gather the sequence dim
    x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
    return x.reshape(b, n * s, h // n, d)


def _seq_to_heads(x: jnp.ndarray, axis_name: str, n: int) -> jnp.ndarray:
    """[B, S, H/n, D] head-sharded -> [B, S/n, H, D] seq-sharded (local views)."""
    b, S, hn, d = x.shape
    x = x.reshape(b, n, S // n, hn, d)
    x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=3, tiled=True)
    return x.reshape(b, S // n, hn * n, d)


def ulysses_attention_sharded(attn_fn: Callable, q, k, v, *, axis_name: str, **kwargs):
    """Body for use inside shard_map: q/k/v are LOCAL seq shards [B, s, H, D]."""
    n = jax.lax.axis_size(axis_name)
    q = _heads_to_seq(q, axis_name, n)
    k = _heads_to_seq(k, axis_name, n)
    v = _heads_to_seq(v, axis_name, n)
    out = attn_fn(q, k, v, **kwargs)  # full-sequence attention, H/n heads
    return _seq_to_heads(out, axis_name, n)


def make_ulysses_attention(mesh: Mesh, seq_axis: str = SEQUENCE_AXIS, *,
                           attn_fn: Callable | None = None, causal: bool = True):
    """shard_map-wrapped Ulysses attention over GLOBAL [B, S, H, D] arrays
    sequence-sharded on ``seq_axis``. H must divide by the axis size."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if attn_fn is None:
        from ..ops.attention import eager_attention

        attn_fn = eager_attention

    def fn(q, k, v, q_positions, kv_valid, scale):
        # positions/validity are per-GLOBAL-sequence (replicated full-length)
        out = ulysses_attention_sharded(
            attn_fn, q, k, v, axis_name=seq_axis,
            q_positions=q_positions, kv_valid=kv_valid,
            is_causal=causal, scale=scale)
        return out

    spec4 = P(None, seq_axis, None, None)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(spec4, spec4, spec4, P(), P(), P()),
        out_specs=spec4,
    )

    def ulysses(q, k, v, *, q_positions=None, kv_valid=None, scale=None):
        b, s = q.shape[0], q.shape[1]
        if q_positions is None:
            q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        if kv_valid is None:
            kv_valid = jnp.ones((b, s), jnp.int32)
        scale = scale if scale is not None else q.shape[-1] ** -0.5
        return mapped(q, k, v, q_positions, kv_valid, jnp.asarray(scale, jnp.float32))

    return ulysses
