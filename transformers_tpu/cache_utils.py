"""KV-cache system.

TPU-native analog of reference src/transformers/cache_utils.py. XLA's
compilation model inverts the reference's default (SURVEY §7): the
concat-growing ``DynamicCache`` (cache_utils.py:1730) is wrong for TPU, so the
**StaticCache** (preallocated, reference cache_utils.py:1822) is the default
here. Caches are immutable pytree dataclasses updated functionally
(``jax.lax.dynamic_update_slice``) so decode steps jit into a single fused
program with donated buffers.

Layers may have different effective windows (sliding/hybrid, reference
cache_utils.py:203,504): sliding layers allocate ``min(max_len, window)``
slots and write at ``pos % window`` (ring buffer).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["keys", "values"],
         meta_fields=["layer_windows", "max_len", "layout"])
@dataclass(frozen=True)
class StaticKVCache:
    """Preallocated per-layer KV buffers.

    keys/values: tuples (len = num layers) of arrays in one of two layouts:

    - ``layout="bshd"`` (default): [B, max_len, KVH, D] — matches the
      attention-input layout, zero-copy for families that attend over the
      raw buffer with the eager/flash kernels.
    - ``layout="bhsd"``: [B, KVH, max_len, D] — the decode-optimal layout:
      per-(batch, kv-head) KV slabs are contiguous [S, D] blocks, so the
      single-token decode attention streams them at full HBM rate (the
      [B,S,KVH,D] layout forces strided reads, measured ~0.6x peak on v5e).
      Used by the llama decoder skeleton (ops/attention.py
      ``cached_attention_bhsd``).

    ``update()`` always ACCEPTS k/v in [B, S, KVH, D] (the projection
    layout) and transposes the incoming slice internally for bhsd caches —
    the transpose touches only the new tokens, not the buffer.

    ``layer_windows`` records per-layer sliding windows; the window is
    enforced by the attention mask over a full-length buffer (ring buffers
    are a later memory optimization).
    """

    keys: tuple
    values: tuple
    layer_windows: tuple  # per-layer Optional[int] sliding window (None = full)
    max_len: int
    layout: str = "bshd"

    @property
    def num_layers(self) -> int:
        return len(self.keys)

    @property
    def batch_size(self) -> int:
        return self.keys[0].shape[0]

    def update(self, layer_idx: int, k: jnp.ndarray, v: jnp.ndarray, pos) -> "StaticKVCache":
        """Write k/v [B, S, KVH, D] at absolute slot ``pos`` (scalar). Returns
        the new cache. Ring-buffer write for sliding layers."""
        buf_k, buf_v = self.keys[layer_idx], self.values[layer_idx]
        slot = jnp.asarray(pos, jnp.int32)
        z = jnp.zeros((), jnp.int32)
        if self.layout == "bhsd":
            k = jnp.swapaxes(k, 1, 2)  # [B, KVH, S, D]
            v = jnp.swapaxes(v, 1, 2)
            start = (z, z, slot, z)
        else:
            start = (z, slot, z, z)
        new_k = jax.lax.dynamic_update_slice(buf_k, k.astype(buf_k.dtype), start)
        new_v = jax.lax.dynamic_update_slice(buf_v, v.astype(buf_v.dtype), start)
        keys = self.keys[:layer_idx] + (new_k,) + self.keys[layer_idx + 1 :]
        values = self.values[:layer_idx] + (new_v,) + self.values[layer_idx + 1 :]
        return replace(self, keys=keys, values=values)

    def layer(self, layer_idx: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Native-layout buffers; callers must branch on ``self.layout``
        (every in-tree caller outside the llama skeleton uses bshd caches)."""
        return self.keys[layer_idx], self.values[layer_idx]


def init_static_cache(
    *,
    num_layers: int,
    batch_size: int,
    max_len: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    layer_windows: Optional[tuple] = None,
    layout: str = "bshd",
) -> StaticKVCache:
    """Build an empty cache (reference StaticCache preallocation, cache_utils.py:1822)."""
    if layer_windows is None:
        layer_windows = (None,) * num_layers
    if layout == "bhsd":
        shape = (batch_size, num_kv_heads, max_len, head_dim)
    else:
        shape = (batch_size, max_len, num_kv_heads, head_dim)
    keys = []
    values = []
    for _ in layer_windows:
        keys.append(jnp.zeros(shape, dtype))
        values.append(jnp.zeros(shape, dtype))
    return StaticKVCache(keys=tuple(keys), values=tuple(values),
                         layer_windows=tuple(layer_windows), max_len=max_len,
                         layout=layout)


def layer_sliding_window(config, layer_idx: int) -> Optional[int]:
    """Per-layer effective sliding window (reference cache_utils.py:1694
    ``get_layer_types_and_kwargs`` + per-model attention wiring):

    - ``layer_types`` list: "sliding_attention" entries get the window.
    - Qwen2-style ``use_sliding_window``+``max_window_layers``: sliding only
      for layers >= max_window_layers.
    - plain ``sliding_window``: every layer (Mistral).
    """
    window = getattr(config, "sliding_window", None)
    if window is None:
        return None
    layer_types = getattr(config, "layer_types", None)
    if layer_types is not None:
        return window if layer_types[layer_idx] == "sliding_attention" else None
    use_sliding = getattr(config, "use_sliding_window", True)
    if not use_sliding:
        return None
    max_window_layers = getattr(config, "max_window_layers", None)
    if max_window_layers is not None and layer_idx < max_window_layers:
        return None
    return window


def cache_from_config(config, batch_size: int, max_len: int, dtype=jnp.bfloat16,
                      implementation: str = "static", layout: str = "bshd"):
    """Derive cache geometry from a decoder config (hybrid layer_types aware,
    reference cache_utils.py:1694 ``get_layer_types_and_kwargs``).
    ``implementation``: "static" (default) or "quantized" (int8 KV) —
    the reference's generation_config.cache_implementation vocabulary (A.7)."""
    text_config = config.get_text_config() if hasattr(config, "get_text_config") else config
    num_layers = text_config.num_hidden_layers
    num_kv = getattr(text_config, "num_key_value_heads", None) or text_config.num_attention_heads
    head_dim = getattr(text_config, "head_dim", None) or (
        text_config.hidden_size // text_config.num_attention_heads
    )
    layer_windows = tuple(layer_sliding_window(text_config, i) for i in range(num_layers))
    builder = init_quantized_cache if implementation == "quantized" else init_static_cache
    return builder(
        num_layers=num_layers,
        batch_size=batch_size,
        max_len=max_len,
        num_kv_heads=num_kv,
        head_dim=head_dim,
        dtype=dtype,
        layer_windows=layer_windows,
        layout=layout,
    )


# Reference-named aliases (cache_utils.py:1730/:1822). On TPU the
# preallocated static cache is the only sensible layout (SURVEY §7), so both
# names resolve to it; ``DynamicCache`` exists for API familiarity.
StaticCache = StaticKVCache
DynamicCache = StaticKVCache


@partial(jax.tree_util.register_dataclass,
         data_fields=["kv", "conv_states", "ssm_states"], meta_fields=["initialized"])
@dataclass(frozen=True)
class HybridCache:
    """Cache for attention+SSM hybrid decoders (Bamba/Jamba/Zamba2/FalconH1 —
    reference models/bamba HybridMambaAttentionDynamicCache analog).

    ``kv`` holds preallocated KV buffers indexed by layer (None entries at
    SSM layer indices); ``conv_states``/``ssm_states`` are per-layer
    recurrent states (None entries at attention indices). ``initialized`` is
    static metadata: False during prefill, True in the decode loop — the same
    contract as the pure-Mamba cache."""

    kv: StaticKVCache
    conv_states: tuple
    ssm_states: tuple
    initialized: bool = False

    @property
    def max_len(self) -> int:
        return self.kv.max_len

    @property
    def layout(self) -> str:
        return self.kv.layout

    def update(self, layer_idx: int, k, v, pos) -> "HybridCache":
        return replace(self, kv=self.kv.update(layer_idx, k, v, pos))

    def layer(self, layer_idx: int):
        return self.kv.layer(layer_idx)


def init_hybrid_cache(*, batch_size: int, max_len: int, dtype, block_types,
                      num_kv_heads: int, head_dim: int, conv_shape, ssm_shape,
                      layer_windows=None) -> HybridCache:
    """HybridCache with KV buffers at "attention" indices and conv/ssm
    recurrent states elsewhere (None entries cost nothing as pytree leaves).

    ``conv_shape``/``ssm_shape``: per-layer state shapes without the batch dim
    (mamba1: conv [I,K] ssm [I,N]; mamba2: conv [conv_dim,K] ssm [H,P,N]).
    Block type "parallel" (FalconH1-style layers running attention AND SSM on
    the same index) allocates both."""
    keys, values, conv, ssm = [], [], [], []
    for t in block_types:
        if t in ("attention", "parallel"):
            keys.append(jnp.zeros((batch_size, max_len, num_kv_heads, head_dim), dtype))
            values.append(jnp.zeros((batch_size, max_len, num_kv_heads, head_dim), dtype))
        else:
            keys.append(None)
            values.append(None)
        if t in ("attention",):
            conv.append(None)
            ssm.append(None)
        else:
            conv.append(jnp.zeros((batch_size,) + tuple(conv_shape), dtype))
            ssm.append(jnp.zeros((batch_size,) + tuple(ssm_shape), jnp.float32))
    kv = StaticKVCache(keys=tuple(keys), values=tuple(values),
                       layer_windows=tuple(layer_windows) if layer_windows is not None
                       else (None,) * len(block_types),
                       max_len=max_len)
    return HybridCache(kv=kv, conv_states=tuple(conv), ssm_states=tuple(ssm),
                       initialized=False)


@partial(jax.tree_util.register_dataclass,
         data_fields=["keys", "values", "key_scales", "value_scales"],
         meta_fields=["layer_windows", "max_len", "layout"])
@dataclass(frozen=True)
class QuantizedKVCache:
    """int8 KV cache with per-(token, head) scales (reference
    cache_utils.py:698/:1877 QuantizedCache — quanto/hqq backends there; a
    symmetric int8 scheme here). Halves KV HBM footprint and decode
    read traffic; dequant happens on read and fuses into attention.
    """

    keys: tuple         # int8 [B, max_len, KVH, D] (bshd) / [B, KVH, max_len, D] (bhsd)
    values: tuple
    key_scales: tuple   # f32, same layout with D -> 1
    value_scales: tuple
    layer_windows: tuple
    max_len: int
    layout: str = "bshd"

    @property
    def num_layers(self) -> int:
        return len(self.keys)

    @staticmethod
    def _quantize(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0,
                            1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def update(self, layer_idx: int, k: jnp.ndarray, v: jnp.ndarray, pos) -> "QuantizedKVCache":
        qk, sk = self._quantize(k)
        qv, sv = self._quantize(v)
        slot = jnp.asarray(pos, jnp.int32)
        z = jnp.zeros((), jnp.int32)
        if self.layout == "bhsd":
            qk, sk = jnp.swapaxes(qk, 1, 2), jnp.swapaxes(sk, 1, 2)
            qv, sv = jnp.swapaxes(qv, 1, 2), jnp.swapaxes(sv, 1, 2)
            start4 = (z, z, slot, z)
        else:
            start4 = (z, slot, z, z)
        keys = self.keys[:layer_idx] + (
            jax.lax.dynamic_update_slice(self.keys[layer_idx], qk, start4),) + self.keys[layer_idx + 1:]
        values = self.values[:layer_idx] + (
            jax.lax.dynamic_update_slice(self.values[layer_idx], qv, start4),) + self.values[layer_idx + 1:]
        key_scales = self.key_scales[:layer_idx] + (
            jax.lax.dynamic_update_slice(self.key_scales[layer_idx], sk, start4),) + self.key_scales[layer_idx + 1:]
        value_scales = self.value_scales[:layer_idx] + (
            jax.lax.dynamic_update_slice(self.value_scales[layer_idx], sv, start4),) + self.value_scales[layer_idx + 1:]
        return replace(self, keys=keys, values=values, key_scales=key_scales,
                       value_scales=value_scales)

    def layer(self, layer_idx: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        k = self.keys[layer_idx].astype(jnp.float32) * self.key_scales[layer_idx]
        v = self.values[layer_idx].astype(jnp.float32) * self.value_scales[layer_idx]
        return k, v


def init_quantized_cache(*, num_layers: int, batch_size: int, max_len: int,
                         num_kv_heads: int, head_dim: int,
                         layer_windows: Optional[tuple] = None,
                         layout: str = "bshd", **_) -> QuantizedKVCache:
    if layer_windows is None:
        layer_windows = (None,) * num_layers
    if layout == "bhsd":
        kv_shape = (batch_size, num_kv_heads, max_len, head_dim)
        sc_shape = (batch_size, num_kv_heads, max_len, 1)
    else:
        kv_shape = (batch_size, max_len, num_kv_heads, head_dim)
        sc_shape = (batch_size, max_len, num_kv_heads, 1)
    return QuantizedKVCache(
        keys=tuple(jnp.zeros(kv_shape, jnp.int8) for _ in range(num_layers)),
        values=tuple(jnp.zeros(kv_shape, jnp.int8) for _ in range(num_layers)),
        key_scales=tuple(jnp.zeros(sc_shape, jnp.float32) for _ in range(num_layers)),
        value_scales=tuple(jnp.zeros(sc_shape, jnp.float32) for _ in range(num_layers)),
        layer_windows=tuple(layer_windows), max_len=max_len, layout=layout)
