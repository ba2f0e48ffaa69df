"""Jitted paged-attention model execution.

TPU-native analog of reference generation/continuous_batching/model_runner.py
(:29 ModelRunner, :145 cudagraph capture). XLA replaces cudagraphs: the
prefill-chunk and decode-step programs are jitted once per static bucket
(chunk size, decode batch) and replayed every scheduler step with donated
page pools.

The key trick is ``PagedCacheView``: an adapter that satisfies the cache
interface the decoder attention already uses (``update``/``layer``/
``max_len``) but reads/writes paged pools through block tables — the entire
model stack runs unchanged over paged KV.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cache import PagedKVCache


@partial(jax.tree_util.register_dataclass,
         data_fields=["keys", "values", "block_tables", "write_slots"],
         meta_fields=["block_size", "max_len"])
@dataclass
class PagedCacheView:
    """Paged pools exposed as a per-step cache.

    - ``write_slots`` [N, S]: flat pool slot (block*block_size + offset) for
      every incoming token; slot 0 (the reserved null block) absorbs padding.
    - ``layer(i)`` gathers each row's pages to a contiguous [N, max_len]
      context (a Pallas block-table kernel replaces this gather on TPU).
    """

    keys: tuple
    values: tuple
    block_tables: jnp.ndarray  # [N, MAXB] int32
    write_slots: jnp.ndarray   # [N, S] int32
    block_size: int
    max_len: int               # MAXB * block_size

    def update(self, layer_idx, k, v, cache_position):
        n, s, kvh, d = k.shape
        flat_k = self.keys[layer_idx].reshape(-1, kvh, d)
        flat_v = self.values[layer_idx].reshape(-1, kvh, d)
        slots = self.write_slots.reshape(-1)
        flat_k = flat_k.at[slots].set(k.reshape(-1, kvh, d).astype(flat_k.dtype))
        flat_v = flat_v.at[slots].set(v.reshape(-1, kvh, d).astype(flat_v.dtype))
        shape = self.keys[layer_idx].shape
        object.__setattr__(self, "keys",
                           self.keys[:layer_idx] + (flat_k.reshape(shape),) + self.keys[layer_idx + 1:])
        object.__setattr__(self, "values",
                           self.values[:layer_idx] + (flat_v.reshape(shape),) + self.values[layer_idx + 1:])
        return self

    def layer(self, layer_idx):
        kvh, d = self.keys[layer_idx].shape[-2:]
        k = jnp.take(self.keys[layer_idx], self.block_tables, axis=0)   # [N, MAXB, BS, KVH, D]
        v = jnp.take(self.values[layer_idx], self.block_tables, axis=0)
        n = self.block_tables.shape[0]
        return (k.reshape(n, self.max_len, kvh, d), v.reshape(n, self.max_len, kvh, d))


class ModelRunner:
    """Compiles and replays paged prefill/decode programs (reference
    model_runner.py:29)."""

    def __init__(self, model, cache: PagedKVCache, *, max_blocks_per_seq: int):
        self.model = model
        self.cache = cache
        self.max_blocks_per_seq = max_blocks_per_seq
        self.max_len = max_blocks_per_seq * cache.block_size
        self._fns: dict = {}

    # ------------------------------------------------------------- programs
    def _view(self, pools: PagedKVCache, block_tables, write_slots):
        return PagedCacheView(
            keys=pools.keys, values=pools.values, block_tables=block_tables,
            write_slots=write_slots, block_size=pools.block_size, max_len=self.max_len)

    def _build_prefill(self, chunk: int):
        model = self.model

        def fn(params, pools, input_ids, block_tables, write_slots, positions, ctx_len, last_idx):
            # input_ids [1, chunk] (tail may be padding writing to the null
            # block); positions [1, chunk]; ctx_len scalar: valid kv length
            # AFTER this chunk; last_idx: chunk index of the final real token
            view = self._view(pools, block_tables, write_slots)
            kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :] < ctx_len).astype(jnp.int32)
            out = model(
                params, input_ids=input_ids, attention_mask=kv_valid,
                position_ids=positions, past_key_values=view,
                cache_position=positions[:, :1], logits_to_keep=0)
            new_pools = PagedKVCache(keys=out.past_key_values.keys,
                                     values=out.past_key_values.values,
                                     block_size=pools.block_size, num_blocks=pools.num_blocks)
            return new_pools, out.logits[0, last_idx]

        return jax.jit(fn, donate_argnums=(1,))

    def _build_decode(self, n: int):
        model = self.model

        def fn(params, pools, tokens, block_tables, write_slots, positions, ctx_lens):
            # tokens [N, 1]; positions [N]; ctx_lens [N] length AFTER this token
            view = self._view(pools, block_tables, write_slots)
            kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :] < ctx_lens[:, None]).astype(jnp.int32)
            out = model(
                params, input_ids=tokens, attention_mask=kv_valid,
                position_ids=positions[:, None], past_key_values=view,
                cache_position=positions[:, None], logits_to_keep=1)
            new_pools = PagedKVCache(keys=out.past_key_values.keys,
                                     values=out.past_key_values.values,
                                     block_size=pools.block_size, num_blocks=pools.num_blocks)
            return new_pools, out.logits[:, -1, :]

        return jax.jit(fn, donate_argnums=(1,))

    # --------------------------------------------------------------- public
    def prefill_chunk(self, params, input_ids: np.ndarray, block_table: list[int],
                      start: int, prompt_len_after: int, chunk_bucket: Optional[int] = None):
        """Run one prompt chunk of ONE sequence. input_ids [C] (real tokens);
        padded up to ``chunk_bucket`` with null-block writes."""
        real = len(input_ids)
        chunk = chunk_bucket or real
        key = ("prefill", chunk)
        if key not in self._fns:
            self._fns[key] = self._build_prefill(chunk)
        bs = self.cache.block_size
        bt = np.zeros((1, self.max_blocks_per_seq), np.int32)
        bt[0, : len(block_table)] = block_table
        ids = np.zeros((1, chunk), np.int32)
        ids[0, :real] = input_ids
        positions = (start + np.arange(chunk)).astype(np.int32)[None, :]
        slots = np.zeros((1, chunk), np.int32)
        for j in range(real):
            p = start + j
            slots[0, j] = block_table[p // bs] * bs + p % bs
        self.cache, logits = self._fns[key](
            self.model.params if params is None else params, self.cache,
            jnp.asarray(ids), jnp.asarray(bt), jnp.asarray(slots),
            jnp.asarray(positions), jnp.asarray(prompt_len_after, jnp.int32),
            jnp.asarray(real - 1, jnp.int32))
        return logits

    def decode_step(self, params, tokens: np.ndarray, block_tables: list[list[int]],
                    positions: np.ndarray):
        """One decode step for N sequences. tokens [N], positions [N] (the
        slot each token goes to). Returns logits [N, V]."""
        n = len(tokens)
        key = ("decode", n)
        if key not in self._fns:
            self._fns[key] = self._build_decode(n)
        bs = self.cache.block_size
        bt = np.zeros((n, self.max_blocks_per_seq), np.int32)
        slots = np.zeros((n, 1), np.int32)
        for i, table in enumerate(block_tables):
            bt[i, : len(table)] = table
            p = int(positions[i])
            slots[i, 0] = table[p // bs] * bs + p % bs if table else 0
        ctx_lens = (positions + 1).astype(np.int32)
        self.cache, logits = self._fns[key](
            self.model.params if params is None else params, self.cache,
            jnp.asarray(tokens[:, None], jnp.int32), jnp.asarray(bt), jnp.asarray(slots),
            jnp.asarray(positions.astype(np.int32)), jnp.asarray(ctx_lens))
        return logits
