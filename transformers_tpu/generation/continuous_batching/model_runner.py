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
         data_fields=["keys", "values", "block_tables", "write_slots", "ctx_lens"],
         meta_fields=["block_size", "max_len"])
@dataclass
class PagedCacheView:
    """Paged pools exposed as a per-step cache (``layout == "paged"``).

    - ``write_slots`` [N, S]: flat pool slot (block*block_size + offset) for
      every incoming token; slot 0 (the reserved null block) absorbs padding.
    - ``ctx_lens`` [N]: live context length per row AFTER this step's tokens
      — the paged decode kernel's per-row read bound.
    - Decode attention reads pages straight through the block tables
      (ops/pallas/paged_attention.py — no gather); ``layer(i)`` keeps a
      gather fallback for the chunked-prefill path (one row per chunk).
    """

    keys: tuple                # num_layers x [P, KVH, BS, D]
    values: tuple
    block_tables: jnp.ndarray  # [N, MAXB] int32
    write_slots: jnp.ndarray   # [N, S] int32
    ctx_lens: jnp.ndarray      # [N] int32
    block_size: int
    max_len: int               # MAXB * block_size

    layout = "paged"

    def update(self, layer_idx, k, v, cache_position):
        # scatter [N, S] tokens into (block, head, offset) pool positions
        n, s, kvh, d = k.shape
        slots = self.write_slots.reshape(-1)
        blks = slots // self.block_size
        offs = slots % self.block_size
        pool_k = self.keys[layer_idx]
        pool_v = self.values[layer_idx]
        pool_k = pool_k.at[blks, :, offs, :].set(k.reshape(-1, kvh, d).astype(pool_k.dtype))
        pool_v = pool_v.at[blks, :, offs, :].set(v.reshape(-1, kvh, d).astype(pool_v.dtype))
        object.__setattr__(self, "keys",
                           self.keys[:layer_idx] + (pool_k,) + self.keys[layer_idx + 1:])
        object.__setattr__(self, "values",
                           self.values[:layer_idx] + (pool_v,) + self.values[layer_idx + 1:])
        return self

    def paged_layer(self, layer_idx):
        """(k_pool, v_pool, block_tables, ctx_lens) for the decode kernel."""
        return (self.keys[layer_idx], self.values[layer_idx],
                self.block_tables, self.ctx_lens)

    def layer(self, layer_idx):
        """Gather fallback: contiguous [N, max_len, KVH, D] context (used by
        the chunked-prefill path, where queries span many slots)."""
        kvh, d = self.keys[layer_idx].shape[1], self.keys[layer_idx].shape[3]
        n = self.block_tables.shape[0]
        k = jnp.take(self.keys[layer_idx], self.block_tables, axis=0)   # [N, MAXB, KVH, BS, D]
        v = jnp.take(self.values[layer_idx], self.block_tables, axis=0)
        k = jnp.swapaxes(k, 2, 3).reshape(n, self.max_len, kvh, d)
        v = jnp.swapaxes(v, 2, 3).reshape(n, self.max_len, kvh, d)
        return k, v


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
    def _view(self, pools: PagedKVCache, block_tables, write_slots, ctx_lens):
        return PagedCacheView(
            keys=pools.keys, values=pools.values, block_tables=block_tables,
            write_slots=write_slots, ctx_lens=jnp.atleast_1d(ctx_lens),
            block_size=pools.block_size, max_len=self.max_len)

    def _build_prefill(self, chunk: int):
        model = self.model

        def fn(params, pools, input_ids, block_tables, write_slots, positions, ctx_len, last_idx):
            # input_ids [1, chunk] (tail may be padding writing to the null
            # block); positions [1, chunk]; ctx_len scalar: valid kv length
            # AFTER this chunk; last_idx: chunk index of the final real token
            view = self._view(pools, block_tables, write_slots, ctx_len)
            kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :] < ctx_len).astype(jnp.int32)
            out = model(
                params, input_ids=input_ids, attention_mask=kv_valid,
                position_ids=positions, past_key_values=view,
                cache_position=positions[:, :1], logits_to_keep=0)
            new_pools = PagedKVCache(keys=out.past_key_values.keys,
                                     values=out.past_key_values.values,
                                     block_size=pools.block_size, num_blocks=pools.num_blocks)
            last = out.logits[0, last_idx]
            # argmax computed in-program: greedy requests transfer ONE int32
            # instead of the [V] logits row (a 513KB tunnel round-trip)
            return new_pools, (last, jnp.argmax(last, axis=-1).astype(jnp.int32))

        return jax.jit(fn, donate_argnums=(1,))

    def _build_decode(self, n: int):
        model = self.model

        def fn(params, pools, tokens, block_tables, write_slots, positions, ctx_lens):
            # tokens [N, 1]; positions [N]; ctx_lens [N] length AFTER this token
            view = self._view(pools, block_tables, write_slots, ctx_lens)
            kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :] < ctx_lens[:, None]).astype(jnp.int32)
            out = model(
                params, input_ids=tokens, attention_mask=kv_valid,
                position_ids=positions[:, None], past_key_values=view,
                cache_position=positions[:, None], logits_to_keep=1)
            new_pools = PagedKVCache(keys=out.past_key_values.keys,
                                     values=out.past_key_values.values,
                                     block_size=pools.block_size, num_blocks=pools.num_blocks)
            last = out.logits[:, -1, :]
            # in-program argmax: the greedy path transfers [N] int32 tokens,
            # not the [N, V] logits block (4MB at 8B vocab — the dominant
            # per-step cost over a remote/tunneled device link)
            return new_pools, (last, jnp.argmax(last, axis=-1).astype(jnp.int32))

        return jax.jit(fn, donate_argnums=(1,))

    def _build_decode_multi(self, n: int, k: int):
        """K decode steps inside ONE jitted program (reference cudagraph
        replay, model_runner.py:145 — but deeper: the host syncs once per K
        steps instead of once per token, so the host/tunnel dispatch floor is
        amortized K-fold).

        Per-row semantics match the host single-step loop exactly:
        - the entry ``tokens`` are each row's pending token; a pending EOS is
          committed to the output WITHOUT a cache write and the row finishes;
        - otherwise the pending token is written at ``positions`` and the
          next token sampled (argmax, or categorical at ``temps[row]`` > 0);
        - a row finishes when its committed count reaches ``budgets[row]``.
        The loop exits early when every row is finished.
        """
        model = self.model
        bs = self.cache.block_size

        def fn(params, pools, tokens, block_tables, positions, budgets,
               eos_ids, temps, seeds, counts):
            # tokens [N]; positions [N]; budgets [N] (#commits allowed);
            # eos_ids [N, E] (-1 padded); temps [N] f32 (0 = greedy);
            # seeds [N] u32 per-request seeds; counts [N] tokens committed
            # before this program (the per-request sample counter base)
            out = jnp.full((n, k), -1, jnp.int32)
            commits = jnp.zeros((n,), jnp.int32)
            finished = budgets <= 0

            def cond(carry):
                return (carry[0] < k) & ~jnp.all(carry[-1])

            def body(carry):
                (i, keys, values, tokens, positions, out, commits,
                 finished) = carry
                was_finished = finished
                is_eos = jnp.any(tokens[:, None] == eos_ids, axis=-1)
                do_write = ~was_finished & ~is_eos
                blk = jnp.take_along_axis(
                    block_tables, (positions // bs)[:, None], axis=1)[:, 0]
                slots = jnp.where(do_write, blk * bs + positions % bs, 0)
                ctx = jnp.where(do_write, positions + 1, 1).astype(jnp.int32)
                view = PagedCacheView(
                    keys=keys, values=values, block_tables=block_tables,
                    write_slots=slots[:, None], ctx_lens=ctx,
                    block_size=bs, max_len=self.max_len)
                kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :]
                            < ctx[:, None]).astype(jnp.int32)
                mout = model(
                    params, input_ids=tokens[:, None],
                    attention_mask=kv_valid, position_ids=positions[:, None],
                    past_key_values=view, cache_position=positions[:, None],
                    logits_to_keep=1)
                logits = mout.logits[:, -1, :].astype(jnp.float32)
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                committed_now = ~was_finished
                commits_after = commits + committed_now.astype(jnp.int32)
                # per-row key = fold_in(key(seed), #tokens committed incl.
                # this step's) — exactly the host single-step _sample
                # derivation, so results are per-request reproducible and
                # independent of co-scheduled rows / steps_per_sync
                row_keys = jax.vmap(
                    lambda s, c: jax.random.fold_in(jax.random.key(s), c))(
                        seeds, counts + commits_after)
                temped = jax.vmap(
                    lambda kk, lg, t: jax.random.categorical(
                        kk, lg / jnp.maximum(t, 1e-6)))(
                            row_keys, logits, temps).astype(jnp.int32)
                nxt = jnp.where(temps > 0, temped, greedy)

                out = out.at[:, i].set(jnp.where(committed_now, tokens, -1))
                commits = commits_after
                finished = was_finished | is_eos | (commits >= budgets)
                tokens = jnp.where(finished, tokens, nxt)
                positions = positions + do_write.astype(jnp.int32)
                return (i + 1, mout.past_key_values.keys,
                        mout.past_key_values.values, tokens, positions, out,
                        commits, finished)

            (i, keys, values, tokens, positions, out, commits,
             finished) = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), pools.keys,
                             pools.values, tokens, positions, out, commits,
                             finished))
            new_pools = PagedKVCache(keys=keys, values=values,
                                     block_size=pools.block_size,
                                     num_blocks=pools.num_blocks)
            return new_pools, (out, tokens, commits, finished, positions)

        return jax.jit(fn, donate_argnums=(1,))

    def decode_multi(self, params, tokens: np.ndarray,
                     block_tables: list[list[int]], positions: np.ndarray,
                     budgets: np.ndarray, eos_lists: list[tuple],
                     temps: np.ndarray, k: int,
                     seeds: Optional[np.ndarray] = None,
                     counts: Optional[np.ndarray] = None):
        """Run up to ``k`` decode steps for N sequences in one device program.

        ``seeds``/``counts`` drive per-row counter-based sampling keys
        (fold_in(key(seed), n_committed)) matching the host sampler.

        Returns (committed [N, k] with -1 padding, pending_out [N],
        n_committed [N], finished [N])."""
        n = len(tokens)
        bucket = 1 << max(n - 1, 0).bit_length()
        e = max([len(x) for x in eos_lists] + [1])
        key = ("decode_multi", bucket, k, e)
        if key not in self._fns:
            self._fns[key] = self._build_decode_multi(bucket, k)
        bt = np.zeros((bucket, self.max_blocks_per_seq), np.int32)
        toks = np.zeros((bucket,), np.int32)
        pos = np.zeros((bucket,), np.int32)
        bud = np.zeros((bucket,), np.int32)  # pad rows: budget 0 => finished
        eos = np.full((bucket, e), -1, np.int32)
        tmp = np.zeros((bucket,), np.float32)
        sds = np.zeros((bucket,), np.uint32)
        cnt = np.zeros((bucket,), np.int32)
        toks[:n] = tokens
        pos[:n] = positions
        bud[:n] = budgets
        tmp[:n] = temps
        if seeds is not None:
            sds[:n] = seeds
        if counts is not None:
            cnt[:n] = counts
        for i, table in enumerate(block_tables):
            bt[i, : len(table)] = table
            for j, t in enumerate(eos_lists[i]):
                eos[i, j] = t
        self.cache, (out, pending, commits, finished, _) = self._fns[key](
            self.model.params if params is None else params, self.cache,
            jnp.asarray(toks), jnp.asarray(bt), jnp.asarray(pos),
            jnp.asarray(bud), jnp.asarray(eos), jnp.asarray(tmp),
            jnp.asarray(sds), jnp.asarray(cnt))
        return (np.asarray(out)[:n], np.asarray(pending)[:n],
                np.asarray(commits)[:n], np.asarray(finished)[:n])

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
        slot each token goes to). Returns logits [N, V].

        N is padded up to a power-of-two bucket so a varying live batch
        (admission ramp-up, finished-request tail) replays a handful of
        compiled programs instead of compiling one per distinct N — the
        reference's CUDA-graph-per-bucket discipline (continuous_batching/
        model_runner per-batch graphs). Pad rows write to the null block
        (block 0) and read ctx_len=1 there; decode at 8B geometry is
        weight-stream-bound, so the padding rows are free."""
        n = len(tokens)
        bucket = 1 << max(n - 1, 0).bit_length()  # next pow2 >= n
        key = ("decode", bucket)
        if key not in self._fns:
            self._fns[key] = self._build_decode(bucket)
        bs = self.cache.block_size
        bt = np.zeros((bucket, self.max_blocks_per_seq), np.int32)
        slots = np.zeros((bucket, 1), np.int32)
        toks = np.zeros((bucket,), np.int32)
        toks[:n] = tokens
        pos = np.zeros((bucket,), np.int32)
        pos[:n] = positions
        for i, table in enumerate(block_tables):
            bt[i, : len(table)] = table
            p = int(positions[i])
            slots[i, 0] = table[p // bs] * bs + p % bs if table else 0
        ctx_lens = (pos + 1).astype(np.int32)
        self.cache, (logits, greedy) = self._fns[key](
            self.model.params if params is None else params, self.cache,
            jnp.asarray(toks[:, None], jnp.int32), jnp.asarray(bt), jnp.asarray(slots),
            jnp.asarray(pos), jnp.asarray(ctx_lens))
        return logits[:n], greedy[:n]
