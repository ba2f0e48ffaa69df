"""Vectorized beam search, fully on device.

TPU-native analog of reference generation/utils.py:3197 ``_beam_search``
(the v5 vectorized rewrite, no BeamScorer). The whole search — prefill,
per-step top-2K candidate selection, beam reordering (including the KV cache
via a batch-dim gather), finished-hypothesis tracking with length penalty,
and the early-stopping criterion — compiles into ONE XLA program with a
``lax.while_loop``.

Semantics matched to the reference's vectorized implementation:
- candidates = top 2*K of (running_scores + logprobs) over K*V
- only EOS candidates ranked within the top K finalize a hypothesis
- scores normalize by the number of GENERATED tokens (cur_len -
  decoder_prompt_len) ** length_penalty
- done (early_stopping=False): all K finished and worst finished >= best
  running normalized at the current length; (True): all K finished
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather_cache(cache, flat_beam_idx):
    """Reorder a StaticKVCache along its flattened [B*K] batch dim."""
    return jax.tree.map(lambda x: jnp.take(x, flat_beam_idx, axis=0), cache)


def build_beam_search_fn(
    model,
    *,
    bucket: int,
    total_len: int,
    max_new: int,
    num_beams: int,
    eos_ids: tuple[int, ...],
    pad_id: int,
    length_penalty: float = 1.0,
    early_stopping=False,
    cache_dtype=None,
    num_return_sequences: int = 1,
):
    """Compile a beam-search generate fn: (params, prompt_ids [B, bucket],
    prompt_mask) -> (sequences [B, R, total_len], scores [B, R])."""
    k = num_beams
    NEG = -1.0e9

    def is_eos(tok):
        done = jnp.zeros(tok.shape, bool)
        for e in eos_ids:
            done |= tok == e
        return done

    def fn(params, prompt_ids, prompt_mask):
        b = prompt_ids.shape[0]
        cache_bk = model.init_cache(b * k, total_len, dtype=cache_dtype or model.dtype)

        ids = jnp.full((b, k, total_len), pad_id, jnp.int32)
        ids = ids.at[:, :, :bucket].set(prompt_ids[:, None, :].astype(jnp.int32))
        mask = jnp.zeros((b, k, total_len), jnp.int32)
        mask = mask.at[:, :, :bucket].set(prompt_mask[:, None, :].astype(jnp.int32))

        prompt_pos = jnp.maximum(jnp.cumsum(prompt_mask, axis=-1) - 1, 0)
        rope_last = prompt_pos[:, -1]  # [B]

        out = model(
            params,
            input_ids=jnp.broadcast_to(prompt_ids[:, None, :], (b, k, bucket)).reshape(b * k, bucket).astype(jnp.int32),
            attention_mask=mask.reshape(b * k, total_len),
            position_ids=jnp.broadcast_to(prompt_pos[:, None, :], (b, k, bucket)).reshape(b * k, bucket),
            past_key_values=cache_bk,
            cache_position=0,
            logits_to_keep=1,
        )
        cache = out.past_key_values
        logprobs = jax.nn.log_softmax(out.logits[:, -1, :].astype(jnp.float32), axis=-1)
        logprobs = logprobs.reshape(b, k, -1)
        v = logprobs.shape[-1]

        running_scores = jnp.full((b, k), NEG, jnp.float32).at[:, 0].set(0.0)
        finished_seqs = jnp.full((b, k, total_len), pad_id, jnp.int32)
        finished_scores = jnp.full((b, k), NEG, jnp.float32)
        has_finished = jnp.zeros((b, k), bool)

        def done_fn(running_scores, finished_scores, has_finished, t):
            gen_len = jnp.maximum(t, 1).astype(jnp.float32)
            all_full = jnp.all(has_finished, axis=-1)
            if early_stopping is True or early_stopping == "always":
                return all_full
            best_running = jnp.max(running_scores, axis=-1) / (gen_len**length_penalty)
            worst_finished = jnp.min(jnp.where(has_finished, finished_scores, NEG), axis=-1)
            return all_full & (worst_finished >= best_running)

        def body(carry):
            (ids, mask, cache, running_scores, finished_seqs, finished_scores,
             has_finished, t, logprobs) = carry
            # ---- candidate selection for generated token index t (0-based)
            cand = running_scores[:, :, None] + logprobs  # [B, K, V]
            top_scores, top_idx = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
            beam_src = top_idx // v
            token = (top_idx % v).astype(jnp.int32)
            slot = bucket + t

            cand_ids = jnp.take_along_axis(ids, beam_src[..., None], axis=1)
            cand_ids = jax.lax.dynamic_update_slice_in_dim(cand_ids, token[..., None], slot, axis=2)
            cand_mask = jnp.take_along_axis(mask, beam_src[..., None], axis=1)
            cand_mask = jax.lax.dynamic_update_slice_in_dim(
                cand_mask, jnp.ones_like(token)[..., None], slot, axis=2)

            cand_is_eos = is_eos(token)
            rank_ok = jnp.arange(2 * k)[None, :] < k
            cand_finalizes = cand_is_eos & rank_ok

            # finished merge: normalize by generated count INCLUDING the eos
            gen_len = jnp.asarray(t + 1, jnp.float32)
            eos_scores = jnp.where(cand_finalizes, top_scores / (gen_len**length_penalty), NEG)
            all_f_scores = jnp.concatenate([finished_scores, eos_scores], axis=1)
            all_f_seqs = jnp.concatenate([finished_seqs, cand_ids], axis=1)
            all_f_flag = jnp.concatenate([has_finished, cand_finalizes], axis=1)
            finished_scores, f_idx = jax.lax.top_k(all_f_scores, k)
            finished_seqs = jnp.take_along_axis(all_f_seqs, f_idx[..., None], axis=1)
            has_finished = jnp.take_along_axis(all_f_flag, f_idx, axis=1)

            # running beams: top K non-EOS candidates
            run_cand = jnp.where(cand_is_eos, NEG, top_scores)
            running_scores, r_idx = jax.lax.top_k(run_cand, k)
            ids = jnp.take_along_axis(cand_ids, r_idx[..., None], axis=1)
            mask = jnp.take_along_axis(cand_mask, r_idx[..., None], axis=1)
            new_beam_src = jnp.take_along_axis(beam_src, r_idx, axis=1)
            new_token = jnp.take_along_axis(token, r_idx, axis=1)

            flat_idx = (jnp.arange(b)[:, None] * k + new_beam_src).reshape(-1)
            cache = gather_cache(cache, flat_idx)

            # ---- forward the chosen tokens (logits for token t+1)
            position_ids = jnp.broadcast_to((rope_last + t + 1)[:, None, None], (b, k, 1)).reshape(b * k, 1)
            out = model(
                params,
                input_ids=new_token.reshape(b * k, 1),
                attention_mask=mask.reshape(b * k, total_len),
                position_ids=position_ids,
                past_key_values=cache,
                cache_position=slot,
                logits_to_keep=1,
            )
            logprobs = jax.nn.log_softmax(out.logits[:, -1, :].astype(jnp.float32), axis=-1)
            logprobs = logprobs.reshape(b, k, v)
            return (ids, mask, out.past_key_values, running_scores, finished_seqs,
                    finished_scores, has_finished, t + 1, logprobs)

        def cond(carry):
            (ids, mask, cache, running_scores, finished_seqs, finished_scores,
             has_finished, t, logprobs) = carry
            return (t < max_new) & ~jnp.all(
                done_fn(running_scores, finished_scores, has_finished, t))

        carry = (ids, mask, cache, running_scores, finished_seqs, finished_scores,
                 has_finished, jnp.asarray(0, jnp.int32), logprobs)
        (ids, mask, cache, running_scores, finished_seqs, finished_scores,
         has_finished, t, logprobs) = jax.lax.while_loop(cond, body, carry)

        # Finalize: running beams are hypotheses at their final generated length
        # (reference finalize adds unfinished beams when none finished).
        gen_len = jnp.maximum(t, 1).astype(jnp.float32)
        run_final = running_scores / (gen_len**length_penalty)
        all_scores = jnp.concatenate([finished_scores, run_final], axis=1)
        all_seqs = jnp.concatenate([finished_seqs, ids], axis=1)
        valid = jnp.concatenate([has_finished, jnp.ones((b, k), bool)], axis=1)
        order_scores = jnp.where(valid, all_scores, 2 * NEG)
        top, idx = jax.lax.top_k(order_scores, num_return_sequences)
        seqs = jnp.take_along_axis(all_seqs, idx[..., None], axis=1)
        return seqs, top

    return jax.jit(fn)
