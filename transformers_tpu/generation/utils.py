"""Generation engine: jitted static-shape prefill + ``lax.while_loop`` decode.

TPU-native analog of reference src/transformers/generation/utils.py
(``GenerationMixin.generate`` :2250, ``_sample`` :2772 with ``_prefill`` :3893
and the decode loop :2864-2930). Differences dictated by XLA (SURVEY §7):

- **Static shapes**: prompts are left-padded to a bucket length; the whole
  generate (prefill + decode loop + sampling + stopping) compiles into ONE
  XLA program per (batch, bucket, total) signature, cached on the model.
- **Decode loop on device**: ``lax.while_loop`` with early exit when every
  sequence hit EOS — no host round-trip per token (the reference pays one
  Python iteration per token).
- Logits processors and stopping criteria are pure jittable functions
  (see logits_process.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging
from .configuration_utils import GenerationConfig
from .logits_process import (
    LogitsProcessorList,
    MinNewTokensLengthLogitsProcessor,
    MinPLogitsWarper,
    NoRepeatNGramLogitsProcessor,
    RepetitionPenaltyLogitsProcessor,
    SuppressTokensAtBeginLogitsProcessor,
    SuppressTokensLogitsProcessor,
    TemperatureLogitsWarper,
    TopKLogitsWarper,
    TopPLogitsWarper,
)

logger = logging.get_logger(__name__)


def _as_tuple(x) -> tuple:
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(int(v) for v in x)
    return (int(x),)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class GenerationMixin:
    """Mixin for causal decoders. Requires the host class to provide
    ``__call__(params, input_ids, attention_mask, position_ids,
    past_key_values, cache_position, logits_to_keep)`` and ``init_cache``."""

    def _get_logits_processors(self, gen: GenerationConfig, eos_ids: tuple[int, ...],
                               max_new_tokens: int) -> LogitsProcessorList:
        """reference generation/utils.py:2641 ``_get_logits_processor``"""
        procs = LogitsProcessorList()
        if gen.repetition_penalty is not None and gen.repetition_penalty != 1.0:
            procs.append(RepetitionPenaltyLogitsProcessor(gen.repetition_penalty))
        if gen.no_repeat_ngram_size and gen.no_repeat_ngram_size > 0:
            procs.append(NoRepeatNGramLogitsProcessor(gen.no_repeat_ngram_size))
        if gen.min_new_tokens and eos_ids:
            procs.append(MinNewTokensLengthLogitsProcessor(gen.min_new_tokens, eos_ids))
        if gen.suppress_tokens:
            procs.append(SuppressTokensLogitsProcessor(gen.suppress_tokens))
        if gen.begin_suppress_tokens:
            procs.append(SuppressTokensAtBeginLogitsProcessor(gen.begin_suppress_tokens))
        if gen.do_sample:
            if gen.temperature is not None and gen.temperature != 1.0:
                procs.append(TemperatureLogitsWarper(gen.temperature))
            if gen.top_k is not None and gen.top_k > 0:
                procs.append(TopKLogitsWarper(gen.top_k))
            if gen.top_p is not None and gen.top_p < 1.0:
                procs.append(TopPLogitsWarper(gen.top_p))
            if gen.min_p is not None:
                procs.append(MinPLogitsWarper(gen.min_p))
        return procs

    def generate(
        self,
        params: Optional[dict] = None,
        input_ids: Optional[Any] = None,
        attention_mask: Optional[Any] = None,
        generation_config: Optional[GenerationConfig] = None,
        prng_key: Optional[jax.Array] = None,
        cache_dtype=None,
        **kwargs,
    ):
        """Reference generation/utils.py:2250. Returns [B, S_bucket + max_new]
        token ids (left-padded prompt + generated, pad after EOS)."""
        params = params if params is not None else self.params
        if params is None:
            raise ValueError("No params: pass `params=` or load via from_pretrained().")

        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        prefill_names = getattr(self, "_prefill_input_names", ())
        kwargs_model = {k: kwargs.pop(k) for k in list(kwargs) if k in prefill_names}
        unused = gen.update(**kwargs)
        if unused:
            logger.warning(f"generate() ignoring unknown kwargs: {sorted(unused)}")
        kwargs = kwargs_model

        input_ids = jnp.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None, :]
        b, s_in = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s_in), jnp.int32)
        else:
            attention_mask = jnp.asarray(attention_mask, jnp.int32)

        eos_ids = _as_tuple(gen.eos_token_id if gen.eos_token_id is not None
                            else getattr(self.config, "eos_token_id", None))
        pad_id = gen.pad_token_id
        if pad_id is None:
            pad_id = getattr(self.config, "pad_token_id", None)
        if pad_id is None:
            pad_id = eos_ids[0] if eos_ids else 0
        pad_id = int(pad_id)

        if gen.max_new_tokens is not None:
            max_new = int(gen.max_new_tokens)
        else:
            max_new = max(int(gen.max_length) - s_in, 1)

        # Static-shape bucketing: left-pad prompts to a multiple.
        bucket = pad_to_multiple(max(s_in, 1), gen.prompt_pad_multiple)
        pad_amt = bucket - s_in
        if pad_amt:
            input_ids = jnp.pad(input_ids, ((0, 0), (pad_amt, 0)), constant_values=pad_id)
            attention_mask = jnp.pad(attention_mask, ((0, 0), (pad_amt, 0)), constant_values=0)
        total_len = bucket + max_new

        do_sample = bool(gen.do_sample)
        if do_sample and prng_key is None:
            prng_key = jax.random.key(np.random.randint(0, 2**31 - 1))
        if prng_key is None:
            prng_key = jax.random.key(0)

        processors = self._get_logits_processors(gen, eos_ids, max_new)
        proc_sig = tuple(repr(vars(p)) + type(p).__name__ for p in processors)
        cache_dtype = cache_dtype or self.dtype

        # Extra model inputs consumed only by the prefill forward (multimodal:
        # pixel_values etc. — reference passes them on the first generate step
        # only, generation/utils.py prepare_inputs_for_generation).
        prefill_kwargs = {k: jnp.asarray(v) for k, v in kwargs.items()
                          if k in getattr(self, "_prefill_input_names", ())}

        sig = (b, bucket, total_len, max_new, do_sample, eos_ids, pad_id, proc_sig,
               str(jnp.dtype(cache_dtype)), tuple(sorted(prefill_kwargs)))
        cache_store = getattr(self, "_generate_fn_cache", None)
        if cache_store is None:
            cache_store = {}
            self._generate_fn_cache = cache_store
        if sig not in cache_store:
            cache_store[sig] = self._build_generate_fn(
                bucket=bucket, total_len=total_len, max_new=max_new, do_sample=do_sample,
                eos_ids=eos_ids, pad_id=pad_id, processors=processors, cache_dtype=cache_dtype,
                prefill_input_names=tuple(sorted(prefill_kwargs)),
            )
        fn = cache_store[sig]
        return fn(params, input_ids, attention_mask, prng_key,
                  *[prefill_kwargs[k] for k in sorted(prefill_kwargs)])

    def _build_generate_fn(self, *, bucket: int, total_len: int, max_new: int, do_sample: bool,
                           eos_ids: tuple[int, ...], pad_id: int, processors: LogitsProcessorList,
                           cache_dtype, prefill_input_names: tuple[str, ...] = ()):
        model = self

        def is_eos(tok):  # [B]
            done = jnp.zeros(tok.shape, bool)
            for e in eos_ids:
                done |= tok == e
            return done

        def sample_next(logits, state, key):  # logits [B, V]
            logits = logits.astype(jnp.float32)
            logits = processors(logits, state)
            if do_sample:
                return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def generate_fn(params, prompt_ids, prompt_mask, key, *prefill_extras):
            extra = dict(zip(prefill_input_names, prefill_extras))
            b = prompt_ids.shape[0]
            cache = model.init_cache(b, total_len, dtype=cache_dtype)

            ids = jnp.full((b, total_len), pad_id, jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, prompt_ids.astype(jnp.int32), (0, 0))
            mask = jnp.zeros((b, total_len), jnp.int32)
            mask = jax.lax.dynamic_update_slice(mask, prompt_mask.astype(jnp.int32), (0, 0))

            prompt_pos = jnp.maximum(jnp.cumsum(prompt_mask, axis=-1) - 1, 0)  # rope positions
            rope_last = prompt_pos[:, -1]  # [B] position of last prompt token

            # ---- prefill (reference _prefill, generation/utils.py:3893)
            out = model(
                params,
                input_ids=prompt_ids.astype(jnp.int32),
                attention_mask=mask,
                position_ids=prompt_pos,
                past_key_values=cache,
                cache_position=0,
                logits_to_keep=1,
                **extra,
            )
            cache = out.past_key_values
            key, k0 = jax.random.split(key)
            state0 = {"ids": ids, "mask": mask, "pos": jnp.asarray(bucket, jnp.int32),
                      "gen_count": jnp.asarray(0, jnp.int32)}
            next_tok = sample_next(out.logits[:, -1, :], state0, k0)
            finished = is_eos(next_tok)

            # ---- decode loop: carry = (ids, mask, cache, g, key, next_tok, finished)
            def cond(carry):
                ids, mask, cache, g, key, next_tok, finished = carry
                return (g < max_new) & ~jnp.all(finished)

            def body(carry):
                ids, mask, cache, g, key, next_tok, finished = carry
                slot = bucket + g - 1  # slot of pending token (g is 1-indexed count)
                ids = jax.lax.dynamic_update_slice(ids, next_tok[:, None], (0, slot))
                mask = jax.lax.dynamic_update_slice(
                    mask, jnp.ones((next_tok.shape[0], 1), jnp.int32), (0, slot))
                position_ids = (rope_last + g)[:, None]
                out = model(
                    params,
                    input_ids=next_tok[:, None],
                    attention_mask=mask,
                    position_ids=position_ids,
                    past_key_values=cache,
                    cache_position=slot,
                    logits_to_keep=1,
                )
                key, k = jax.random.split(key)
                state = {"ids": ids, "mask": mask, "pos": slot + 1, "gen_count": g}
                sampled = sample_next(out.logits[:, -1, :], state, k)
                new_tok = jnp.where(finished, jnp.asarray(pad_id, jnp.int32), sampled)
                finished = finished | is_eos(sampled)
                return (ids, mask, out.past_key_values, g + 1, key, new_tok, finished)

            g0 = jnp.asarray(1, jnp.int32)
            ids, mask, cache, g, key, next_tok, finished = jax.lax.while_loop(
                cond, body, (ids, mask, cache, g0, key, next_tok, finished))
            # write the final pending token
            slot = bucket + g - 1
            ids = jax.lax.dynamic_update_slice(ids, next_tok[:, None], (0, slot))
            return ids

        return jax.jit(generate_fn)
