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

    def generate_batch(self, inputs, **kwargs):
        """Continuous-batching batch generation (reference
        continuous_api.py:1202 ContinuousMixin.generate_batch)."""
        from .continuous_batching import ContinuousMixin

        return ContinuousMixin.generate_batch(self, inputs, **kwargs)

    def init_continuous_batching(self, **kwargs):
        from .continuous_batching import ContinuousMixin

        return ContinuousMixin.init_continuous_batching(self, **kwargs)

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
        streamer=None,
        stopping_criteria=None,
        stop_strings=None,
        tokenizer=None,
        assistant_model=None,
        assistant_params=None,
        prompt_lookup_num_tokens: Optional[int] = None,
        num_assistant_tokens: int = 5,
        aot=None,
        **kwargs,
    ):
        """Reference generation/utils.py:2250. Returns [B, S_bucket + max_new]
        token ids (left-padded prompt + generated, pad after EOS).

        ``aot``: instead of executing, AOT-compile the full generate program
        and return ``(compiled_executable, param_formats)``. With
        ``aot="auto"`` the compiler chooses the parameter layouts it wants
        (``Layout.AUTO``); with ``aot=<formats pytree>`` the entry layouts are
        pinned to the given ``jax.experimental.layout.Format`` tree. Params
        materialized in the returned formats make the program entry copy-free
        by construction — at Llama-3-8B scale a layout mismatch costs ~32 MB
        of program-lifetime HLO-temp copy per mismatched [4096,4096] weight,
        enough to tip the 14.96 GiB tree into compile-OOM. ``params`` may be
        a ``ShapeDtypeStruct`` pytree in this mode. The executable has the
        same calling convention as the cached generate fn:
        ``compiled(params, input_ids, attention_mask, key, max_new_rt)``."""
        params = params if params is not None else self.params
        if params is None:
            raise ValueError("No params: pass `params=` or load via from_pretrained().")

        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        prefill_names = getattr(self, "_prefill_input_names", ())
        static_names = getattr(self, "_static_prefill_input_names", ())
        kwargs_model = {k: kwargs.pop(k) for k in list(kwargs) if k in prefill_names}
        static_model = {k: np.asarray(kwargs.pop(k)) for k in list(kwargs) if k in static_names}
        unused = gen.update(**kwargs)
        if unused:
            logger.warning(f"generate() ignoring unknown kwargs: {sorted(unused)}")
        gen.validate()  # reference generation/configuration_utils.py:644
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
        # Decode-length bucketing: compile at a padded cap, run the actual
        # max_new as a device-scalar while_loop bound (program reuse across
        # max_new_tokens values within one cap bucket).
        max_new_cap = (pad_to_multiple(max_new, gen.decode_pad_multiple)
                       if gen.decode_pad_multiple else max_new)
        total_len = bucket + max_new_cap

        do_sample = bool(gen.do_sample)
        if do_sample and prng_key is None:
            prng_key = jax.random.key(np.random.randint(0, 2**31 - 1))
        if prng_key is None:
            prng_key = jax.random.key(0)

        # ---- assisted / speculative route (reference _assisted_decoding,
        # generation/utils.py:3551; mode selection :2463 assisted_generation)
        if assistant_model is not None or prompt_lookup_num_tokens is not None:
            from .candidate_generator import assisted_generate

            if b != 1:
                raise ValueError("assisted decoding supports batch size 1 (reference parity)")
            # strip the bucket padding: the host loop runs on the raw prompt
            ids_np = np.asarray(input_ids)[0]
            mask_np = np.asarray(attention_mask)[0]
            raw = ids_np[mask_np.astype(bool)][None, :]
            max_len_spec = pad_to_multiple(raw.shape[1] + max_new + num_assistant_tokens + 2, 64)
            seed = int(jax.random.key_data(prng_key).sum()) & 0x7FFFFFFF
            return jnp.asarray(assisted_generate(
                self, assistant_model, raw, params=params,
                draft_params=assistant_params, max_new_tokens=max_new,
                num_assistant_tokens=num_assistant_tokens,
                eos_token_id=list(eos_ids) if eos_ids else None,
                max_len=max_len_spec, do_sample=do_sample,
                temperature=float(gen.temperature or 1.0), seed=seed,
                prompt_lookup_num_tokens=prompt_lookup_num_tokens))

        # ---- streaming / host-criteria route: jitted per-step host loop
        if streamer is not None or stopping_criteria is not None or stop_strings is not None:
            return self._generate_streaming(
                params, input_ids, attention_mask, max_new=max_new, do_sample=do_sample,
                eos_ids=eos_ids, pad_id=pad_id, bucket=bucket, total_len=total_len,
                processors=self._get_logits_processors(gen, eos_ids, max_new),
                prng_key=prng_key, streamer=streamer, stopping_criteria=stopping_criteria,
                stop_strings=stop_strings, tokenizer=tokenizer,
                cache_dtype=cache_dtype or self.dtype, prefill_kwargs=kwargs)

        # ---- beam search route (reference generate mode dispatch :2463)
        if gen.num_beams and gen.num_beams > 1:
            from .beam_search import build_beam_search_fn

            sig = ("beam", b, bucket, total_len, max_new, gen.num_beams, eos_ids, pad_id,
                   float(gen.length_penalty), str(gen.early_stopping),
                   int(gen.num_return_sequences), str(jnp.dtype(cache_dtype or self.dtype)))
            store = getattr(self, "_generate_fn_cache", None) or {}
            self._generate_fn_cache = store
            if sig not in store:
                store[sig] = build_beam_search_fn(
                    self, bucket=bucket, total_len=total_len, max_new=max_new,
                    num_beams=int(gen.num_beams), eos_ids=eos_ids, pad_id=pad_id,
                    length_penalty=float(gen.length_penalty),
                    early_stopping=gen.early_stopping,
                    cache_dtype=cache_dtype or self.dtype,
                    num_return_sequences=int(gen.num_return_sequences),
                )
            seqs, scores = store[sig](params, input_ids, attention_mask)
            # [B, R, L] -> [B*R, L] (reference returns flattened sequences)
            return seqs.reshape(-1, seqs.shape[-1])

        processors = self._get_logits_processors(gen, eos_ids, max_new)
        proc_sig = tuple(repr(vars(p)) + type(p).__name__ for p in processors)
        cache_dtype = cache_dtype or self.dtype

        # Extra model inputs consumed only by the prefill forward (multimodal:
        # pixel_values etc. — reference passes them on the first generate step
        # only, generation/utils.py prepare_inputs_for_generation).
        prefill_kwargs = {k: jnp.asarray(v) for k, v in kwargs.items()
                          if k in getattr(self, "_prefill_input_names", ())}

        # model-specific prompt positions (M-RoPE etc.): (prompt_pos, rope_last)
        custom_pos = self._prepare_generation_positions(
            np.asarray(input_ids), np.asarray(attention_mask), **static_model, **kwargs)

        cache_impl = gen.cache_implementation or "static"
        static_sig = tuple((k, static_model[k].tobytes()) for k in sorted(static_model))
        sig = (b, bucket, total_len, max_new_cap, do_sample, eos_ids, pad_id, proc_sig,
               str(jnp.dtype(cache_dtype)), tuple(sorted(prefill_kwargs)),
               custom_pos is not None, static_sig, cache_impl)
        cache_store = getattr(self, "_generate_fn_cache", None)
        if cache_store is None:
            cache_store = {}
            self._generate_fn_cache = cache_store
        if sig not in cache_store:
            cache_store[sig] = self._build_generate_fn(
                bucket=bucket, total_len=total_len, max_new=max_new_cap, do_sample=do_sample,
                eos_ids=eos_ids, pad_id=pad_id, processors=processors, cache_dtype=cache_dtype,
                prefill_input_names=tuple(sorted(prefill_kwargs)),
                static_prefill_kwargs=static_model,
                custom_positions=custom_pos is not None,
                cache_implementation=cache_impl,
            )
        fn = cache_store[sig]
        extras = [prefill_kwargs[k] for k in sorted(prefill_kwargs)]
        if custom_pos is not None:
            extras += [custom_pos[0], custom_pos[1]]
        if aot is not None:
            from jax.experimental.layout import Format, Layout

            spec = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
            if isinstance(aot, str) and aot == "auto":
                in_fmt = jax.tree.map(lambda s: Format(Layout.AUTO), spec)
            else:
                in_fmt = aot
            jitted = jax.jit(fn.__wrapped__,
                             in_shardings=(in_fmt,) + (None,) * (4 + len(extras)))
            compiled = jitted.lower(
                spec, input_ids, attention_mask, prng_key,
                jnp.asarray(max_new, jnp.int32), *extras).compile()
            return compiled, compiled.input_formats[0][0]
        out = fn(params, input_ids, attention_mask, prng_key,
                 jnp.asarray(max_new, jnp.int32), *extras)
        if max_new_cap != max_new:
            out = out[:, : bucket + max_new]
        return out

    def _prepare_generation_positions(self, input_ids, attention_mask, **model_kwargs):
        """Hook: return (prompt_position_ids, rope_last [B]) for models whose
        rope positions differ from cumsum(mask) (M-RoPE). Default: None."""
        return None

    def _generate_streaming(self, params, input_ids, attention_mask, *, max_new, do_sample,
                            eos_ids, pad_id, bucket, total_len, processors, prng_key,
                            streamer, stopping_criteria, stop_strings, tokenizer,
                            cache_dtype, prefill_kwargs):
        """Host decode loop with jitted prefill/step (the reference's
        per-token Python loop, generation/utils.py:2864) — used when a
        streamer or host-side stopping criterion needs to see every token."""
        from .stopping_criteria import StoppingCriteriaList, StopStringCriteria

        model = self
        criteria = StoppingCriteriaList(stopping_criteria or [])
        if stop_strings is not None:
            if tokenizer is None:
                raise ValueError("stop_strings requires `tokenizer=` (reference parity)")
            criteria.append(StopStringCriteria(tokenizer, stop_strings))

        b = input_ids.shape[0]
        extra_names = tuple(sorted(prefill_kwargs))
        sig = ("stream", b, bucket, total_len, str(jnp.dtype(cache_dtype)), extra_names)
        store = getattr(self, "_generate_fn_cache", None) or {}
        self._generate_fn_cache = store
        if sig not in store:
            def prefill(params, prompt_ids, mask_full, prompt_pos, *extras):
                cache = model.init_cache(prompt_ids.shape[0], total_len, dtype=cache_dtype)
                out = model(params, input_ids=prompt_ids, attention_mask=mask_full,
                            position_ids=prompt_pos, past_key_values=cache, cache_position=0,
                            logits_to_keep=1, **dict(zip(extra_names, extras)))
                return out.past_key_values, out.logits[:, -1, :]

            def step(params, tok, mask_full, position_ids, cache, cache_position):
                out = model(params, input_ids=tok, attention_mask=mask_full,
                            position_ids=position_ids, past_key_values=cache,
                            cache_position=cache_position, logits_to_keep=1)
                return out.past_key_values, out.logits[:, -1, :]

            store[sig] = (jax.jit(prefill), jax.jit(step, static_argnames=()))
        prefill_fn, step_fn = store[sig]

        ids = np.full((b, total_len), pad_id, np.int32)
        ids[:, :bucket] = np.asarray(input_ids)
        mask = np.zeros((b, total_len), np.int32)
        mask[:, :bucket] = np.asarray(attention_mask)
        prompt_pos = jnp.maximum(jnp.cumsum(jnp.asarray(mask[:, :bucket]), axis=-1) - 1, 0)
        rope_last = np.asarray(prompt_pos[:, -1])

        if streamer is not None:
            streamer.put(np.asarray(input_ids))

        cache, logits = prefill_fn(params, jnp.asarray(ids[:, :bucket]), jnp.asarray(mask),
                                   prompt_pos, *[jnp.asarray(prefill_kwargs[k]) for k in extra_names])
        finished = np.zeros((b,), bool)
        key = prng_key
        for g in range(1, max_new + 1):
            state = {"ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
                     "pos": jnp.asarray(bucket + g - 1, jnp.int32),
                     "gen_count": jnp.asarray(g - 1, jnp.int32)}
            lg = processors(jnp.asarray(logits, jnp.float32), state)
            key, k = jax.random.split(key)
            if do_sample:
                tok = np.asarray(jax.random.categorical(k, lg, axis=-1), np.int32)
            else:
                tok = np.asarray(jnp.argmax(lg, axis=-1), np.int32)
            tok = np.where(finished, pad_id, tok)
            slot = bucket + g - 1
            ids[:, slot] = tok
            mask[:, slot] = (~finished).astype(np.int32)
            if streamer is not None:
                streamer.put(tok[:, None])
            for e in eos_ids:
                finished |= tok == e
            if criteria:
                finished |= np.asarray(criteria(ids[:, : slot + 1]))
            if finished.all() or g == max_new:
                break
            position_ids = jnp.asarray((rope_last + g)[:, None], jnp.int32)
            cache, logits = step_fn(params, jnp.asarray(tok[:, None]), jnp.asarray(mask),
                                    position_ids, cache, jnp.asarray(slot, jnp.int32))
        if streamer is not None:
            streamer.end()
        return jnp.asarray(ids[:, : slot + 1])

    def _build_generate_fn(self, *, bucket: int, total_len: int, max_new: int, do_sample: bool,
                           eos_ids: tuple[int, ...], pad_id: int, processors: LogitsProcessorList,
                           cache_dtype, prefill_input_names: tuple[str, ...] = (),
                           static_prefill_kwargs: dict | None = None,
                           custom_positions: bool = False,
                           cache_implementation: str = "static"):
        model = self
        static_prefill_kwargs = static_prefill_kwargs or {}

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

        def generate_fn(params, prompt_ids, prompt_mask, key, max_new_rt, *prefill_extras):
            # max_new_rt: runtime decode-step bound (device scalar), <= the
            # static cap `max_new` the program was compiled at
            if custom_positions:
                *prefill_extras, custom_prompt_pos, custom_rope_last = prefill_extras
            extra = dict(zip(prefill_input_names, prefill_extras))
            extra.update(static_prefill_kwargs)
            b = prompt_ids.shape[0]
            cache = model.init_cache(b, total_len, dtype=cache_dtype,
                                     implementation=cache_implementation)

            ids = jnp.full((b, total_len), pad_id, jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, prompt_ids.astype(jnp.int32), (0, 0))
            mask = jnp.zeros((b, total_len), jnp.int32)
            mask = jax.lax.dynamic_update_slice(mask, prompt_mask.astype(jnp.int32), (0, 0))

            if custom_positions:
                prompt_pos = custom_prompt_pos
                rope_last = custom_rope_last
            else:
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
                return (g < jnp.minimum(max_new_rt, max_new)) & ~jnp.all(finished)

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
