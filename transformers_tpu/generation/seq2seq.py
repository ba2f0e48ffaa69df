"""Shared encoder-decoder generation (reference generation/utils.py seq2seq
paths of ``generate``). One jitted program: encode -> precompute cross K/V ->
``lax.while_loop`` greedy/sampling decode.

Model contract:
- ``encode(params, **encoder_inputs) -> BaseModelOutput``
- ``precompute_cross_kv(params, encoder_hidden, encoder_mask)``
- ``decode_step(params, input_ids, cross_kv, cache, cache_position,
  decoder_mask, encoder_mask) -> hidden``
- ``compute_logits(params, hidden)``; ``init_decoder_cache(b, n)``
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .configuration_utils import GenerationConfig


class EncoderDecoderGenerationMixin:
    # name of the encoder tensor input ("input_ids" / "input_features")
    encoder_input_name = "input_ids"

    def generate(
        self,
        params=None,
        generation_config: Optional[GenerationConfig] = None,
        prng_key=None,
        decoder_input_ids=None,
        attention_mask=None,
        **kwargs,
    ):
        params = params if params is not None else self.params
        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        enc_input = kwargs.pop(self.encoder_input_name, None)
        gen.update(**kwargs)
        enc_input = jnp.asarray(enc_input)
        b = enc_input.shape[0]
        if attention_mask is None and self.encoder_input_name == "input_ids":
            pad = getattr(self.config, "pad_token_id", None)
            if pad is not None:
                attention_mask = (enc_input != pad).astype(jnp.int32)
        start_id = gen.decoder_start_token_id
        if start_id is None:
            start_id = self.config.decoder_start_token_id
        if start_id is None:
            start_id = self.config.bos_token_id
        eos = gen.eos_token_id if gen.eos_token_id is not None else self.config.eos_token_id
        eos_ids = tuple(eos) if isinstance(eos, (list, tuple)) else ((int(eos),) if eos is not None else ())
        pad_id = int(gen.pad_token_id if gen.pad_token_id is not None
                     else (self.config.pad_token_id if self.config.pad_token_id is not None
                           else (eos_ids[0] if eos_ids else 0)))
        max_new = int(gen.max_new_tokens or max(int(gen.max_length) - 1, 1))

        prompt = [int(start_id)]
        if gen.forced_bos_token_id is not None:
            prompt.append(int(gen.forced_bos_token_id))
        if decoder_input_ids is not None:
            prompt = [int(t) for t in jnp.asarray(decoder_input_ids).reshape(-1)]
        prompt_len = len(prompt)
        total_len = prompt_len + max_new

        do_sample = bool(gen.do_sample)
        temperature = float(gen.temperature or 1.0)
        if prng_key is None:
            prng_key = jax.random.key(0)
        has_enc_mask = attention_mask is not None

        forced_eos = gen.forced_eos_token_id
        forced_eos = int(forced_eos) if forced_eos is not None else None

        sig = (b, prompt_len, max_new, do_sample, eos_ids, pad_id, temperature, has_enc_mask,
               forced_eos)
        store = getattr(self, "_s2s_gen_cache", None) or {}
        self._s2s_gen_cache = store
        if sig not in store:
            store[sig] = self._build_s2s_fn(prompt_len=prompt_len, max_new=max_new,
                                            total_len=total_len, do_sample=do_sample,
                                            eos_ids=eos_ids, pad_id=pad_id,
                                            temperature=temperature, forced_eos=forced_eos)
        prompt_ids = jnp.broadcast_to(jnp.asarray(prompt, jnp.int32)[None, :], (b, prompt_len))
        return store[sig](params, enc_input, attention_mask, prompt_ids, prng_key)

    def _build_s2s_fn(self, *, prompt_len, max_new, total_len, do_sample, eos_ids, pad_id,
                      temperature, forced_eos=None):
        model = self

        def is_eos(tok):
            done = jnp.zeros(tok.shape, bool)
            for e in eos_ids:
                done |= tok == e
            return done

        def sample(logits, key, pos):
            logits = logits.astype(jnp.float32)
            if do_sample:
                tok = jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if forced_eos is not None:
                # ForcedEOSTokenLogitsProcessor: the token at max_length - 1
                # is always eos (reference logits_process.py).
                tok = jnp.where(jnp.asarray(pos) == total_len - 1,
                                jnp.asarray(forced_eos, jnp.int32), tok)
            return tok

        def fn(params, enc_input, enc_mask, prompt_ids, key):
            b = enc_input.shape[0]
            enc = model.encode(params, enc_input, attention_mask=enc_mask)
            cross_kv = model.precompute_cross_kv(params, enc.last_hidden_state)
            cache = model.init_decoder_cache(b, total_len)
            ids = jnp.full((b, total_len), pad_id, jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, prompt_ids, (0, 0))
            mask = jnp.zeros((b, total_len), jnp.int32).at[:, :prompt_len].set(1)

            hidden, cache = model.decode_step(params, prompt_ids, cross_kv, cache, 0, mask, enc_mask)
            key, k0 = jax.random.split(key)
            next_tok = sample(model.compute_logits(params, hidden[:, -1]), k0, prompt_len)
            finished = is_eos(next_tok)

            def cond(carry):
                ids, mask, cache, g, key, tok, fin = carry
                return (g < max_new) & ~jnp.all(fin)

            def body(carry):
                ids, mask, cache, g, key, tok, fin = carry
                slot = prompt_len + g - 1
                ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, slot))
                mask = jax.lax.dynamic_update_slice(mask, jnp.ones((b, 1), jnp.int32), (0, slot))
                hidden, cache = model.decode_step(params, tok[:, None], cross_kv, cache, slot, mask, enc_mask)
                key, k = jax.random.split(key)
                sampled = sample(model.compute_logits(params, hidden[:, -1]), k, prompt_len + g)
                new_tok = jnp.where(fin, jnp.asarray(pad_id, jnp.int32), sampled)
                fin = fin | is_eos(sampled)
                return (ids, mask, cache, g + 1, key, new_tok, fin)

            carry = (ids, mask, cache, jnp.asarray(1, jnp.int32), key, next_tok, finished)
            ids, mask, cache, g, key, tok, fin = jax.lax.while_loop(cond, body, carry)
            ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, prompt_len + g - 1))
            return ids

        return jax.jit(fn)
