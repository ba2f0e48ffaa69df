"""Assisted (speculative) decoding.

TPU-native analog of reference generation/candidate_generator.py (:39 base,
:80 AssistedCandidateGenerator) + utils.py:3551 ``_assisted_decoding``.

Static-shape design: the draft model proposes a FIXED gamma tokens with a
jitted per-step program; the target verifies all gamma+1 positions in ONE
jitted forward. Acceptance bookkeeping runs on host (data-dependent lengths),
but every device program has a fixed shape, so the whole loop replays two
compiled programs. Greedy assisted decoding reproduces the target's greedy
output token-for-token (the speculative-decoding guarantee).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


class AssistedDecoder:
    """Greedy speculative decoding for a (target, draft) pair sharing a
    tokenizer (reference AssistedCandidateGenerator)."""

    def __init__(self, model, assistant_model, *, num_assistant_tokens: int = 5,
                 max_len: int = 512, cache_dtype=None):
        self.model = model
        self.draft = assistant_model
        self.gamma = int(num_assistant_tokens)
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        self._fns: dict = {}

    # ------------------------------------------------------------- programs
    def _prefill_fn(self, which, model, prompt_len):
        key = ("prefill", which, prompt_len)
        if key not in self._fns:
            def fn(params, ids, mask):
                cache = model.init_cache(ids.shape[0], self.max_len,
                                         dtype=self.cache_dtype or model.dtype)
                out = model(params, input_ids=ids, attention_mask=mask,
                            position_ids=None, past_key_values=cache,
                            cache_position=0, logits_to_keep=1)
                return out.past_key_values, out.logits[:, -1, :]

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _step_fn(self, which, model, width):
        """Forward `width` tokens starting at a given slot; returns all logits."""
        key = ("step", which, width)
        if key not in self._fns:
            def fn(params, tokens, mask, cache, start):
                positions = start + jnp.arange(width, dtype=jnp.int32)[None, :]
                out = model(params, input_ids=tokens, attention_mask=mask,
                            position_ids=positions, past_key_values=cache,
                            cache_position=start, logits_to_keep=0)
                return out.past_key_values, out.logits

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    # --------------------------------------------------------------- decode
    def generate(self, params=None, draft_params=None, input_ids=None,
                 max_new_tokens: int = 32, eos_token_id=None) -> np.ndarray:
        """Batch size 1 (reference restricts assisted decoding to bs=1)."""
        params = params if params is not None else self.model.params
        draft_params = draft_params if draft_params is not None else self.draft.params
        ids = np.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None]
        if ids.shape[0] != 1:
            raise ValueError("assisted decoding supports batch size 1 (reference parity)")
        prompt_len = ids.shape[1]
        eos = eos_token_id if eos_token_id is not None else getattr(self.model.config, "eos_token_id", None)
        eos_ids = set(eos if isinstance(eos, (list, tuple)) else ([eos] if eos is not None else []))

        buf = np.zeros((1, self.max_len), np.int32)
        buf[0, :prompt_len] = ids[0]
        mask = np.zeros((1, self.max_len), np.int32)
        mask[0, :prompt_len] = 1

        tgt_prefill = self._prefill_fn("tgt", self.model, prompt_len)
        drf_prefill = self._prefill_fn("drf", self.draft, prompt_len)
        tgt_cache, tgt_logits = tgt_prefill(params, jnp.asarray(buf[:, :prompt_len]), jnp.asarray(mask))
        drf_cache, drf_logits = drf_prefill(draft_params, jnp.asarray(buf[:, :prompt_len]), jnp.asarray(mask))

        n_gen = 0
        cur = prompt_len  # next empty slot
        next_token = int(np.argmax(np.asarray(tgt_logits)[0]))
        # the draft's own next proposal comes from ITS logits; keep it synced
        # by feeding it the accepted tokens below
        generated = [next_token]
        n_gen = 1
        drf_step1 = self._step_fn("drf", self.draft, 1)
        verify_w = self.gamma + 1
        tgt_verify = self._step_fn("tgt", self.model, verify_w)
        drf_catchup = self._step_fn("drf", self.draft, verify_w)

        while n_gen < max_new_tokens and next_token not in eos_ids and cur + verify_w < self.max_len:
            # ---- draft proposes gamma tokens after `next_token`
            proposals = []
            tok = next_token
            dmask = mask.copy()
            dcache = drf_cache
            for g in range(self.gamma):
                dmask[0, cur + g] = 1
                dcache, dlogits = drf_step1(draft_params, jnp.asarray([[tok]]),
                                            jnp.asarray(dmask), dcache,
                                            jnp.asarray(cur + g, jnp.int32))
                tok = int(np.argmax(np.asarray(dlogits)[0, -1]))
                proposals.append(tok)

            # ---- target verifies [next_token, proposals...] in one forward
            window = np.asarray([[next_token] + proposals], np.int32)
            vmask = mask.copy()
            vmask[0, cur : cur + verify_w] = 1
            tgt_cache, vlogits = tgt_verify(params, jnp.asarray(window), jnp.asarray(vmask),
                                            tgt_cache, jnp.asarray(cur, jnp.int32))
            greedy = np.argmax(np.asarray(vlogits)[0], axis=-1)  # [gamma+1]

            # accept longest prefix of proposals matching the target's greedy
            n_accept = 0
            for g in range(self.gamma):
                if proposals[g] == int(greedy[g]):
                    n_accept += 1
                else:
                    break
            # tokens actually committed this round: next_token + accepted
            buf[0, cur : cur + 1 + n_accept] = [next_token] + proposals[:n_accept]
            mask[0, cur : cur + 1 + n_accept] = 1
            cur += 1 + n_accept
            next_token = int(greedy[n_accept])

            # keep the draft cache in sync: rerun the committed window so its
            # KV covers slots [cur - (1+n_accept), cur)
            cmask = mask.copy()
            cmask[0, cur - (1 + n_accept) : cur - (1 + n_accept) + verify_w] = 1
            drf_cache, _ = drf_catchup(draft_params, jnp.asarray(window), jnp.asarray(cmask),
                                       drf_cache, jnp.asarray(cur - (1 + n_accept), jnp.int32))
            # fix mask (catch-up may have marked beyond cur)
            cmask = None

            for t in [next_token]:
                generated.append(t)
            n_gen += 1 + n_accept
            if any(p in eos_ids for p in proposals[:n_accept]):
                break

        # assemble output: prompt + committed + pending next_token
        out = list(ids[0]) + list(buf[0, prompt_len:cur]) + [next_token]
        return np.asarray([out[: prompt_len + max_new_tokens]], np.int32)


def assisted_generate(model, assistant_model, input_ids, *, params=None, draft_params=None,
                      max_new_tokens: int = 32, num_assistant_tokens: int = 5,
                      eos_token_id=None, max_len: int = 512) -> np.ndarray:
    """Functional entry (reference generate(assistant_model=...) route)."""
    decoder = AssistedDecoder(model, assistant_model,
                              num_assistant_tokens=num_assistant_tokens, max_len=max_len)
    return decoder.generate(params=params, draft_params=draft_params, input_ids=input_ids,
                            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id)
