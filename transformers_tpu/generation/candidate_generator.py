"""Assisted (speculative) decoding.

TPU-native analog of reference generation/candidate_generator.py (:39 base,
:80 AssistedCandidateGenerator, :1013 PromptLookupCandidateGenerator) +
generation/utils.py:3551 ``_assisted_decoding`` and :3981
``_speculative_sampling``.

Static-shape design: drafts are proposed with fixed-width jitted programs
(one-token draft steps, a gamma+1-wide target verify), so the whole loop
replays a handful of compiled programs. Acceptance bookkeeping runs on the
host (data-dependent lengths), with both verification modes:

- greedy: longest prefix of drafts matching the target argmax — reproduces
  the target's greedy output token-for-token;
- sampling: the speculative-sampling rule (Leviathan et al.): accept draft
  x_i with prob min(1, p_i(x_i)/q_i(x_i)); on rejection resample from
  norm(max(0, p_i - q_i)). The output distribution equals sampling from the
  target directly.

Reachable through the public API: ``model.generate(assistant_model=...)``
and ``model.generate(prompt_lookup_num_tokens=...)`` route here
(generation/utils.py GenerationMixin.generate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class _CandidateGenerator:
    """Base contract (reference candidate_generator.py:39): propose up to
    ``gamma`` continuation tokens given the committed context."""

    def get_candidates(self, ctx_ids: list[int]) -> tuple[list[int], Optional[np.ndarray]]:
        """Returns (candidate tokens, per-candidate draft probs [n, V] or
        None when the proposal is deterministic given the context)."""
        raise NotImplementedError

    def observe(self, n_accepted: int, n_proposed: int):
        """Feedback hook (reference dynamic num_assistant_tokens schedule)."""


class PromptLookupCandidateGenerator(_CandidateGenerator):
    """N-gram prompt lookup (reference candidate_generator.py:1013): find the
    latest earlier occurrence of the current tail n-gram and propose its
    continuation. Deterministic — treated as a zero-probability-mass draft
    distribution concentrated on the proposed token."""

    def __init__(self, num_output_tokens: int = 10, max_matching_ngram_size: int = 2):
        self.num_output_tokens = num_output_tokens
        self.max_ngram = max_matching_ngram_size

    def get_candidates(self, ctx_ids):
        ids = np.asarray(ctx_ids)
        n = len(ids)
        for ngram in range(min(self.max_ngram, n - 1), 0, -1):
            tail = ids[n - ngram:]
            # windows over the context (excluding the tail itself)
            for start in range(n - ngram - 1, -1, -1):
                if np.array_equal(ids[start:start + ngram], tail):
                    cont = ids[start + ngram: start + ngram + self.num_output_tokens]
                    if len(cont):
                        return [int(t) for t in cont], None
        return [], None


class AssistedCandidateGenerator(_CandidateGenerator):
    """Draft-model proposals (reference candidate_generator.py:80). The
    draft shares the target's tokenizer; it runs its own static cache and is
    kept in sync with the committed context."""

    def __init__(self, draft_model, draft_params=None, *, num_assistant_tokens: int = 5,
                 max_len: int = 512, do_sample: bool = False, temperature: float = 1.0,
                 rng: Optional[np.random.Generator] = None):
        self.model = draft_model
        self.params = draft_params if draft_params is not None else draft_model.params
        self.gamma = int(num_assistant_tokens)
        self.max_len = max_len
        self.do_sample = do_sample
        self.temperature = temperature
        self.rng = rng or np.random.default_rng(0)
        self._fns: dict = {}
        self._cache = None
        self._committed = 0  # tokens already in the draft cache

    def _fn(self, width):
        if width not in self._fns:
            model = self.model

            def fn(params, tokens, mask, cache, start):
                positions = start + jnp.arange(width, dtype=jnp.int32)[None, :]
                out = model(params, input_ids=tokens, attention_mask=mask,
                            position_ids=positions, past_key_values=cache,
                            cache_position=start, logits_to_keep=0)
                return out.past_key_values, out.logits

            self._fns[width] = jax.jit(fn)
        return self._fns[width]

    def _catch_up(self, ctx_ids):
        """Feed any committed-but-unseen tokens through the draft, one jitted
        width per call count (prompt prefill uses the full width once)."""
        if self._cache is None:
            self._cache = self.model.init_cache(1, self.max_len, dtype=self.model.dtype)
        n = len(ctx_ids)
        while self._committed < n - 1:  # leave the final token for the proposal loop
            width = n - 1 - self._committed
            mask = np.zeros((1, self.max_len), np.int32)
            mask[0, : self._committed + width] = 1
            tokens = np.asarray([ctx_ids[self._committed: self._committed + width]], np.int32)
            self._cache, _ = self._fn(width)(
                self.params, jnp.asarray(tokens), jnp.asarray(mask), self._cache,
                jnp.asarray(self._committed, jnp.int32))
            self._committed += width

    def get_candidates(self, ctx_ids):
        if len(ctx_ids) + self.gamma + 1 >= self.max_len:
            return [], None
        self._catch_up(ctx_ids)
        proposals: list[int] = []
        probs: list[np.ndarray] = []
        tok = int(ctx_ids[-1])
        pos = len(ctx_ids) - 1
        step = self._fn(1)
        cache = self._cache
        for g in range(self.gamma):
            mask = np.zeros((1, self.max_len), np.int32)
            mask[0, : pos + 1] = 1
            cache, logits = step(self.params, jnp.asarray([[tok]]), jnp.asarray(mask),
                                 cache, jnp.asarray(pos, jnp.int32))
            lg = np.asarray(logits, np.float32)[0, -1]
            if self.do_sample:
                q = _softmax(lg / max(self.temperature, 1e-6))
                tok = int(self.rng.choice(len(q), p=q))
            else:
                q = np.zeros_like(lg)
                q[int(np.argmax(lg))] = 1.0
                tok = int(np.argmax(lg))
            proposals.append(tok)
            probs.append(q)
            pos += 1
        # the speculative cache advance is provisional; committed tokens are
        # replayed via _catch_up after acceptance
        return proposals, np.stack(probs) if probs else None


class SpeculativeDecoder:
    """Draft/verify loop with greedy or speculative-sampling verification
    (reference _assisted_decoding utils.py:3551 / _speculative_sampling :3981)."""

    def __init__(self, model, candidate_generator, *, max_len: int = 512,
                 do_sample: bool = False, temperature: float = 1.0, seed: int = 0):
        self.model = model
        self.cand = candidate_generator
        self.max_len = max_len
        self.do_sample = do_sample
        self.temperature = temperature
        self.rng = np.random.default_rng(seed)
        self._fns: dict = {}

    def _fn(self, which, width):
        key = (which, width)
        if key not in self._fns:
            model = self.model

            def fn(params, tokens, mask, cache, start):
                positions = start + jnp.arange(width, dtype=jnp.int32)[None, :]
                out = model(params, input_ids=tokens, attention_mask=mask,
                            position_ids=positions, past_key_values=cache,
                            cache_position=start, logits_to_keep=0)
                return out.past_key_values, out.logits

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _target_probs(self, logits):
        if self.do_sample:
            return _softmax(logits / max(self.temperature, 1e-6))
        p = np.zeros_like(logits)
        p[..., np.argmax(logits, axis=-1)] = 0  # placeholder; filled per-row below
        return p

    def generate(self, params=None, input_ids=None, max_new_tokens: int = 32,
                 eos_token_id=None) -> np.ndarray:
        params = params if params is not None else self.model.params
        ids = np.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None]
        if ids.shape[0] != 1:
            raise ValueError("assisted decoding supports batch size 1 (reference parity)")
        eos = eos_token_id if eos_token_id is not None else getattr(self.model.config, "eos_token_id", None)
        eos_ids = set(eos if isinstance(eos, (list, tuple)) else ([eos] if eos is not None else []))
        eos_ids.discard(None)

        prompt = [int(t) for t in ids[0]]
        tokens = list(prompt)       # committed tokens (prompt + accepted)
        cache = self.model.init_cache(1, self.max_len, dtype=self.model.dtype)
        committed = 0               # target-cache KV coverage in slots

        def verify(window_tokens):
            nonlocal cache, committed
            width = len(window_tokens)
            mask = np.zeros((1, self.max_len), np.int32)
            mask[0, : committed + width] = 1
            cache, logits = self._fn("tgt", width)(
                params, jnp.asarray([window_tokens], jnp.int32), jnp.asarray(mask),
                cache, jnp.asarray(committed, jnp.int32))
            committed += width
            return np.asarray(logits, np.float32)[0]

        next_logits = verify(tokens)[-1]
        n_gen = 0

        while n_gen < max_new_tokens:
            first = self._pick(next_logits)
            tokens.append(first)
            n_gen += 1
            if first in eos_ids or n_gen >= max_new_tokens or committed + 2 >= self.max_len:
                break

            proposals, draft_probs = self.cand.get_candidates(tokens)
            room = self.max_len - committed - 2
            limit = max(0, min(len(proposals), room, max_new_tokens - n_gen))
            proposals = list(proposals[:limit])
            if draft_probs is not None:
                draft_probs = draft_probs[:limit]

            window = [first] + proposals
            logits = verify(window)  # logits[i]: dist after window[:i+1]

            n_accept = 0
            replacement = None
            for i, prop in enumerate(proposals):
                if self.do_sample:
                    p = _softmax(logits[i] / max(self.temperature, 1e-6))
                    q = draft_probs[i] if draft_probs is not None else None
                    if q is None:
                        # deterministic draft: speculative rule with q = delta
                        if self.rng.random() < p[prop]:
                            n_accept += 1
                            continue
                        resid = p.copy()
                        resid[prop] = 0.0
                    else:
                        if self.rng.random() < min(1.0, p[prop] / max(q[prop], 1e-20)):
                            n_accept += 1
                            continue
                        resid = np.maximum(p - q, 0.0)
                    s = resid.sum()
                    resid = resid / s if s > 0 else p
                    replacement = int(self.rng.choice(len(resid), p=resid))
                    break
                else:
                    if prop == int(np.argmax(logits[i])):
                        n_accept += 1
                        continue
                    replacement = int(np.argmax(logits[i]))
                    break

            tokens.extend(proposals[:n_accept])
            n_gen += n_accept
            self.cand.observe(n_accept, len(proposals))
            # drop stale KV: only [first] + accepted proposals stay committed
            committed = committed - len(window) + 1 + n_accept

            if any(t in eos_ids for t in proposals[:n_accept]) or n_gen >= max_new_tokens:
                break
            if replacement is not None:
                tokens.append(replacement)
                n_gen += 1
                if replacement in eos_ids or n_gen >= max_new_tokens or committed + 2 >= self.max_len:
                    break
                next_logits = verify([replacement])[-1]
            else:
                # all drafts accepted: the last verify position is the bonus
                # distribution for the next round's first token — but its KV
                # (for the last accepted token) is already committed
                next_logits = logits[len(window) - 1]

        seq = prompt + [t for t in tokens[len(prompt):]][: max_new_tokens]
        return np.asarray([seq], np.int32)

    def _pick(self, logits):
        if self.do_sample:
            p = _softmax(logits / max(self.temperature, 1e-6))
            return int(self.rng.choice(len(p), p=p))
        return int(np.argmax(logits))


def assisted_generate(model, assistant_model=None, input_ids=None, *, params=None,
                      draft_params=None, max_new_tokens: int = 32,
                      num_assistant_tokens: int = 5, eos_token_id=None,
                      max_len: int = 512, do_sample: bool = False,
                      temperature: float = 1.0, seed: int = 0,
                      prompt_lookup_num_tokens: Optional[int] = None) -> np.ndarray:
    """Functional entry (reference generate(assistant_model=...) route)."""
    if prompt_lookup_num_tokens is not None:
        cand = PromptLookupCandidateGenerator(num_output_tokens=prompt_lookup_num_tokens)
    else:
        rng = np.random.default_rng(seed + 1)
        cand = AssistedCandidateGenerator(
            assistant_model, draft_params, num_assistant_tokens=num_assistant_tokens,
            max_len=max_len, do_sample=do_sample, temperature=temperature, rng=rng)
    dec = SpeculativeDecoder(model, cand, max_len=max_len, do_sample=do_sample,
                             temperature=temperature, seed=seed)
    return dec.generate(params=params, input_ids=input_ids,
                        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id)


# Backwards-compatible alias (pre-round-2 API)
class AssistedDecoder:
    def __init__(self, model, assistant_model, *, num_assistant_tokens: int = 5,
                 max_len: int = 512, cache_dtype=None):
        self.model = model
        self.draft = assistant_model
        self.gamma = num_assistant_tokens
        self.max_len = max_len

    def generate(self, params=None, draft_params=None, input_ids=None,
                 max_new_tokens: int = 32, eos_token_id=None):
        return assisted_generate(self.model, self.draft, input_ids, params=params,
                                 draft_params=draft_params, max_new_tokens=max_new_tokens,
                                 num_assistant_tokens=self.gamma,
                                 eos_token_id=eos_token_id, max_len=self.max_len)
