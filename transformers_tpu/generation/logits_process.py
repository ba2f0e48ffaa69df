"""Jittable logits processors.

TPU-native analog of reference src/transformers/generation/logits_process.py
(38 classes, 3,222 LoC). Each processor here is a pure function over
``(logits, state)`` where ``state`` carries the static-shape decode buffers:

    state = {
        "ids": [B, T] full token buffer (prompt left-padded + generated),
        "mask": [B, T] validity,
        "pos": scalar — index of the slot being generated,
        "gen_count": scalar — number of tokens generated so far,
    }

so every processor is safe inside ``jax.jit``/``lax.while_loop`` (static
shapes, no data-dependent Python control flow).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-but-finite to keep softmax NaN-free on masked rows


class LogitsProcessorList(list):
    def __call__(self, logits: jnp.ndarray, state: dict) -> jnp.ndarray:
        for proc in self:
            logits = proc(logits, state)
        return logits


class TemperatureLogitsWarper:
    """reference logits_process.py TemperatureLogitsWarper"""

    def __init__(self, temperature: float):
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        self.temperature = float(temperature)

    def __call__(self, logits, state):
        return logits / self.temperature


class TopKLogitsWarper:
    """Keep top-k logits (reference TopKLogitsWarper)."""

    def __init__(self, top_k: int, filter_value: float = NEG_INF):
        self.top_k = int(top_k)
        self.filter_value = filter_value

    def __call__(self, logits, state):
        k = min(self.top_k, logits.shape[-1])
        if k <= 0:
            return logits
        topk_vals = jax.lax.top_k(logits, k)[0]
        threshold = topk_vals[..., -1:]
        return jnp.where(logits < threshold, self.filter_value, logits)


class TopPLogitsWarper:
    """Nucleus sampling (reference TopPLogitsWarper). Full sort — vocab-size
    sorts are cheap on TPU relative to the decode matmuls."""

    def __init__(self, top_p: float, filter_value: float = NEG_INF, min_tokens_to_keep: int = 1):
        self.top_p = float(top_p)
        self.filter_value = filter_value
        self.min_tokens_to_keep = min_tokens_to_keep

    def __call__(self, logits, state):
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens whose cumulative probability up to and including them
        # first exceeds top_p (HF semantics: remove tokens with cum > top_p,
        # shifted right to always keep the first).
        sorted_keep = cum - probs < self.top_p
        sorted_keep = sorted_keep.at[..., : self.min_tokens_to_keep].set(True)
        # threshold = smallest kept logit
        kept_logits = jnp.where(sorted_keep, sorted_logits, jnp.inf)
        threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
        return jnp.where(logits < threshold, self.filter_value, logits)


class MinPLogitsWarper:
    """reference MinPLogitsWarper: keep tokens with p >= min_p * p_max."""

    def __init__(self, min_p: float, filter_value: float = NEG_INF):
        self.min_p = float(min_p)
        self.filter_value = filter_value

    def __call__(self, logits, state):
        probs = jax.nn.softmax(logits, axis=-1)
        p_max = jnp.max(probs, axis=-1, keepdims=True)
        keep = probs >= self.min_p * p_max
        return jnp.where(keep, logits, self.filter_value)


class RepetitionPenaltyLogitsProcessor:
    """reference RepetitionPenaltyLogitsProcessor: divide positive logits of
    seen tokens by the penalty, multiply negative ones."""

    def __init__(self, penalty: float):
        self.penalty = float(penalty)

    def __call__(self, logits, state):
        ids, mask = state["ids"], state["mask"]
        vocab = logits.shape[-1]
        # one-hot scatter of seen tokens (mask off padding)
        seen = jnp.zeros(logits.shape, dtype=bool)
        onehot = jax.nn.one_hot(ids, vocab, dtype=jnp.bool_)
        seen = jnp.any(onehot & mask.astype(bool)[..., None], axis=1)
        penalized = jnp.where(logits > 0, logits / self.penalty, logits * self.penalty)
        return jnp.where(seen, penalized, logits)


class NoRepeatNGramLogitsProcessor:
    """Static-shape n-gram blocking (reference NoRepeatNGramLogitsProcessor).

    For each candidate token v: banned if the last (n-1) generated tokens
    followed by v occurred before. Implemented as a matching scan over the
    static ids buffer — O(T * n) per step, fine for moderate T.
    """

    def __init__(self, ngram_size: int):
        self.n = int(ngram_size)

    def __call__(self, logits, state):
        n = self.n
        if n <= 0:
            return logits
        ids, mask, pos = state["ids"], state["mask"], state["pos"]
        b, t = ids.shape
        if t < n:
            return logits
        # prefix: last n-1 tokens before the slot being generated
        prefix_idx = pos - (n - 1) + jnp.arange(n - 1)  # [n-1]
        prefix = ids[:, prefix_idx] if n > 1 else jnp.zeros((b, 0), ids.dtype)  # [B, n-1]
        # all historical windows: window starting at j covers ids[j : j+n]
        starts = jnp.arange(t - n + 1)

        def window_match(j):
            win_prefix = jax.lax.dynamic_slice_in_dim(ids, j, n - 1, axis=1) if n > 1 else prefix
            match = jnp.all(win_prefix == prefix, axis=-1) if n > 1 else jnp.ones((b,), bool)
            in_range = (j + n - 1) < pos
            valid = jnp.all(jax.lax.dynamic_slice_in_dim(mask, j, n - 1, axis=1) > 0, axis=-1) if n > 1 else jnp.ones((b,), bool)
            next_tok = ids[:, j + n - 1]
            return match & in_range & valid, next_tok

        matches, next_toks = jax.vmap(window_match)(starts)  # [W, B], [W, B]
        vocab = logits.shape[-1]
        banned = jnp.zeros((b, vocab), bool)
        onehot = jax.nn.one_hot(next_toks, vocab, dtype=jnp.bool_)  # [W, B, V]
        banned = jnp.any(onehot & matches[..., None], axis=0)
        return jnp.where(banned, NEG_INF, logits)


class MinNewTokensLengthLogitsProcessor:
    """Suppress EOS until min_new_tokens generated (reference MinNewTokensLengthLogitsProcessor)."""

    def __init__(self, min_new_tokens: int, eos_token_ids: Sequence[int]):
        self.min_new_tokens = int(min_new_tokens)
        self.eos_token_ids = tuple(eos_token_ids)

    def __call__(self, logits, state):
        block = state["gen_count"] < self.min_new_tokens
        eos_mask = jnp.zeros((logits.shape[-1],), bool)
        for e in self.eos_token_ids:
            eos_mask = eos_mask.at[e].set(True)
        return jnp.where(block & eos_mask[None, :], NEG_INF, logits)


class SuppressTokensLogitsProcessor:
    """reference SuppressTokensLogitsProcessor."""

    def __init__(self, suppress_tokens: Sequence[int]):
        self.suppress = tuple(int(t) for t in suppress_tokens)

    def __call__(self, logits, state):
        mask = jnp.zeros((logits.shape[-1],), bool)
        for t in self.suppress:
            mask = mask.at[t].set(True)
        return jnp.where(mask[None, :], NEG_INF, logits)


class SuppressTokensAtBeginLogitsProcessor:
    """reference SuppressTokensAtBeginLogitsProcessor (whisper)."""

    def __init__(self, begin_suppress_tokens: Sequence[int], begin_index: int = 0):
        self.suppress = tuple(int(t) for t in begin_suppress_tokens)
        self.begin_index = begin_index

    def __call__(self, logits, state):
        at_begin = state["gen_count"] == self.begin_index
        mask = jnp.zeros((logits.shape[-1],), bool)
        for t in self.suppress:
            mask = mask.at[t].set(True)
        return jnp.where(at_begin & mask[None, :], NEG_INF, logits)


class ForcedBOSTokenLogitsProcessor:
    def __init__(self, bos_token_id: int):
        self.bos = int(bos_token_id)

    def __call__(self, logits, state):
        force = state["gen_count"] == 0
        forced = jnp.full_like(logits, NEG_INF).at[:, self.bos].set(0.0)
        return jnp.where(force, forced, logits)


class ForcedEOSTokenLogitsProcessor:
    def __init__(self, max_new_tokens: int, eos_token_id: int):
        self.max_new_tokens = int(max_new_tokens)
        self.eos = int(eos_token_id)

    def __call__(self, logits, state):
        force = state["gen_count"] >= self.max_new_tokens - 1
        forced = jnp.full_like(logits, NEG_INF).at[:, self.eos].set(0.0)
        return jnp.where(force, forced, logits)


class TypicalLogitsWarper:
    """Typical decoding (reference logits_process.py TypicalLogitsWarper)."""

    def __init__(self, mass: float = 0.9, filter_value: float = -jnp.inf):
        self.mass = float(mass)
        self.filter_value = filter_value

    def __call__(self, logits, state=None):
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
        shifted = jnp.abs(-logp - ent)
        order = jnp.argsort(shifted, axis=-1)
        sorted_p = jnp.take_along_axis(p, order, axis=-1)
        cum = jnp.cumsum(sorted_p, axis=-1)
        last_ind = jnp.sum((cum < self.mass).astype(jnp.int32), axis=-1, keepdims=True)
        sorted_keep = jnp.arange(logits.shape[-1])[None, :] <= last_ind
        keep = jnp.zeros_like(sorted_keep).at[
            jnp.arange(logits.shape[0])[:, None], order].set(sorted_keep)
        return jnp.where(keep, logits, self.filter_value)


class EpsilonLogitsWarper:
    """Epsilon sampling: drop tokens with prob < epsilon (reference analog)."""

    def __init__(self, epsilon: float, filter_value: float = -jnp.inf, min_tokens_to_keep: int = 1):
        self.epsilon = float(epsilon)
        self.filter_value = filter_value
        self.min_tokens_to_keep = min_tokens_to_keep

    def __call__(self, logits, state=None):
        p = jax.nn.softmax(logits, axis=-1)
        keep = p >= self.epsilon
        # always keep the top-k fallback
        topk_vals, _ = jax.lax.top_k(logits, self.min_tokens_to_keep)
        keep = keep | (logits >= topk_vals[:, -1:])
        return jnp.where(keep, logits, self.filter_value)


class EtaLogitsWarper:
    """Eta sampling: entropy-adaptive epsilon (reference EtaLogitsWarper)."""

    def __init__(self, epsilon: float, filter_value: float = -jnp.inf, min_tokens_to_keep: int = 1):
        self.epsilon = float(epsilon)
        self.filter_value = filter_value
        self.min_tokens_to_keep = min_tokens_to_keep

    def __call__(self, logits, state=None):
        p = jax.nn.softmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ent = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1, keepdims=True)
        eta = jnp.minimum(self.epsilon, jnp.sqrt(self.epsilon) * jnp.exp(-ent))
        keep = p >= eta
        topk_vals, _ = jax.lax.top_k(logits, self.min_tokens_to_keep)
        keep = keep | (logits >= topk_vals[:, -1:])
        return jnp.where(keep, logits, self.filter_value)


class NoBadWordsLogitsProcessor:
    """Ban single-token bad words; multi-token sequences ban the final token
    when the preceding tokens match (reference NoBadWordsLogitsProcessor)."""

    def __init__(self, bad_words_ids, eos_token_id=None):
        self.singles = tuple(w[0] for w in bad_words_ids if len(w) == 1)
        self.multi = tuple(tuple(w) for w in bad_words_ids if len(w) > 1)

    def __call__(self, logits, state=None):
        if self.singles:
            logits = logits.at[:, jnp.asarray(self.singles)].set(-jnp.inf)
        if self.multi and state is not None and "ids" in state:
            ids = state["ids"]
            pos = state["pos"]  # next slot to fill
            for seq in self.multi:
                prefix = jnp.asarray(seq[:-1], jnp.int32)
                n = len(seq) - 1
                # gather the last n written tokens [B, n]
                idx = pos - n + jnp.arange(n, dtype=jnp.int32)
                window = ids[:, None, :]  # avoid dynamic slice per batch: use take
                gathered = jnp.take(ids, jnp.clip(idx, 0, ids.shape[1] - 1), axis=1)
                match = jnp.all(gathered == prefix[None, :], axis=-1) & (pos >= n)
                banned = logits.at[:, seq[-1]].set(-jnp.inf)
                logits = jnp.where(match[:, None], banned, logits)
        return logits


class LogitNormalization:
    def __call__(self, logits, state=None):
        return jax.nn.log_softmax(logits, axis=-1)


class ExponentialDecayLengthPenalty:
    """Increase eos likelihood after a start index (reference analog)."""

    def __init__(self, exponential_decay_length_penalty, eos_token_id, input_ids_seq_length=0):
        self.start, self.factor = exponential_decay_length_penalty
        self.eos_ids = tuple(eos_token_id) if isinstance(eos_token_id, (list, tuple)) else (eos_token_id,)
        self.prompt_len = input_ids_seq_length

    def __call__(self, logits, state=None):
        gen_count = state["gen_count"] if state is not None else 0
        steps = jnp.maximum(gen_count - self.start, 0).astype(jnp.float32)
        mult = jnp.power(self.factor, steps)
        for e in self.eos_ids:
            boosted = jnp.abs(logits[:, e]) * (mult - 1.0)
            logits = logits.at[:, e].add(boosted)
        return logits


class MinLengthLogitsProcessor:
    """Ban eos while total generated length < min_length (reference
    MinLengthLogitsProcessor; min_length counts prompt + generated)."""

    def __init__(self, min_length: int, eos_token_id, prompt_len: int = 0):
        self.min_length = int(min_length)
        self.eos_ids = tuple(eos_token_id) if isinstance(eos_token_id, (list, tuple)) else (eos_token_id,)
        self.prompt_len = int(prompt_len)

    def __call__(self, logits, state=None):
        gen_count = state["gen_count"] if state is not None else 0
        too_short = (self.prompt_len + gen_count) < self.min_length
        eos = jnp.asarray(self.eos_ids)
        banned = logits.at[:, eos].set(NEG_INF)
        return jnp.where(too_short, banned, logits)


class InfNanRemoveLogitsProcessor:
    """Replace nan -> 0 and +-inf -> finite extremes (reference
    InfNanRemoveLogitsProcessor)."""

    def __call__(self, logits, state=None):
        logits = jnp.nan_to_num(logits, nan=0.0, posinf=jnp.finfo(logits.dtype).max,
                                neginf=NEG_INF)
        return logits


class EncoderRepetitionPenaltyLogitsProcessor:
    """Hallucination penalty: *boost* tokens present in the encoder input by
    1/penalty (reference EncoderRepetitionPenaltyLogitsProcessor)."""

    def __init__(self, penalty: float, encoder_input_ids):
        self.penalty = 1.0 / float(penalty)
        self.encoder_input_ids = jnp.asarray(encoder_input_ids)

    def __call__(self, logits, state=None):
        vocab = logits.shape[-1]
        onehot = jax.nn.one_hot(self.encoder_input_ids, vocab, dtype=jnp.bool_)
        seen = jnp.any(onehot, axis=1)  # [B, V]
        penalized = jnp.where(logits > 0, logits / self.penalty, logits * self.penalty)
        return jnp.where(seen, penalized, logits)


class EncoderNoRepeatNGramLogitsProcessor:
    """Ban n-grams that would copy an n-gram of the *encoder* input
    (reference EncoderNoRepeatNGramLogitsProcessor)."""

    def __init__(self, encoder_ngram_size: int, encoder_input_ids):
        self.n = int(encoder_ngram_size)
        self.encoder_input_ids = jnp.asarray(encoder_input_ids)

    def __call__(self, logits, state):
        n = self.n
        src = self.encoder_input_ids
        b_src, t_src = src.shape
        if n <= 0 or t_src < n:
            return logits
        ids, pos = state["ids"], state["pos"]
        b = ids.shape[0]
        prefix_idx = pos - (n - 1) + jnp.arange(n - 1)
        prefix = jnp.take(ids, jnp.clip(prefix_idx, 0, ids.shape[1] - 1), axis=1)  # [B, n-1]
        starts = jnp.arange(t_src - n + 1)

        def window_match(j):
            win = jax.lax.dynamic_slice_in_dim(src, j, n - 1, axis=1) if n > 1 else None
            match = jnp.all(win == prefix, axis=-1) if n > 1 else jnp.ones((b,), bool)
            return match, src[:, j + n - 1]

        matches, next_toks = jax.vmap(window_match)(starts)  # [W, B]
        vocab = logits.shape[-1]
        onehot = jax.nn.one_hot(next_toks, vocab, dtype=jnp.bool_)
        banned = jnp.any(onehot & matches[..., None], axis=0)
        enough_context = state["gen_count"] >= (n - 1) if n > 1 else True
        return jnp.where(jnp.logical_and(banned, enough_context), NEG_INF, logits)


class SequenceBiasLogitsProcessor:
    """Additive bias on token sequences (reference SequenceBiasLogitsProcessor):
    single tokens biased unconditionally; for longer sequences the bias lands
    on the final token when the preceding tokens match the tail of ids."""

    def __init__(self, sequence_bias: dict):
        items = sequence_bias.items() if isinstance(sequence_bias, dict) else sequence_bias
        self.singles = [(seq[0], b) for seq, b in items if len(seq) == 1]
        self.multi = [(tuple(seq), b) for seq, b in items if len(seq) > 1]

    def __call__(self, logits, state=None):
        for tok, bias in self.singles:
            logits = logits.at[:, tok].add(bias)
        if state is not None and "ids" in state:
            ids, pos = state["ids"], state["pos"]
            for seq, bias in self.multi:
                n = len(seq) - 1
                idx = pos - n + jnp.arange(n, dtype=jnp.int32)
                gathered = jnp.take(ids, jnp.clip(idx, 0, ids.shape[1] - 1), axis=1)
                match = jnp.all(gathered == jnp.asarray(seq[:-1])[None, :], axis=-1) & (pos >= n)
                logits = logits.at[:, seq[-1]].add(jnp.where(match, bias, 0.0))
        return logits


class ClassifierFreeGuidanceLogitsProcessor:
    """CFG over a doubled batch (reference ClassifierFreeGuidanceLogitsProcessor):
    rows [0:B] are conditional, rows [B:2B] unconditional;
    out = uncond + scale * (cond - uncond)."""

    def __init__(self, guidance_scale: float):
        self.scale = float(guidance_scale)

    def __call__(self, logits, state=None):
        b2 = logits.shape[0]
        cond, uncond = logits[: b2 // 2], logits[b2 // 2:]
        return uncond + self.scale * (cond - uncond)


class UnbatchedClassifierFreeGuidanceLogitsProcessor:
    """CFG via a second forward with the unconditional prompt (reference
    UnbatchedClassifierFreeGuidanceLogitsProcessor). The caller supplies
    ``get_unconditional_logits(state) -> [B, V]`` — in our functional stack
    that is a closure over (model, params, negative ids)."""

    def __init__(self, guidance_scale: float, get_unconditional_logits):
        self.scale = float(guidance_scale)
        self.get_unconditional_logits = get_unconditional_logits

    def __call__(self, logits, state=None):
        if self.scale == 1.0:
            return logits
        uncond = self.get_unconditional_logits(state)
        log_cond = jax.nn.log_softmax(logits, axis=-1)
        log_uncond = jax.nn.log_softmax(uncond, axis=-1)
        return log_uncond + self.scale * (log_cond - log_uncond)


class HammingDiversityLogitsProcessor:
    """Group beam search diversity penalty (reference
    HammingDiversityLogitsProcessor): subtract lambda * token-frequency among
    tokens already chosen by PREVIOUS beam groups at this step. The beam
    searcher passes the previous groups' current tokens via
    ``state["current_tokens"]`` (a [B * prev_group_beams] int array)."""

    def __init__(self, diversity_penalty: float, num_beams: int, num_beam_groups: int):
        self.penalty = float(diversity_penalty)
        self.num_beams = num_beams
        self.num_beam_groups = num_beam_groups

    def __call__(self, logits, state):
        current = state.get("current_tokens") if isinstance(state, dict) else None
        if current is None or current.size == 0:
            return logits
        vocab = logits.shape[-1]
        freq = jnp.sum(jax.nn.one_hot(current, vocab, dtype=logits.dtype), axis=0)
        return logits - self.penalty * freq[None, :]


class PrefixConstrainedLogitsProcessor:
    """Constrained generation via a host callback (reference
    PrefixConstrainedLogitsProcessor). ``prefix_allowed_tokens_fn(batch_id,
    ids) -> list[int]``. Host-side only: used on the streaming host-loop
    generate path (it cannot run inside jit; reference runs it eagerly too)."""

    def __init__(self, prefix_allowed_tokens_fn, num_beams: int = 1):
        self.fn = prefix_allowed_tokens_fn
        self.num_beams = num_beams

    def __call__(self, logits, state):
        import numpy as np

        ids = np.asarray(state["ids"])
        mask_np = np.asarray(state["mask"])
        out = np.full(np.asarray(logits).shape, NEG_INF, np.float32)
        for row in range(ids.shape[0]):
            valid = ids[row][mask_np[row] > 0]
            allowed = self.fn(row // self.num_beams, valid)
            out[row, np.asarray(allowed, np.int64)] = 0.0
        return logits + jnp.asarray(out)


class WhisperTimeStampLogitsProcessor:
    """Whisper timestamp grammar (reference WhisperTimeStampLogitsProcessor):
    timestamps come in pairs; once the probability mass over timestamp tokens
    exceeds any single text token, sampling is forced into timestamps."""

    def __init__(self, generate_config, begin_index: Optional[int] = None):
        self.no_timestamps_token_id = generate_config.no_timestamps_token_id
        self.timestamp_begin = generate_config.no_timestamps_token_id + 1
        self.eos_token_id = generate_config.eos_token_id
        self.begin_index = begin_index if begin_index is not None else 1
        self.max_initial_timestamp_index = getattr(
            generate_config, "max_initial_timestamp_index", None)

    def __call__(self, logits, state):
        ids, pos, gen_count = state["ids"], state["pos"], state["gen_count"]
        b, vocab = logits.shape
        logits = logits.at[:, self.no_timestamps_token_id].set(NEG_INF)

        last = jnp.take(ids, jnp.clip(pos - 1, 0, ids.shape[1] - 1), axis=1)
        prev = jnp.take(ids, jnp.clip(pos - 2, 0, ids.shape[1] - 1), axis=1)
        last_was_ts = (last >= self.timestamp_begin) & (gen_count >= 1)
        penult_was_ts = (prev >= self.timestamp_begin) & (gen_count >= 2)

        tok = jnp.arange(vocab)
        is_ts = tok >= self.timestamp_begin
        # after a lone timestamp: next must be a timestamp pair -> ban text;
        # after a completed pair: ban timestamps
        ban_text = last_was_ts & ~penult_was_ts
        ban_ts = last_was_ts & penult_was_ts
        non_eos_text = (~is_ts) & (tok != self.eos_token_id)
        logits = jnp.where(ban_text[:, None] & non_eos_text[None, :], NEG_INF, logits)
        logits = jnp.where(ban_ts[:, None] & is_ts[None, :], NEG_INF, logits)

        # first generated token may be capped to an initial timestamp window
        if self.max_initial_timestamp_index is not None:
            cap = self.timestamp_begin + self.max_initial_timestamp_index
            at_begin = gen_count == 0
            logits = jnp.where(at_begin & (tok > cap)[None, :], NEG_INF, logits)

        # force timestamps when their total prob beats the best text token
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ts_lp = jax.nn.logsumexp(jnp.where(is_ts[None, :], lp, -jnp.inf), axis=-1)
        max_text = jnp.max(jnp.where(is_ts[None, :], -jnp.inf, lp), axis=-1)
        force_ts = ts_lp > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], NEG_INF, logits)
        return logits


class AlternatingCodebooksLogitsProcessor:
    """Bark fine-acoustics alternation (reference
    AlternatingCodebooksLogitsProcessor): even steps sample codebook-1 range,
    odd steps codebook-2 range."""

    def __init__(self, input_start_len: int, semantic_vocab_size: int, codebook_size: int):
        self.input_start_len = input_start_len
        self.semantic_vocab_size = semantic_vocab_size
        self.codebook_size = codebook_size

    def __call__(self, logits, state):
        total_len = self.input_start_len + state["gen_count"]
        is_first = (total_len % 2) == 0
        vocab = logits.shape[-1]
        tok = jnp.arange(vocab)
        in_cb1 = (tok >= self.semantic_vocab_size) & (tok < self.semantic_vocab_size + self.codebook_size)
        in_cb2 = (tok >= self.semantic_vocab_size + self.codebook_size) & (
            tok < self.semantic_vocab_size + 2 * self.codebook_size)
        allowed = jnp.where(is_first, in_cb1, in_cb2)
        return jnp.where(allowed[None, :], logits, NEG_INF)


class BarkEosPrioritizerLogitsProcessor:
    """Force eos once its probability clears a threshold (reference
    BarkEosPrioritizerLogitsProcessor)."""

    def __init__(self, eos_token_id, min_eos_p: float):
        self.eos_ids = tuple(eos_token_id) if isinstance(eos_token_id, (list, tuple)) else (eos_token_id,)
        self.min_eos_p = float(min_eos_p)

    def __call__(self, logits, state=None):
        if self.min_eos_p is None or self.min_eos_p <= 0:
            return logits
        probs = jax.nn.softmax(logits, axis=-1)
        eos = jnp.asarray(self.eos_ids)
        eos_p = jnp.max(probs[:, eos], axis=-1)
        force = eos_p > self.min_eos_p
        only_eos = jnp.full_like(logits, NEG_INF).at[:, eos].set(0.0)
        return jnp.where(force[:, None], logits + only_eos, logits)
