"""Stopping criteria (reference src/transformers/generation/stopping_criteria.py).

Two kinds, by execution site:
- device criteria (max length, EOS) are baked into the jitted while_loop —
  no classes needed there;
- host criteria (max wall time, stop strings) run in the streaming decode
  path, where a Python object sees each token.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class StoppingCriteria:
    def __call__(self, input_ids: np.ndarray, scores=None) -> np.ndarray:
        """Returns bool [B]: True where the row should stop."""
        raise NotImplementedError


class MaxLengthCriteria(StoppingCriteria):
    def __init__(self, max_length: int):
        self.max_length = max_length

    def __call__(self, input_ids, scores=None):
        return np.full((input_ids.shape[0],), input_ids.shape[1] >= self.max_length)


class MaxTimeCriteria(StoppingCriteria):
    """reference stopping_criteria.py MaxTimeCriteria."""

    def __init__(self, max_time: float, initial_timestamp: Optional[float] = None):
        self.max_time = max_time
        self.initial_timestamp = time.time() if initial_timestamp is None else initial_timestamp

    def __call__(self, input_ids, scores=None):
        done = time.time() - self.initial_timestamp > self.max_time
        return np.full((input_ids.shape[0],), done)


class EosTokenCriteria(StoppingCriteria):
    def __init__(self, eos_token_id):
        self.eos_token_id = tuple(eos_token_id) if isinstance(eos_token_id, (list, tuple)) else (eos_token_id,)

    def __call__(self, input_ids, scores=None):
        last = input_ids[:, -1]
        done = np.zeros(last.shape, bool)
        for e in self.eos_token_id:
            done |= last == e
        return done


class StopStringCriteria(StoppingCriteria):
    """Stop when decoded text ends with any stop string (reference's
    tensorized matcher replaced by host-side decode — the streaming path
    already decodes for the streamer)."""

    def __init__(self, tokenizer, stop_strings):
        self.tokenizer = tokenizer
        self.stop_strings = [stop_strings] if isinstance(stop_strings, str) else list(stop_strings)
        self.max_len = max(len(s) for s in self.stop_strings)

    def __call__(self, input_ids, scores=None):
        out = np.zeros((input_ids.shape[0],), bool)
        # decode only a tail window large enough to contain any stop string
        tail = input_ids[:, -(self.max_len + 8) :]
        for i in range(input_ids.shape[0]):
            text = self.tokenizer.decode([int(t) for t in tail[i]], skip_special_tokens=False)
            out[i] = any(text.endswith(s) or s in text[-2 * self.max_len :] for s in self.stop_strings)
        return out


class StoppingCriteriaList(list):
    def __call__(self, input_ids, scores=None):
        done = np.zeros((input_ids.shape[0],), bool)
        for c in self:
            done |= np.asarray(c(input_ids, scores))
        return done
