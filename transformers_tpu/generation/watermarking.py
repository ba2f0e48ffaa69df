"""Watermarking (reference src/transformers/generation/watermarking.py:
green/red-list watermark processor + detector).

Jit-friendly greenlist selection: the previous token seeds a hash; the
greenlist is the set of vocab ids whose keyed hash falls below
``greenlist_ratio`` — computed with pure integer ops (no host RNG), so the
processor runs inside the jitted decode loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hash_mix(x: jnp.ndarray, key: int) -> jnp.ndarray:
    """splitmix64-style integer hash (uint32 variant), jit-safe."""
    x = x.astype(jnp.uint32) * jnp.uint32(key | 1)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


class WatermarkLogitsProcessor:
    """Green-list bias watermark (reference WatermarkLogitsProcessor)."""

    def __init__(self, vocab_size: int, *, greenlist_ratio: float = 0.25,
                 bias: float = 2.0, hashing_key: int = 15485863,
                 seeding_scheme: str = "lefthash"):
        self.vocab_size = vocab_size
        self.greenlist_ratio = greenlist_ratio
        self.bias = bias
        self.hashing_key = hashing_key

    def greenlist_mask(self, prev_token: jnp.ndarray) -> jnp.ndarray:
        """[B] prev token -> [B, V] bool green mask."""
        vocab = jnp.arange(self.vocab_size, dtype=jnp.uint32)[None, :]
        seed = _hash_mix(prev_token.astype(jnp.uint32), self.hashing_key)[:, None]
        h = _hash_mix(vocab ^ seed, self.hashing_key)
        threshold = jnp.uint32(int(self.greenlist_ratio * float(2**32 - 1)))
        return h < threshold

    def __call__(self, logits, state=None):
        if state is None or "ids" not in state:
            return logits
        ids = state["ids"]
        pos = state["pos"]
        prev = jnp.take_along_axis(
            ids, jnp.broadcast_to(jnp.maximum(pos - 1, 0), (ids.shape[0],))[:, None], axis=1)[:, 0]
        green = self.greenlist_mask(prev)[:, : logits.shape[-1]]
        return jnp.where(green, logits + self.bias, logits)


class WatermarkDetector:
    """z-score detector over green-token frequency (reference WatermarkDetector)."""

    def __init__(self, processor: WatermarkLogitsProcessor):
        self.processor = processor

    def score(self, sequences) -> dict:
        seq = jnp.asarray(sequences)
        if seq.ndim == 1:
            seq = seq[None]
        prev = seq[:, :-1]
        cur = seq[:, 1:]
        green = self.processor.greenlist_mask(prev.reshape(-1))
        hit = jnp.take_along_axis(green, cur.reshape(-1)[:, None], axis=1)[:, 0]
        hit = hit.reshape(cur.shape)
        n = cur.shape[1]
        count = jnp.sum(hit, axis=1)
        p = self.processor.greenlist_ratio
        z = (count - n * p) / jnp.sqrt(n * p * (1 - p))
        return {"num_green": np.asarray(count), "z_score": np.asarray(z),
                "prediction": np.asarray(z > 4.0)}
