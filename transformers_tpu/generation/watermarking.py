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


class SynthIDTextWatermarkLogitsProcessor:
    """SynthID-Text watermarking (reference generation/logits_process.py:2562
    SynthIDTextWatermarkLogitsProcessor).

    Tournament-free formulation: per step, hash the (ngram_len-1)-token
    context with each watermarking key (linear congruential accumulate,
    newlib/musl parameters), look Bernoulli g-values up in a seeded sampling
    table, and tilt the token probabilities by ``p *= 1 + g - E[g]`` per
    depth layer. Repeated contexts (tracked in a rolling history) are left
    unwatermarked so detection stays calibrated.

    Host-side and stateful (numpy int64 wraparound == torch int64 semantics;
    numpy ``%`` is floor-mod like torch's) — runs in the streaming/host
    decode path, where per-step logits visit the host anyway.
    """

    def __init__(self, ngram_len: int, keys: list, sampling_table_size: int,
                 sampling_table_seed: int, context_history_size: int,
                 skip_first_ngram_calls: bool = False, debug_mode: bool = False):
        self.ngram_len = ngram_len
        self.keys = np.asarray(keys, np.int64)
        try:
            # the reference's table comes from torch's seeded Philox stream;
            # reproduce it exactly when torch is importable (host-only glue)
            import torch

            gen = torch.Generator(device="cpu").manual_seed(sampling_table_seed)
            self.sampling_table = torch.randint(
                0, 2, (sampling_table_size,), generator=gen).numpy().astype(np.int64)
        except ImportError:  # pragma: no cover - torch is in every image here
            rng = np.random.default_rng(sampling_table_seed)
            self.sampling_table = rng.integers(0, 2, size=(sampling_table_size,),
                                               dtype=np.int64)
        self.context_history_size = context_history_size
        self.skip_first_ngram_calls = skip_first_ngram_calls
        self.debug_mode = debug_mode
        self.state = None

    # ------------------------------------------------------------- hashing
    @staticmethod
    def accumulate_hash(current_hash: np.ndarray, data: np.ndarray,
                        multiplier: int = 6364136223846793005,
                        increment: int = 1) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = np.asarray(current_hash, np.int64)
            mul = np.int64(np.uint64(multiplier).astype(np.int64)) \
                if multiplier > 2**63 - 1 else np.int64(multiplier)
            for i in range(data.shape[-1]):
                h = (h + data[..., i]).astype(np.int64)
                h = (h * mul).astype(np.int64)
                h = (h + np.int64(increment)).astype(np.int64)
        return h

    def compute_ngram_keys(self, ngrams: np.ndarray) -> np.ndarray:
        """[B, N, ngram_len] -> keys [B, N, depth]."""
        b, n, _ = ngrams.shape
        h = np.ones((b, n), np.int64)
        h = self.accumulate_hash(h, ngrams)
        keys = np.broadcast_to(self.keys[None, None, :, None],
                               (b, n, len(self.keys), 1))
        return self.accumulate_hash(h[..., None], keys)

    def sample_g_values(self, ngram_keys: np.ndarray) -> np.ndarray:
        return self.sampling_table[ngram_keys % len(self.sampling_table)]

    def compute_g_values(self, input_ids: np.ndarray) -> np.ndarray:
        """[B, S] -> g values [B, S - ngram_len + 1, depth] (detection side)."""
        input_ids = np.asarray(input_ids, np.int64)
        b, s = input_ids.shape
        n = s - self.ngram_len + 1
        ngrams = np.stack([input_ids[:, i:i + self.ngram_len]
                           for i in range(n)], axis=1)
        return self.sample_g_values(self.compute_ngram_keys(ngrams))

    # -------------------------------------------------------------- scoring
    def update_scores(self, scores: np.ndarray, g_values: np.ndarray) -> np.ndarray:
        probs = np.exp(scores - scores.max(axis=1, keepdims=True))
        probs = probs / probs.sum(axis=1, keepdims=True)
        for i in range(g_values.shape[-1]):
            g = g_values[:, :, i]
            g_mass = (g * probs).sum(axis=1, keepdims=True)
            probs = probs * (1 + g - g_mass)
        with np.errstate(divide="ignore"):
            logp = np.log(probs)
        return np.where(np.isfinite(logp), logp,
                        np.finfo(scores.dtype).min).astype(scores.dtype)

    def __call__(self, input_ids, scores):
        input_ids = np.asarray(input_ids, np.int64)
        scores = np.asarray(scores, np.float32)
        b, vocab = scores.shape
        if self.debug_mode:
            scores = np.ones_like(scores)
        if self.state is None:
            self.state = {
                "context": np.zeros((b, self.ngram_len - 1), np.int64),
                "history": np.zeros((b, self.context_history_size), np.int64),
                "num_calls": 0,
            }
        else:
            self.state["context"] = np.concatenate(
                [self.state["context"], input_ids[:, -1:]], axis=1)[:, 1:]
        self.state["num_calls"] += 1
        if self.skip_first_ngram_calls and self.state["num_calls"] < self.ngram_len:
            return scores

        ctx = self.state["context"]
        h0 = np.ones((b,), np.int64)
        h_ctx = self.accumulate_hash(h0, ctx)                      # [B]
        all_idx = np.broadcast_to(np.arange(vocab, dtype=np.int64)[None, :],
                                  (b, vocab))
        h = self.accumulate_hash(np.broadcast_to(h_ctx[:, None], (b, vocab)),
                                 all_idx[..., None])               # [B, V]
        keys = np.broadcast_to(self.keys[None, None, :, None],
                               (b, vocab, len(self.keys), 1))
        ngram_keys = self.accumulate_hash(h[:, :, None], keys)     # [B, V, D]
        g_values = self.sample_g_values(ngram_keys)
        updated = self.update_scores(scores, g_values)

        repeated = (self.state["history"] == h_ctx[:, None]).any(
            axis=1, keepdims=True)
        self.state["history"] = np.concatenate(
            [h_ctx[:, None], self.state["history"]], axis=1)[:, :-1]
        return np.where(repeated, scores, updated)


class SynthIDTextWatermarkDetector:
    """Mean-g-value detection for SynthID-watermarked text (the reference's
    Bayesian detector (watermarking.py:481) needs a trained scoring model;
    the calibration-free mean detector below matches its inputs/outputs:
    higher mean g over the eos-masked ngrams => watermarked)."""

    def __init__(self, processor: SynthIDTextWatermarkLogitsProcessor,
                 threshold: float = 0.52):
        self.processor = processor
        self.threshold = threshold

    def __call__(self, input_ids) -> dict:
        g = self.processor.compute_g_values(np.asarray(input_ids, np.int64))
        mean_g = g.reshape(g.shape[0], -1).mean(axis=1)
        n = g.shape[1] * g.shape[2]
        # z against Bernoulli(0.5) null
        z = (mean_g - 0.5) / (0.5 / np.sqrt(n))
        return {"mean_g_values": mean_g, "z_score": z,
                "prediction": mean_g > self.threshold}
