"""Pallas decode-attention kernel (interpret mode on CPU) vs eager."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.ops.attention import eager_attention  # noqa: E402
from transformers_tpu.ops.pallas.decode_attention import decode_attention  # noqa: E402


def _setup(b=2, s=512, h=8, kvh=2, d=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32)
    return q, k, v


def _eager_ref(q, k, v, start, end, sliding_window=None):
    b, _, _, d = q.shape
    s = k.shape[1]
    slots = np.arange(s)[None, :]
    kv_valid = ((slots >= np.asarray(start)[:, None]) & (slots < np.asarray(end)[:, None]))
    q_positions = jnp.asarray((np.asarray(end) - 1)[:, None], jnp.int32)
    return eager_attention(q, k, v, q_positions=q_positions,
                           kv_valid=jnp.asarray(kv_valid.astype(np.int32)),
                           is_causal=True, sliding_window=sliding_window, scale=d**-0.5)


def test_decode_kernel_matches_eager():
    q, k, v = _setup()
    start = jnp.asarray([0, 64], jnp.int32)   # row 1 left-padded
    end = jnp.asarray([300, 400], jnp.int32)  # live region ends mid-buffer
    out = decode_attention(q, k, v, start, end, scale=q.shape[-1] ** -0.5)
    ref = _eager_ref(q, k, v, start, end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_kernel_sliding_window():
    q, k, v = _setup(seed=1)
    start = jnp.asarray([0, 0], jnp.int32)
    end = jnp.asarray([500, 200], jnp.int32)
    out = decode_attention(q, k, v, start, end, scale=q.shape[-1] ** -0.5, sliding_window=128)
    ref = _eager_ref(q, k, v, start, end, sliding_window=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_kernel_small_context():
    q, k, v = _setup(b=1, s=256, seed=2)
    start = jnp.asarray([0], jnp.int32)
    end = jnp.asarray([5], jnp.int32)  # only 5 live slots
    out = decode_attention(q, k, v, start, end, scale=q.shape[-1] ** -0.5)
    ref = _eager_ref(q, k, v, start, end)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
