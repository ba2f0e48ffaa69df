"""Flash-attention kernel parity vs the eager reference
(reference pattern: tests/generation/test_flash_attention_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformers_tpu.ops.attention import eager_attention
from transformers_tpu.ops.masks import causal_mask_bool, to_additive
from transformers_tpu.ops.pallas.flash_attention import flash_attention


def make_qkv(b=2, sq=128, skv=128, h=4, kvh=2, d=64, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), dtype)
    k = jax.random.normal(ks[1], (b, skv, kvh, d), dtype)
    v = jax.random.normal(ks[2], (b, skv, kvh, d), dtype)
    return q, k, v


def ref_attn(q, k, v, q_positions, kv_valid, sliding_window=None, logit_cap=None):
    mask = causal_mask_bool(q_positions, kv_valid, sliding_window=sliding_window)
    return eager_attention(q, k, v, to_additive(mask), logit_cap=logit_cap)


@pytest.mark.parametrize("sq,skv", [(128, 128), (64, 256), (100, 300)])
def test_flash_causal_parity(sq, skv):
    b, h, kvh, d = 2, 4, 2, 64
    q, k, v = make_qkv(b, sq, skv, h, kvh, d)
    # queries occupy the last sq slots of the kv timeline
    q_positions = jnp.broadcast_to(
        (skv - sq) + jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    kv_valid = jnp.ones((b, skv), jnp.int32)
    out = flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid)
    ref = ref_attn(q, k, v, q_positions, kv_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_padded_kv():
    b, sq, skv, h, kvh, d = 2, 64, 192, 4, 4, 64
    q, k, v = make_qkv(b, sq, skv, h, kvh, d, seed=1)
    kv_valid = np.ones((b, skv), np.int32)
    kv_valid[0, :40] = 0  # left padding
    kv_valid[1, :10] = 0
    kv_valid = jnp.asarray(kv_valid)
    q_positions = jnp.broadcast_to((skv - sq) + jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    out = flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid)
    ref = ref_attn(q, k, v, q_positions, kv_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_sliding_window():
    b, s, h, d = 1, 256, 2, 64
    q, k, v = make_qkv(b, s, s, h, h, d, seed=2)
    q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    kv_valid = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid, sliding_window=64)
    ref = ref_attn(q, k, v, q_positions, kv_valid, sliding_window=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_logit_cap():
    b, s, h, d = 1, 128, 2, 64
    q, k, v = make_qkv(b, s, s, h, h, d, seed=3)
    q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    kv_valid = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid, logit_cap=30.0)
    ref = ref_attn(q, k, v, q_positions, kv_valid, logit_cap=30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    b, s, h, d = 2, 128, 4, 128
    q, k, v = make_qkv(b, s, s, h, 2, d, dtype=jnp.bfloat16, seed=4)
    q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    kv_valid = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid)
    ref = ref_attn(q, k, v, q_positions, kv_valid)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_flash_grad_matches_eager():
    b, s, h, d = 1, 64, 2, 64
    q, k, v = make_qkv(b, s, s, h, h, d, seed=5)
    q_positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    kv_valid = jnp.ones((b, s), jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, q_positions=q_positions, kv_valid=kv_valid) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attn(q, k, v, q_positions, kv_valid) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("win,cap", [(None, None), (37, None), (None, 30.0)])
def test_flash_bwd_kernel_parity(win, cap):
    """dq/dk/dv from the flash backward kernels (GQA + padding + window +
    softcap) match autodiff through the eager reference."""
    b, sq, skv, h, kvh, d = 2, 128, 192, 4, 2, 64
    q, k, v = make_qkv(b, sq, skv, h, kvh, d, seed=6)
    q_positions = jnp.broadcast_to(
        (skv - sq) + jnp.arange(sq, dtype=jnp.int32)[None, :], (b, sq))
    kv_valid = np.ones((b, skv), np.int32)
    kv_valid[1, :23] = 0
    kv_valid = jnp.asarray(kv_valid)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, q_positions=q_positions,
                                       kv_valid=kv_valid, sliding_window=win,
                                       logit_cap=cap) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attn(q, k, v, q_positions, kv_valid,
                                sliding_window=win, logit_cap=cap) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4)
