"""MoE kernel tests: dense batched-mm vs ragged_dot grouped-mm equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from transformers_tpu.ops.moe import (
    dense_experts_forward,
    ragged_experts_forward,
    topk_routing,
)


def _setup(t=16, h=8, i=12, e=4, k=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(t, h)), jnp.float32)
    w_gate = jnp.asarray(rng.normal(size=(e, h, i)) * 0.1, jnp.float32)
    w_up = jnp.asarray(rng.normal(size=(e, h, i)) * 0.1, jnp.float32)
    w_down = jnp.asarray(rng.normal(size=(e, i, h)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.normal(size=(t, e)), jnp.float32)
    weights, idx = topk_routing(router, k)
    return x, w_gate, w_up, w_down, weights, idx


def test_dense_vs_ragged_equivalence():
    x, wg, wu, wd, weights, idx = _setup()
    dense = dense_experts_forward(x, wg, wu, wd, weights, idx, jax.nn.silu)
    ragged = ragged_experts_forward(x, wg, wu, wd, weights, idx, jax.nn.silu)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ragged), atol=1e-5)


def test_routing_weights_normalized():
    router = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)), jnp.float32)
    weights, idx = topk_routing(router, 2)
    np.testing.assert_allclose(np.asarray(weights.sum(-1)), np.ones(8), atol=1e-6)
    assert idx.shape == (8, 2)


def test_ragged_jit_compiles():
    x, wg, wu, wd, weights, idx = _setup()
    fn = jax.jit(lambda *a: ragged_experts_forward(*a, act=jax.nn.silu))
    out = fn(x, wg, wu, wd, weights, idx)
    assert out.shape == x.shape
