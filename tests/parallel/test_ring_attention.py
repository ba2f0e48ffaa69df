"""Ring attention (context parallelism) on the 8-virtual-device CPU mesh."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.ops.attention import eager_attention  # noqa: E402
from transformers_tpu.ops.ring_attention import make_ring_attention  # noqa: E402


@pytest.fixture(scope="module")
def seq_mesh():
    devices = np.array(jax.devices()[:4]).reshape(4)
    return Mesh(devices, ("sequence",))


def _qkv(b=2, s=32, h=4, kvh=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)), jnp.float32)
    return q, k, v


def test_ring_matches_full_attention_causal(seq_mesh):
    q, k, v = _qkv()
    ring = make_ring_attention(seq_mesh, "sequence", causal=True)
    got = ring(q, k, v)
    ref = eager_attention(q, k, v, is_causal=True, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_matches_full_attention_bidirectional(seq_mesh):
    q, k, v = _qkv(seed=1)
    ring = make_ring_attention(seq_mesh, "sequence", causal=False)
    got = ring(q, k, v)
    ref = eager_attention(q, k, v, is_causal=False, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_with_padding_mask(seq_mesh):
    q, k, v = _qkv(seed=2)
    b, s = q.shape[:2]
    kv_valid = np.ones((b, s), np.int32)
    kv_valid[0, -8:] = 0  # pad tail of row 0
    ring = make_ring_attention(seq_mesh, "sequence", causal=True)
    got = ring(q, k, v, kv_valid=jnp.asarray(kv_valid))
    ref = eager_attention(q, k, v, kv_valid=jnp.asarray(kv_valid), is_causal=True,
                          scale=q.shape[-1] ** -0.5)
    # padded rows attend nothing valid in early positions; compare valid region
    np.testing.assert_allclose(np.asarray(got)[:, :24], np.asarray(ref)[:, :24], atol=2e-5)


def test_ring_under_jit_and_grad(seq_mesh):
    q, k, v = _qkv(seed=3)
    ring = make_ring_attention(seq_mesh, "sequence", causal=True)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    g = jax.grad(loss)(q, k, v)
    assert np.isfinite(np.asarray(g)).all()
