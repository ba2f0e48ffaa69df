"""Ulysses sequence parallelism (parallel/ulysses.py): all-to-all head/seq
reshard must be numerically identical to full attention."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.ops.attention import eager_attention  # noqa: E402
from transformers_tpu.parallel.mesh import make_mesh  # noqa: E402
from transformers_tpu.parallel.ulysses import make_ulysses_attention  # noqa: E402


@pytest.mark.parametrize("kvh", [8, 4])  # MHA and GQA
def test_ulysses_equals_full_attention(kvh):
    mesh = make_mesh(sequence=4, data=2)
    b, s, h, d = 2, 32, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, kvh, d))
    v = jax.random.normal(ks[2], (b, s, kvh, d))

    ref = eager_attention(q, k, v, is_causal=True)
    ulysses = make_ulysses_attention(mesh, "sequence", causal=True)
    with mesh:
        out = jax.jit(ulysses)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_with_padding_mask():
    mesh = make_mesh(sequence=4, data=2)
    b, s, h, d = 2, 16, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    kv_valid = jnp.asarray(np.tile([1] * 12 + [0] * 4, (b, 1)), jnp.int32)

    ref = eager_attention(q, k, v, kv_valid=kv_valid, is_causal=True)
    ulysses = make_ulysses_attention(mesh, "sequence", causal=True)
    with mesh:
        out = jax.jit(lambda *a: ulysses(a[0], a[1], a[2], kv_valid=a[3]))(q, k, v, kv_valid)
    np.testing.assert_allclose(np.asarray(out)[:, :12], np.asarray(ref)[:, :12], atol=2e-5)
