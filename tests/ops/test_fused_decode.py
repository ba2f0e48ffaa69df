"""Direct unit tests for the fused decode-step kernel
(ops/pallas/fused_decode.py): rope + cache write + attention in one pass.

Runs in interpret mode on CPU under the normal suite; on TPU
(``jax.default_backend() == "tpu"``) the same calls compile through Mosaic,
so running this file on hardware is the compiled-kernel proof.

Reference semantics: integrations/flash_paged.py:50
(``flash_attn_with_kvcache`` updates the cache inside the kernel).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from transformers_tpu.ops.pallas.fused_decode import (  # noqa: E402
    fused_decode_attention,
    fused_decode_supported,
)


def _reference(q, k_new, v_new, cos, sin, kc, vc, pos, start, kv_valid, scale):
    """f64 rope + cache write + masked attention."""
    b, _, h, d = q.shape
    kvh, s = kc.shape[1], kc.shape[2]
    g = h // kvh

    def rot(x):
        x1, x2 = np.split(np.asarray(x, np.float64), 2, axis=-1)
        return np.concatenate([-x2, x1], axis=-1)

    cs = np.asarray(cos, np.float64)[:, :, None]
    sn = np.asarray(sin, np.float64)[:, :, None]
    qr = np.asarray(q, np.float64) * cs + rot(q) * sn
    knr = np.asarray(k_new, np.float64) * cs + rot(k_new) * sn
    kc_ref = np.asarray(kc, np.float64).copy()
    vc_ref = np.asarray(vc, np.float64).copy()
    kc_ref[:, :, pos] = knr[:, 0]
    vc_ref[:, :, pos] = np.asarray(v_new, np.float64)[:, 0]
    qg = qr[:, 0].reshape(b, kvh, g, d)
    sc = np.einsum("bhgd,bhsd->bhgs", qg, kc_ref) * scale
    slots = np.arange(s)
    for bi in range(b):
        dead = (slots < int(start[bi])) | (slots > pos)
        dead |= (np.asarray(kv_valid)[bi] == 0) & (slots != pos)
        sc[bi][:, :, dead] = -1e30
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhgs,bhsd->bhgd", p, vc_ref).reshape(b, 1, h, d)
    return out, kc_ref, vc_ref


def _run(*, b, h, kvh, d, s, pos, dtype=jnp.float32, starts=None, holes=(),
         seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), dtype)
    k_new = jnp.asarray(rng.standard_normal((b, 1, kvh, d)), dtype)
    v_new = jnp.asarray(rng.standard_normal((b, 1, kvh, d)), dtype)
    ang = rng.standard_normal((b, 1, d))
    cos = jnp.asarray(np.cos(ang), dtype)
    sin = jnp.asarray(np.sin(ang), dtype)
    kc = jnp.asarray(rng.standard_normal((b, kvh, s, d)), dtype)
    vc = jnp.asarray(rng.standard_normal((b, kvh, s, d)), dtype)
    start = np.zeros((b,), np.int32) if starts is None else np.asarray(starts, np.int32)
    kv_valid = np.ones((b, s), np.int32)
    for (bi, si) in holes:
        kv_valid[bi, si] = 0

    assert fused_decode_supported(q, kc, d)
    scale = 1.0 / d ** 0.5
    out, nkc, nvc = fused_decode_attention(
        q, k_new, v_new, cos, sin, kc, vc, jnp.asarray(pos, jnp.int32),
        jnp.asarray(start), jnp.asarray(kv_valid), scale=scale)
    ref_out, ref_kc, ref_vc = _reference(q, k_new, v_new, cos, sin, kc, vc,
                                         pos, start, kv_valid, scale)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float64), ref_out, atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(nkc, np.float64)[:, :, pos],
                               ref_kc[:, :, pos], atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(nvc, np.float64)[:, :, pos],
                               ref_vc[:, :, pos], atol=tol, rtol=tol)


@pytest.mark.parametrize("h,kvh", [(4, 4), (8, 2), (16, 2)])  # GQA 1 / 4 / 8
def test_gqa_ratios_whole_slab(h, kvh):
    _run(b=3, h=h, kvh=kvh, d=128, s=64, pos=41, seed=h * 10 + kvh)


def test_first_token():
    # pos=0: only the new token is live; stale cache must not leak in.
    _run(b=2, h=8, kvh=4, d=128, s=64, pos=0, seed=1)


def test_left_padding_starts():
    _run(b=3, h=8, kvh=2, d=128, s=64, pos=50, starts=[0, 7, 23], seed=2)


def test_mask_holes():
    _run(b=2, h=4, kvh=4, d=128, s=64, pos=30, holes=[(0, 5), (1, 12), (1, 13)],
         seed=3)


def test_bf16():
    _run(b=4, h=8, kvh=2, d=128, s=128, pos=100, dtype=jnp.bfloat16, seed=4)


def test_chunked_long_context():
    # slab > 12MB forces the chunked per-row kernel (b*kvh*s*d*2*2 bytes)
    _run(b=4, h=8, kvh=8, d=128, s=1536, pos=1200, dtype=jnp.bfloat16,
         starts=[0, 100, 511, 512], seed=5)


def test_bench_geometry():
    # the exact Llama-3-8B bench shape (bench.py): B=8 KVH=8 G=4 D=128
    _run(b=8, h=32, kvh=8, d=128, s=224, pos=192, dtype=jnp.bfloat16, seed=6)
