"""Gated delta rule (DeltaNet with per-head log-decay), TPU-native.

Semantics match the reference fallback kernels
(models/qwen3_next/modeling_qwen3_next.py torch_chunk_gated_delta_rule :374
and torch_recurrent_gated_delta_rule :448): the linear-attention state
S_t = S_{t-1}·exp(g_t) + k_t ⊗ β_t·(v_t − S_{t-1}ᵀk_t·exp(g_t)) with
L2-normalized q/k and q scaled by D_k^{-1/2}.

TPU-native choices (vs the reference's FLA Triton kernels):
- the sequence is processed in chunks: all intra-chunk work is
  attention-shaped matmuls on the MXU, and only the inter-chunk state
  recurrence (L/chunk steps over [B,H,Dk,Dv]) is a ``lax.scan``;
- the reference's O(chunk²) in-chunk inversion loop is a single batched
  unit-lower-triangular solve (same matrix: T = (I − strict_tril(A))⁻¹);
- zero right-padding to a chunk multiple is exact (padded β=0 contributes
  nothing; padded g=0 leaves the decay cumsum flat).

All math in float32, matching the reference's explicit upcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x, eps: float = 1e-6):
    """FLA-style L2 normalization (reference l2norm :369)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def chunk_gated_delta_rule(query, key, value, g, beta, chunk_size: int = 64,
                           initial_state=None):
    """Chunked parallel form (reference torch_chunk_gated_delta_rule :374).

    query/key: [B, L, H, Dk]; value: [B, L, H, Dv]; g (log decay ≤ 0) and
    beta (write strength in (0,1)): [B, L, H]. Returns
    (out [B, L, H, Dv] float32, final_state [B, H, Dk, Dv] float32).
    """
    query = l2norm(query.astype(jnp.float32))
    key = l2norm(key.astype(jnp.float32))
    value = value.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    b, L, h, dk = key.shape
    dv = value.shape[-1]
    n = min(chunk_size, max(L, 1))
    pad = (n - L % n) % n
    if pad:
        padf = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        query, key, value, g, beta = map(padf, (query, key, value, g, beta))
    total = L + pad
    c = total // n

    # to [B, H, c, n, D]
    query = jnp.swapaxes(query, 1, 2).reshape(b, h, c, n, dk) * (dk ** -0.5)
    key = jnp.swapaxes(key, 1, 2).reshape(b, h, c, n, dk)
    value = jnp.swapaxes(value, 1, 2).reshape(b, h, c, n, dv)
    g = jnp.swapaxes(g, 1, 2).reshape(b, h, c, n)
    beta = jnp.swapaxes(beta, 1, 2).reshape(b, h, c, n)

    v_beta = value * beta[..., None]
    k_beta = key * beta[..., None]

    gcum = jnp.cumsum(g, axis=-1)                        # [B,H,c,n]
    # decay[i,j] = exp(gcum_i - gcum_j) for i >= j else 0
    decay = jnp.tril(jnp.exp(gcum[..., :, None] - gcum[..., None, :]))
    strict = jnp.tril(jnp.ones((n, n), bool), -1)
    # A strictly lower: -(k_beta kᵀ) ∘ decay; T = (I − A)⁻¹ (unit lower tri)
    A = jnp.where(strict, -(k_beta @ jnp.swapaxes(key, -1, -2)) * decay, 0.0)
    eye = jnp.eye(n, dtype=jnp.float32)
    T = jax.scipy.linalg.solve_triangular(eye - A, jnp.broadcast_to(eye, A.shape),
                                          lower=True, unit_diagonal=True)
    u = T @ v_beta                                       # value' in reference
    w = T @ (k_beta * jnp.exp(gcum)[..., None])          # k_cumdecay

    g_last = gcum[..., -1]                               # [B,H,c]
    q_decay = query * jnp.exp(gcum)[..., None]
    k_decay = key * jnp.exp(g_last[..., None] - gcum)[..., None]
    attn = jnp.tril((query @ jnp.swapaxes(key, -1, -2)) * decay)

    if initial_state is None:
        S0 = jnp.zeros((b, h, dk, dv), jnp.float32)
    else:
        S0 = initial_state.astype(jnp.float32)

    def step(S, xs):
        q_i, qd_i, kd_i, u_i, w_i, attn_i, gl_i = xs
        v_new = u_i - w_i @ S                            # [B,H,n,Dv]
        out_i = qd_i @ S + attn_i @ v_new
        S = S * jnp.exp(gl_i)[..., None, None] + jnp.swapaxes(kd_i, -1, -2) @ v_new
        return S, out_i

    # scan over the chunk axis (moved to front)
    xs = tuple(jnp.moveaxis(t, 2, 0) for t in (query, q_decay, k_decay, u, w, attn, g_last))
    S, outs = jax.lax.scan(step, S0, xs)
    out = jnp.moveaxis(outs, 0, 2).reshape(b, h, total, dv)[:, :, :L]
    return jnp.swapaxes(out, 1, 2), S


def recurrent_gated_delta_step(query, key, value, g, beta, state):
    """One decode step (reference torch_recurrent_gated_delta_rule :448).

    query/key [B, 1, H, Dk]; value [B, 1, H, Dv]; g/beta [B, 1, H];
    state [B, H, Dk, Dv]. Returns (out [B, 1, H, Dv] f32, new_state f32).
    """
    q = l2norm(query.astype(jnp.float32))[:, 0] * (query.shape[-1] ** -0.5)
    k = l2norm(key.astype(jnp.float32))[:, 0]         # [B,H,Dk]
    v = value.astype(jnp.float32)[:, 0]               # [B,H,Dv]
    gexp = jnp.exp(g.astype(jnp.float32))[:, 0]       # [B,H]
    b_t = beta.astype(jnp.float32)[:, 0]              # [B,H]

    S = state.astype(jnp.float32) * gexp[..., None, None]
    kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k)
    delta = (v - kv_mem) * b_t[..., None]
    S = S + k[..., None] * delta[..., None, :]
    out = jnp.einsum("bhkv,bhk->bhv", S, q)
    return out[:, None], S
