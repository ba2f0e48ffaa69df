"""Mixture-of-experts execution kernels.

TPU-native analog of reference src/transformers/integrations/moe.py
(``batched_mm_experts_forward`` :112, ``grouped_mm_experts_forward`` :377,
``ExpertsInterface`` :481). Two execution strategies, registry-dispatched:

- ``dense``: every expert computes every token; outputs combined by the
  routing weights. FLOP cost is E/k times the ideal but it is a single big
  batched einsum — MXU-friendly, zero gather/scatter, exactly reproducible.
  The right choice for small E or short sequences (decode steps).
- ``ragged``: tokens sorted by expert, ``jax.lax.ragged_dot`` grouped matmul
  (the megablox/gmm analog — SURVEY §2.8 EP row). O(T·k) FLOPs; the right
  choice for large-E prefill/training.

Both take stacked expert weights ``w_gate/w_up/w_down`` of shape
``[E, in, out]`` and routing (weights, indices) of shape ``[T, k]``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.generic import GeneralInterface


def topk_routing(router_logits: jnp.ndarray, top_k: int, *, renormalize: bool = True,
                 pre_softmax: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax-then-top-k routing (reference models/mixtral/modeling_mixtral.py
    MixtralSparseMoeBlock.forward). Returns (weights [T,k] float32, idx [T,k])."""
    logits = router_logits.astype(jnp.float32)
    if pre_softmax:
        probs = jax.nn.softmax(logits, axis=-1)
        weights, idx = jax.lax.top_k(probs, top_k)
    else:
        top_logits, idx = jax.lax.top_k(logits, top_k)
        weights = jax.nn.softmax(top_logits, axis=-1)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx


def dense_experts_forward(
    x: jnp.ndarray,           # [T, H]
    w_gate: jnp.ndarray,      # [E, H, I]
    w_up: jnp.ndarray,        # [E, H, I]
    w_down: jnp.ndarray,      # [E, I, H]
    routing_weights: jnp.ndarray,  # [T, k] (float32)
    routing_idx: jnp.ndarray,      # [T, k]
    act: Callable,
) -> jnp.ndarray:
    """All-experts batched matmul + weighted combine (reference
    integrations/moe.py:112 batched_mm_experts_forward)."""
    num_experts = w_gate.shape[0]
    # combine[T, E]: routing weight of expert e for token t (0 if unrouted)
    one_hot = jax.nn.one_hot(routing_idx, num_experts, dtype=jnp.float32)  # [T,k,E]
    combine = jnp.einsum("tk,tke->te", routing_weights.astype(jnp.float32), one_hot)

    gate = jnp.einsum("th,ehi->eti", x, w_gate)
    up = jnp.einsum("th,ehi->eti", x, w_up)
    inner = act(gate) * up
    out = jnp.einsum("eti,eih->eth", inner, w_down)
    return jnp.einsum("te,eth->th", combine.astype(out.dtype), out)


def ragged_experts_forward(
    x: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
    routing_weights: jnp.ndarray,
    routing_idx: jnp.ndarray,
    act: Callable,
) -> jnp.ndarray:
    """Sort-by-expert grouped matmul via ``jax.lax.ragged_dot`` (the
    megablox/ragged-dot kernel XLA lowers to a grouped MXU matmul;
    reference integrations/moe.py:377 grouped_mm_experts_forward)."""
    t, h = x.shape
    e = w_gate.shape[0]
    k = routing_idx.shape[1]
    flat_expert = routing_idx.reshape(-1)            # [T*k]
    flat_weight = routing_weights.reshape(-1)        # [T*k]
    order = jnp.argsort(flat_expert)                 # stable sort by expert
    token_of = order // k                            # source token per sorted slot
    xs = jnp.take(x, token_of, axis=0)               # [T*k, H] gathered tokens
    group_sizes = jnp.bincount(flat_expert, length=e)

    gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)
    up = jax.lax.ragged_dot(xs, w_up, group_sizes)
    inner = act(gate) * up
    out = jax.lax.ragged_dot(inner, w_down, group_sizes)  # [T*k, H]
    out = out * jnp.take(flat_weight, order)[:, None].astype(out.dtype)
    return jnp.zeros((t, h), out.dtype).at[token_of].add(out)


class ExpertsInterface(GeneralInterface):
    _global_mapping = {
        "dense": dense_experts_forward,
        "batched_mm": dense_experts_forward,
        "ragged": ragged_experts_forward,
        "grouped_mm": ragged_experts_forward,
    }


ALL_EXPERTS_FUNCTIONS = ExpertsInterface()


def get_experts_fn(implementation: Optional[str]):
    key = implementation or "dense"
    if key not in ALL_EXPERTS_FUNCTIONS:
        raise KeyError(f"Unknown experts implementation {key!r}; valid: {ALL_EXPERTS_FUNCTIONS.valid_keys()}")
    return ALL_EXPERTS_FUNCTIONS[key]
