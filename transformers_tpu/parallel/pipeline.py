"""Pipeline parallelism: GPipe microbatch schedule inside one XLA program.

TPU-native replacement for the reference's pipeline-parallel integration
(reference: accelerate/DeepSpeed stage partitioning, send/recv of activations
between ranks). There is no host-side scheduler and no send/recv: the whole
schedule — microbatch injection, per-stage compute, activation hand-off, and
the pipeline bubble — is a single ``lax.scan`` under ``shard_map``, with
``lax.ppermute`` rotating activations one hop along the ``pipeline`` mesh
axis (nearest-neighbor ICI). XLA overlaps the permute with the next stage's
compute, and because everything is pure JAX, ``jax.grad`` differentiates
straight through the schedule — backward is the transposed permute sequence,
no hand-written 1F1B required.

Layout contract:
- layer params are STACKED along a leading layers dim and sharded over the
  ``pipeline`` axis: [L, ...] -> each stage holds [L/S, ...] (see
  ``stack_layer_params`` / ``pipeline_param_specs``);
- the batch is split into M microbatches [M, mb, ...]; utilization is
  M / (M + S - 1), the standard GPipe bubble.

Within a stage, the local [L/S, ...] layers run under a second ``lax.scan``
(homogeneous-layer requirement, which the llama-skeleton decoder satisfies).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import PIPELINE_AXIS


def stack_layer_params(layer_params: list) -> Any:
    """Stack per-layer param pytrees (e.g. ``params["model"]["layers"]["i"]``)
    into one pytree with a leading [L] dim, ready to shard over the pipeline
    axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def unstack_layer_params(stacked: Any, n_layers: int) -> list:
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_layers)]


def pipeline_param_specs(stacked: Any, axis: str = PIPELINE_AXIS) -> Any:
    """PartitionSpec pytree: leading (stacked-layers) dim over the pipeline
    axis, everything else replicated."""
    return jax.tree.map(lambda x: P(axis), stacked)


def pipeline_forward(
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    microbatches: jnp.ndarray,  # [M, mb, ...]
    mesh: Mesh,
    axis: str = PIPELINE_AXIS,
) -> jnp.ndarray:
    """Apply L stacked layers, pipelined over the mesh's ``axis``, to M
    microbatches. Returns outputs [M, mb, ...] (replicated over ``axis``).

    ``layer_fn(one_layer_params, x) -> x`` is ONE layer's forward; layers must
    be homogeneous (same pytree structure / shapes).
    """
    n_stages = dict(mesh.shape)[axis]
    n_micro = microbatches.shape[0]

    def staged(local_params, micro):
        # local_params: this stage's [L/S, ...] slice; micro: full [M, mb, ...]
        stage_idx = lax.axis_index(axis)

        def stage_fn(x):
            def one_layer(h, lp):
                return layer_fn(lp, h), None
            out, _ = lax.scan(one_layer, x, local_params)
            return out

        def step(carry, t):
            prev_y = carry
            if n_stages > 1:
                recv = lax.ppermute(
                    prev_y, axis, perm=[(i, i + 1) for i in range(n_stages - 1)])
            else:
                recv = prev_y
            # stage 0 injects microbatch t (clamped; bubble steps feed a
            # repeat of the last microbatch and their outputs are discarded)
            x0 = lax.dynamic_index_in_dim(
                micro, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False)
            x = jnp.where(stage_idx == 0, x0, recv)
            y = stage_fn(x)
            return y, y

        total_steps = n_micro + n_stages - 1
        y0 = jnp.zeros_like(micro[0])
        # jax>=0.7 requires explicit varying-axes on scan carries in shard_map
        if hasattr(jax.lax, "pcast"):
            y0 = jax.lax.pcast(y0, (axis,), to="varying")
        elif hasattr(jax.lax, "pvary"):
            y0 = jax.lax.pvary(y0, (axis,))
        _, ys = lax.scan(step, y0, jnp.arange(total_steps))
        # outputs live on the LAST stage at steps [S-1, S-1+M); zero elsewhere
        # and psum over the pipeline axis to replicate them.
        outs = ys[n_stages - 1:]
        outs = jnp.where(stage_idx == n_stages - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        staged, mesh=mesh,
        in_specs=(pipeline_param_specs(stacked_params, axis), P()),
        out_specs=P(),
    )
    return fn(stacked_params, microbatches)


def shard_stacked_params(stacked: Any, mesh: Mesh, axis: str = PIPELINE_AXIS) -> Any:
    """Place a stacked-layers pytree with the leading dim sharded over the
    pipeline axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked)
