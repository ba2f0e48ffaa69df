"""Tensor-parallel continuous batching.

TPU-native analog of reference generation/continuous_batching/distributed.py
(DistributedHelper) and the TP coordination in continuous_api.py:131-190.

The reference runs one CB manager per rank and keeps the ranks in lockstep:
the helper broadcasts scheduler decisions, synchronizes failures across
processes, and restricts logit postprocessing to rank 0. Under GSPMD none of
that machinery is needed — JAX is single-controller, so ONE host scheduler
drives a jitted step whose arrays are sharded over the mesh:

- model params shard by the family ``_tp_plan`` (parallel/plans.py),
- every page pool shards over its KV-head axis (dimension 1 of the
  [blocks, KVH, block_size, D] layout) on the ``tensor`` mesh axis,
- per-step host inputs (tokens, block tables, slots) are replicated.

XLA inserts the same collectives it would for static-cache TP decode; the
scheduler, block manager, offloader and failure propagation are the
single-host versions, shared by construction rather than re-synchronized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ...parallel.plans import shard_params_with_plan
from .cache import PagedKVCache


class TPHelper:
    """Shards an engine's params + page pools over a mesh ``tensor`` axis."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def shard_model(self, model) -> None:
        """Reshard the model's loaded params in place by its tp plan."""
        model.params = shard_params_with_plan(model.params, model, self.mesh)

    def shard_cache(self, cache: PagedKVCache) -> PagedKVCache:
        kv_sharding = NamedSharding(self.mesh, P(None, "tensor", None, None))
        keys = tuple(jax.device_put(k, kv_sharding) for k in cache.keys)
        values = tuple(jax.device_put(v, kv_sharding) for v in cache.values)
        return PagedKVCache(keys=keys, values=values, block_size=cache.block_size,
                            num_blocks=cache.num_blocks)


def make_tp_engine(model, mesh: Mesh, **engine_kwargs):
    """ContinuousBatchingEngine whose params and page pools are TP-sharded.

    Usage::

        mesh = make_mesh(tensor=8)
        engine = make_tp_engine(model, mesh, num_blocks=512, block_size=32)
    """
    from .continuous_api import ContinuousBatchingEngine

    helper = TPHelper(mesh)
    helper.shard_model(model)
    engine = ContinuousBatchingEngine(model, **engine_kwargs)
    engine.runner.cache = helper.shard_cache(engine.runner.cache)
    engine.tp_helper = helper
    return engine
