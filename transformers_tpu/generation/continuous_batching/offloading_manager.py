"""Request offloading for continuous batching.

TPU-native analog of reference generation/continuous_batching/
offloading_manager.py (:55 OffloadingManager): when the HBM page pool cannot
admit new work, a decoding victim is preempted by either

1. **host offload** — its live pages are copied to a preallocated host swap
   pool (one ``jax.device_get`` of the gathered pages per layer) and the HBM
   blocks freed; restoration scatters the pages back (one ``.at[blocks].set``
   per layer). Exact state is preserved, like the reference's pinned-CPU
   pool (:20-23).
2. **soft reset** — when the swap pool is also full, the pages are simply
   dropped; the request re-prefills over ``prompt + generated`` when
   readmitted (:19-21). The sampled-but-unwritten ``pending_token`` is kept,
   so the continuation is bit-identical for greedy decoding.

The swap pool is allocated once at init and tracked with a free set — no
dynamic host allocation at runtime (reference :22-23).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from .scheduler import RequestState, RequestStatus

logger = logging.get_logger(__name__)


class OffloadingManager:
    def __init__(self, cache, block_manager, *, swap_blocks: int = 0):
        self.bm = block_manager
        self.swap_blocks = swap_blocks
        self.offloaded: list[RequestState] = []
        if swap_blocks:
            k0 = cache.keys[0]
            shape = (swap_blocks,) + k0.shape[1:]
            self._swap_k = [np.zeros(shape, k0.dtype) for _ in cache.keys]
            self._swap_v = [np.zeros(shape, k0.dtype) for _ in cache.values]
            self._free_slots = list(range(swap_blocks - 1, -1, -1))
        else:
            self._swap_k = self._swap_v = None
            self._free_slots = []

    # ------------------------------------------------------------- offload
    def offload(self, req: RequestState, runner) -> str:
        """Preempt ``req``; returns the strategy used ("swap" or "reset")."""
        blocks = list(req.block_table)
        n_live = -(-req.context_len // self.bm.block_size) if req.context_len else 0
        live = blocks[:n_live]
        if self._swap_k is not None and len(self._free_slots) >= len(live):
            slots = [self._free_slots.pop() for _ in live]
            cache = runner.cache
            idx = jnp.asarray(live, jnp.int32)
            for layer in range(len(cache.keys)):
                self._swap_k[layer][slots] = np.asarray(
                    jax.device_get(cache.keys[layer][idx]))
                self._swap_v[layer][slots] = np.asarray(
                    jax.device_get(cache.values[layer][idx]))
            req.swap_slots = slots
            strategy = "swap"
        else:
            req.swap_slots = None
            strategy = "reset"
            req.prefilled = 0  # re-prefill prompt+generated on readmission
        self.bm.free(req.block_table)
        req.block_table = []
        req.status = RequestStatus.WAITING
        self.offloaded.append(req)
        logger.info(f"offloaded request {req.request_id} via {strategy}")
        return strategy

    # ------------------------------------------------------------- restore
    def try_restore(self, runner) -> Optional[RequestState]:
        """Re-admit the oldest offloaded request if blocks are available."""
        if not self.offloaded:
            return None
        req = self.offloaded[0]
        total = req.context_len + (req.max_new_tokens - len(req.generated_ids))
        needed = -(-total // self.bm.block_size)
        blocks = self.bm.allocate(needed)
        if blocks is None:
            return None
        self.offloaded.pop(0)
        req.block_table = blocks
        if getattr(req, "swap_slots", None) is not None:
            slots = req.swap_slots
            live = blocks[: len(slots)]
            cache = runner.cache
            idx = jnp.asarray(live, jnp.int32)
            new_keys, new_values = [], []
            for layer in range(len(cache.keys)):
                new_keys.append(cache.keys[layer].at[idx].set(
                    jnp.asarray(self._swap_k[layer][slots])))
                new_values.append(cache.values[layer].at[idx].set(
                    jnp.asarray(self._swap_v[layer][slots])))
            from dataclasses import replace

            runner.cache = replace(cache, keys=tuple(new_keys), values=tuple(new_values))
            self._free_slots.extend(slots)
            req.swap_slots = None
            req.status = RequestStatus.DECODING
        else:
            # soft reset: re-prefill prompt + generated from scratch
            req.prefilled = 0
            req.status = RequestStatus.PREFILLING
        logger.info(f"restored request {req.request_id}")
        return req

    def release(self, req: RequestState):
        """Free swap slots when an offloaded request is cancelled/failed."""
        slots = getattr(req, "swap_slots", None)
        if slots:
            self._free_slots.extend(slots)
            req.swap_slots = None
        if req in self.offloaded:
            self.offloaded.remove(req)
