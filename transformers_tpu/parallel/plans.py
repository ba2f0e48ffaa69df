"""Declarative parallelism plans -> PartitionSpecs.

TPU-native analog of the reference's ``_tp_plan`` execution engine
(reference src/transformers/integrations/tensor_parallel.py:1593
``apply_tensor_parallelism``, strategy classes :681-1269). The reference
wraps modules in DTensor parallel styles; here a plan is compiled to
``jax.sharding.NamedSharding`` per param and applied by ``jax.device_put`` —
XLA/GSPMD inserts every collective (SURVEY §2.8, §5.8).

Plan vocabulary (reference A.8, adapted to our [in, out] Linear layout):
- ``colwise``:  shard output dim  (Linear weight axis 1, bias axis 0)
- ``rowwise``:  shard input dim   (Linear weight axis 0, bias replicated)
- ``embed``:    shard vocab dim of an embedding table (axis 0)
- ``replicate``: explicit replication
- ``grouped_colwise``/``grouped_rowwise``: MoE expert tensors [E, in, out]
  (shard dim 2 / dim 1)
- ``expert``:   shard the expert dim of MoE tensors (axis 0) on the expert axis

FSDP composes orthogonally: every param additionally shards its largest
remaining free dim over the ``fsdp`` axis when divisible (ZeRO-3 analog —
XLA all-gathers at use, reference distributed/fsdp.py:187).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import logging
from ..utils.generic import flatten_dict, unflatten_dict
from .mesh import FSDP_AXIS, TENSOR_AXIS, EXPERT_AXIS

logger = logging.get_logger(__name__)


def _tp_dims(strategy: str, ndim: int) -> dict[int, str]:
    """Map a plan strategy to {dim_index: axis_kind} ('tp' or 'ep')."""
    if strategy == "colwise":
        return {ndim - 1: "tp"}  # weight [in, out] -> out; bias [out] -> out
    if strategy == "rowwise":
        return {0: "tp"} if ndim >= 2 else {}  # bias of rowwise layer replicated
    if strategy == "embed":
        return {0: "tp"}
    if strategy == "grouped_colwise":
        return {2: "tp"}
    if strategy == "grouped_rowwise":
        return {1: "tp"}
    if strategy == "expert":
        return {0: "ep"}
    if strategy == "replicate":
        return {}
    raise ValueError(f"Unknown plan strategy {strategy!r}")


def spec_for_param(
    key: str,
    shape: tuple[int, ...],
    plan: dict[str, str],
    mesh: Mesh,
    *,
    tensor_axis: str = TENSOR_AXIS,
    fsdp_axis: Optional[str] = FSDP_AXIS,
    expert_axis: str = EXPERT_AXIS,
) -> P:
    """Compile one param's PartitionSpec from the plan + mesh geometry."""
    ndim = len(shape)
    assignment: dict[int, str] = {}
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp_size = axis_sizes.get(tensor_axis, 1)
    ep_size = axis_sizes.get(expert_axis, 1)
    fsdp_size = axis_sizes.get(fsdp_axis, 1) if fsdp_axis else 1

    for pattern, strategy in plan.items():
        if re.fullmatch(pattern, key) or re.match(pattern + r"$", key):
            for dim, kind in _tp_dims(strategy, ndim).items():
                axis = tensor_axis if kind == "tp" else expert_axis
                size = tp_size if kind == "tp" else ep_size
                if size > 1 and shape[dim] % size == 0:
                    assignment[dim] = axis
                elif size > 1:
                    logger.warning_once(
                        f"param {key}: dim {dim} ({shape[dim]}) not divisible by {axis}={size}; replicating"
                    )
            break

    # FSDP: shard the largest free dim divisible by the fsdp axis.
    if fsdp_axis and fsdp_size > 1 and ndim >= 1:
        free = [d for d in range(ndim) if d not in assignment and shape[d] % fsdp_size == 0]
        if free:
            best = max(free, key=lambda d: shape[d])
            if shape[best] >= fsdp_size:
                assignment[best] = fsdp_axis

    return P(*[assignment.get(d) for d in range(ndim)])


def shard_params_with_plan(
    params: dict,
    model,
    mesh: Mesh,
    plan: Optional[dict[str, str]] = None,
    *,
    tensor_axis: str = TENSOR_AXIS,
    fsdp_axis: Optional[str] = FSDP_AXIS,
) -> dict:
    """Re-place an existing param pytree according to the plan.

    (Load-time sharding — passing ``shardings`` to from_pretrained — avoids
    the intermediate replicated copy; this is the post-hoc path.)
    """
    plan = plan if plan is not None else getattr(model, "_tp_plan", {})
    flat = flatten_dict(params)
    out = {}
    for key, value in flat.items():
        spec = spec_for_param(key, tuple(value.shape), plan, mesh,
                              tensor_axis=tensor_axis, fsdp_axis=fsdp_axis)
        out[key] = jax.device_put(value, NamedSharding(mesh, spec))
    return unflatten_dict(out)


def param_specs_with_plan(model, plan: Optional[dict[str, str]] = None, mesh: Optional[Mesh] = None,
                          *, tensor_axis: str = TENSOR_AXIS, fsdp_axis: Optional[str] = FSDP_AXIS) -> dict:
    """PartitionSpec pytree for a model (for pjit in/out shardings)."""
    plan = plan if plan is not None else getattr(model, "_tp_plan", {})
    spec_tree = {}
    flat_spec = flatten_dict(model.init_abstract())
    for key, leaf in flat_spec.items():
        spec_tree[key] = spec_for_param(key, tuple(leaf.shape), plan, mesh,
                                        tensor_axis=tensor_axis, fsdp_axis=fsdp_axis)
    return unflatten_dict(spec_tree)


def load_shardings_from_plan(model, mesh: Mesh, plan: Optional[dict[str, str]] = None) -> dict:
    """regex->NamedSharding table for from_pretrained(shardings=...) load-time
    distribution (reference shard_and_distribute_module, tensor_parallel.py:1509)."""
    plan = plan if plan is not None else getattr(model, "_tp_plan", {})
    table = {}
    flat_spec = flatten_dict(model.init_abstract())
    for key, leaf in flat_spec.items():
        spec = spec_for_param(key, tuple(leaf.shape), plan, mesh)
        table[re.escape(key) + "$"] = NamedSharding(mesh, spec)
    return table
