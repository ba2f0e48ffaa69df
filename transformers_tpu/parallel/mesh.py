"""Device mesh construction.

TPU-native replacement for the reference's DeviceMesh/process-group bootstrap
(reference src/transformers/integrations/tensor_parallel.py:52
``initialize_tensor_parallelism``). One global ``jax.sharding.Mesh`` carries
every parallelism axis (SURVEY §2.8 "3D composition"): axis order is chosen so
the heaviest collectives (tensor) map to the innermost/fastest ICI dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

# Canonical axis names (SURVEY §7: one mesh, axes are the whole story)
DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
SEQUENCE_AXIS = "sequence"
EXPERT_AXIS = "expert"
PIPELINE_AXIS = "pipeline"


def make_mesh(
    *,
    data: int = 1,
    fsdp: int = 1,
    tensor: int = 1,
    sequence: int = 1,
    expert: int = 1,
    pipeline: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with the canonical axis order (pipeline, data, fsdp,
    expert, sequence, tensor) — tensor innermost so TP collectives ride the
    fastest ICI links; pipeline outermost since its ppermute traffic is one
    activation per microbatch step (the lightest collective)."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = {"pipeline": pipeline, "data": data, "fsdp": fsdp,
             "expert": expert, "sequence": sequence, "tensor": tensor}
    total = int(np.prod(list(sizes.values())))
    if total != len(devices):
        raise ValueError(f"mesh sizes {sizes} multiply to {total} != {len(devices)} devices")
    axis_names = tuple(sizes.keys())
    dev_array = np.array(devices).reshape(tuple(sizes.values()))
    return Mesh(dev_array, axis_names)


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Factor the device count into a sensible (data, fsdp, tensor) mesh."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    tensor = 1
    for cand in (4, 2):
        if n % cand == 0 and cand <= n:
            tensor = cand
            break
    rest = n // tensor
    fsdp = 2 if rest % 2 == 0 and rest > 1 else 1
    data = rest // fsdp
    return make_mesh(data=data, fsdp=fsdp, tensor=tensor, devices=devices)
