"""Model export to serialized StableHLO.

TPU-native analog of reference src/transformers/exporters/ (``HfExporter``
base :43, ONNX/ExecuTorch/dynamo exporters). The portable artifact format for
the XLA ecosystem is StableHLO via ``jax.export``: a version-stable,
runtime-loadable program (servable from C++/IFRT or any XLA runtime) — the
role ONNX plays for the reference.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)

EXPORT_NAME = "model.stablehlo"
EXPORT_CONFIG_NAME = "export_config.json"


def export_forward(model, params=None, *, batch_size: int = 1, seq_len: int = 128,
                   extra_inputs: Optional[dict] = None):
    """Export the model forward as a StableHLO program with the params baked
    in as constants (serving artifact). Returns a jax.export.Exported."""
    from jax import export as jax_export

    params = params if params is not None else model.params

    def forward(input_ids):
        return model(params, input_ids=input_ids).logits

    example = jax.ShapeDtypeStruct((batch_size, seq_len), jnp.int32)
    exported = jax_export.export(jax.jit(forward))(example)
    return exported


class StableHLOExporter:
    """reference exporters/base.py:43 HfExporter shape: validate -> export ->
    save (serialized bytes + a json manifest)."""

    def __init__(self, model, params=None):
        self.model = model
        self.params = params if params is not None else model.params

    def export(self, *, batch_size: int = 1, seq_len: int = 128):
        return export_forward(self.model, self.params, batch_size=batch_size, seq_len=seq_len)

    def save(self, save_directory: str, *, batch_size: int = 1, seq_len: int = 128) -> str:
        from jax import export as jax_export

        os.makedirs(save_directory, exist_ok=True)
        exported = self.export(batch_size=batch_size, seq_len=seq_len)
        blob = exported.serialize()
        path = os.path.join(save_directory, EXPORT_NAME)
        with open(path, "wb") as f:
            f.write(blob)
        manifest = {
            "format": "stablehlo-jax-export",
            "batch_size": batch_size,
            "seq_len": seq_len,
            "model_type": getattr(self.model.config, "model_type", None),
            "architecture": type(self.model).__name__,
        }
        with open(os.path.join(save_directory, EXPORT_CONFIG_NAME), "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
        logger.info(f"Exported StableHLO ({len(blob)} bytes) to {path}")
        return path


def load_exported(save_directory: str):
    """Deserialize an exported program; `.call(input_ids)` runs it."""
    from jax import export as jax_export

    with open(os.path.join(save_directory, EXPORT_NAME), "rb") as f:
        return jax_export.deserialize(f.read())
