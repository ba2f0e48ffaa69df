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


# --------------------------------------------------------------------------
# Decode-loop export: the full generate program (bucketed prefill +
# lax.while_loop greedy decode with the KV cache as in-program state) as one
# StableHLO artifact, weights packaged alongside — the reference's
# ExecuTorch decode-with-cache export semantics
# (exporters/exporter_executorch.py) in XLA-ecosystem form.
# --------------------------------------------------------------------------

GENERATE_EXPORT_NAME = "generate.stablehlo"
GENERATE_WEIGHTS_NAME = "weights.safetensors"
GENERATE_CONFIG_NAME = "generate_export_config.json"


def export_generate(model, params=None, *, batch_size: int = 1,
                    prompt_bucket: int = 64, max_new: int = 32,
                    eos_token_id=None, pad_token_id: int = 0,
                    do_sample: bool = False, temperature: float = 1.0,
                    top_k: Optional[int] = None):
    """Export generate as ONE program. The returned Exported takes
    ``(params_pytree, prompt_ids [B, bucket], prompt_mask [B, bucket],
    key, max_new_rt scalar)`` and returns ids [B, bucket + max_new] —
    weights ride as arguments so the artifact stays small and the packaged
    safetensors can be swapped (fine-tunes reuse the program). With
    ``do_sample`` the prng key input drives in-program categorical sampling
    (temperature / top-k folded in as logits processors)."""
    from jax import export as jax_export

    from ..generation.logits_process import (
        LogitsProcessorList,
        TemperatureLogitsWarper,
        TopKLogitsWarper,
    )

    params = params if params is not None else model.params
    eos = eos_token_id if eos_token_id is not None else getattr(
        model.config, "eos_token_id", None)
    eos_ids = tuple(eos) if isinstance(eos, (list, tuple)) else (
        (int(eos),) if eos is not None else ())
    procs = []
    if do_sample and temperature not in (None, 1.0):
        procs.append(TemperatureLogitsWarper(float(temperature)))
    if do_sample and top_k:
        procs.append(TopKLogitsWarper(int(top_k)))
    fn = model._build_generate_fn(
        bucket=prompt_bucket, total_len=prompt_bucket + max_new,
        max_new=max_new, do_sample=do_sample, eos_ids=eos_ids,
        pad_id=int(pad_token_id), processors=LogitsProcessorList(procs),
        cache_dtype=model.dtype)
    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    ids_spec = jax.ShapeDtypeStruct((batch_size, prompt_bucket), jnp.int32)
    return jax_export.export(fn)(
        params_spec, ids_spec, ids_spec,
        jax.eval_shape(lambda: jax.random.key(0)),
        jax.ShapeDtypeStruct((), jnp.int32))


def save_generate_artifact(model, save_directory: str, params=None, *,
                           batch_size: int = 1, prompt_bucket: int = 64,
                           prompt_buckets=None, max_new: int = 32,
                           eos_token_id=None, pad_token_id: int = 0,
                           samplers=("greedy",), temperature: float = 1.0,
                           top_k: Optional[int] = None,
                           quantize: Optional[str] = None) -> str:
    """Serialize generate program(s) + weights + manifest. The artifact is
    runnable WITHOUT this package: ``jax.export.deserialize`` a program,
    rebuild the params pytree from the flat dot-keyed safetensors, call
    (see examples/run_exported_generate.py, a pure-JAX consumer).

    v2 surface (r4 verdict task 7):
    - ``prompt_buckets``: several prompt lengths exported into ONE artifact
      (``generate_b{bucket}_{sampler}.stablehlo`` each) with a program table
      in the manifest — the consumer picks the smallest bucket that fits.
    - ``samplers``: any of "greedy" / "sample"; the sampled program draws
      from the prng-key input in-program (temperature/top_k baked in).
    - ``quantize="int8"``: weights stored AND consumed int8 weight-only —
      the program is exported over the quantized tree (codes + scales), so
      the artifact is ~half the bytes and runs the quantized_dot path.
    """
    from safetensors.numpy import save_file

    from ..utils.generic import flatten_dict

    os.makedirs(save_directory, exist_ok=True)
    params = params if params is not None else model.params
    if quantize == "int8":
        from ..quantizers import Int8WeightOnlyConfig, quantize_params

        # quantize_params rewrites the tree IN PLACE — rebuild the dict
        # spine first so the caller's (often model.params) tree is untouched
        params = quantize_params(model, jax.tree.map(lambda x: x, params),
                                 Int8WeightOnlyConfig())
    elif quantize:
        raise ValueError(f"Unsupported quantize={quantize!r} (int8 only)")
    buckets = list(prompt_buckets or [prompt_bucket])
    programs = {}
    for bucket in buckets:
        for sampler in samplers:
            exported = export_generate(
                model, params, batch_size=batch_size, prompt_bucket=bucket,
                max_new=max_new, eos_token_id=eos_token_id,
                pad_token_id=pad_token_id, do_sample=sampler == "sample",
                temperature=temperature, top_k=top_k)
            name = (GENERATE_EXPORT_NAME if len(buckets) == 1
                    and samplers == ("greedy",)
                    else f"generate_b{bucket}_{sampler}.stablehlo")
            with open(os.path.join(save_directory, name), "wb") as f:
                f.write(exported.serialize())
            programs[name] = {"prompt_bucket": bucket, "sampler": sampler}
    # weights in OUR runtime layouts, flat dot-keys (no torch-layout save
    # transforms — this file feeds the exported programs, not the hub)
    flat = {k: np.asarray(jax.device_get(v))
            for k, v in flatten_dict(params).items()}
    save_file(flat, os.path.join(save_directory, GENERATE_WEIGHTS_NAME))
    eos = eos_token_id if eos_token_id is not None else getattr(
        model.config, "eos_token_id", None)
    first = next(iter(programs))
    manifest = {
        "format": "stablehlo-jax-export-generate",
        "batch_size": batch_size,
        "prompt_bucket": programs[first]["prompt_bucket"],
        "max_new": max_new,
        "pad_token_id": int(pad_token_id),
        "eos_token_id": eos,
        "quantize": quantize,
        "temperature": temperature,
        "top_k": top_k,
        "programs": programs,
        "model_type": getattr(model.config, "model_type", None),
        "architecture": type(model).__name__,
        "calling_convention": ["params_nested_dict", "prompt_ids[B,bucket] i32",
                               "prompt_mask[B,bucket] i32", "prng_key",
                               "max_new i32 scalar"],
    }
    with open(os.path.join(save_directory, GENERATE_CONFIG_NAME), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    logger.info(f"Exported {len(programs)} generate program(s) to {save_directory}")
    return os.path.join(save_directory, first)
