"""LoRA adapters (PEFT integration).

TPU-native analog of reference src/transformers/integrations/peft.py
(``load_adapter`` wired into from_pretrained at modeling_utils.py:4373).
Adapters are extra leaves in the same param pytree: a Linear whose params
contain ``lora_A`` [in, r] / ``lora_B`` [r, out] adds
``scaling * (x @ A) @ B`` to its output — so jit/sharding/training all see
one tree. Hub-compatible with PEFT checkpoints (adapter_config.json +
adapter_model.safetensors).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils import logging
from .utils.generic import flatten_dict, get_nested, set_nested
from .utils.hub import cached_file

logger = logging.get_logger(__name__)

ADAPTER_CONFIG_NAME = "adapter_config.json"
ADAPTER_WEIGHTS_NAME = "adapter_model.safetensors"


@dataclass
class LoraConfig:
    """The PEFT LoraConfig subset we consume/produce."""

    r: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    target_modules: tuple = ("q_proj", "v_proj")
    use_rslora: bool = False

    @property
    def scaling(self) -> float:
        if self.use_rslora:
            return self.lora_alpha / (self.r**0.5)
        return self.lora_alpha / self.r

    def to_dict(self) -> dict:
        return {"peft_type": "LORA", "r": self.r, "lora_alpha": self.lora_alpha,
                "lora_dropout": self.lora_dropout,
                "target_modules": list(self.target_modules),
                "use_rslora": self.use_rslora}

    @classmethod
    def from_dict(cls, d: dict) -> "LoraConfig":
        return cls(r=d.get("r", 8), lora_alpha=d.get("lora_alpha", 16),
                   lora_dropout=d.get("lora_dropout", 0.0),
                   target_modules=tuple(d.get("target_modules", ())),
                   use_rslora=d.get("use_rslora", False))


def _target_weight_keys(params: dict, config: LoraConfig) -> list[str]:
    out = []
    for key in flatten_dict(params):
        if not key.endswith(".weight"):
            continue
        module_name = key.split(".")[-2]
        if module_name in config.target_modules:
            out.append(key[: -len(".weight")])
    return out


def init_lora_params(model, params: dict, config: LoraConfig, seed: int = 0) -> dict:
    """Insert fresh lora_A (kaiming-ish) / lora_B (zeros) leaves into the tree
    for every targeted Linear. Also stamps ``lora_scaling`` meta on the model."""
    rng = jax.random.key(seed)
    targets = _target_weight_keys(params, config)
    keys = jax.random.split(rng, max(len(targets), 1))
    for key, prefix in zip(keys, targets):
        w = get_nested(params, prefix + ".weight")
        in_dim, out_dim = w.shape[0], w.shape[-1]
        a = jax.random.normal(key, (in_dim, config.r), jnp.float32) * (1.0 / config.r)
        set_nested(params, prefix + ".lora_A", a.astype(w.dtype if w.dtype != jnp.int8 else jnp.float32))
        set_nested(params, prefix + ".lora_B", jnp.zeros((config.r, out_dim), jnp.float32))
        set_nested(params, prefix + ".lora_scaling",
                   jnp.asarray(config.scaling, jnp.float32))
    logger.info(f"Initialized LoRA (r={config.r}) on {len(targets)} modules")
    return params


def load_adapter(model, params: dict, adapter_path: str) -> dict:
    """Load a PEFT LoRA checkpoint into the param tree (reference
    integrations/peft.py load_adapter)."""
    from .core.safetensors import SafetensorsFile

    cfg_file = cached_file(adapter_path, ADAPTER_CONFIG_NAME)
    with open(cfg_file, encoding="utf-8") as f:
        config = LoraConfig.from_dict(json.load(f))
    weights_file = cached_file(adapter_path, ADAPTER_WEIGHTS_NAME)
    flat = flatten_dict(params)
    n = 0
    with SafetensorsFile(weights_file) as sf:
        for key in sf.keys():
            # base_model.model.<model path>.lora_{A,B}.weight
            m = re.match(r"^base_model\.model\.(.+)\.lora_(A|B)\.weight$", key)
            if not m:
                logger.warning_once(f"Skipping unrecognized adapter key {key}")
                continue
            path, which = m.group(1), m.group(2)
            if path + ".weight" not in flat:
                logger.warning_once(f"Adapter target {path} not found in model params")
                continue
            arr = np.asarray(sf.get_tensor(key))
            # torch lora_A [r, in] -> [in, r]; lora_B [out, r] -> [r, out]
            arr = arr.transpose()
            set_nested(params, f"{path}.lora_{which}", jnp.asarray(arr, jnp.float32))
            if which == "A":
                set_nested(params, f"{path}.lora_scaling",
                           jnp.asarray(config.scaling, jnp.float32))
                n += 1
    logger.info(f"Loaded LoRA adapter ({n} modules, r={config.r}) from {adapter_path}")
    return params


def merge_lora(params: dict) -> dict:
    """Fold adapters into the base weights and drop the lora leaves
    (reference PEFT merge_and_unload)."""
    flat = flatten_dict(params)
    for key in [k for k in flat if k.endswith("lora_A")]:
        prefix = key[: -len(".lora_A")]
        a = flat[key]
        b = flat[prefix + ".lora_B"]
        scaling = flat.get(prefix + ".lora_scaling", jnp.asarray(1.0))
        w = get_nested(params, prefix + ".weight")
        if w.dtype == jnp.int8:
            raise ValueError("Cannot merge LoRA into quantized weights; dequantize first")
        merged = w + (jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32)) * scaling).astype(w.dtype)
        set_nested(params, prefix + ".weight", merged)
        for suffix in (".lora_A", ".lora_B", ".lora_scaling"):
            node = get_nested(params, prefix)
            node.pop(suffix[1:], None)
    return params


def save_adapter(model, params: dict, save_directory: str, config: LoraConfig) -> None:
    """Write a PEFT-compatible adapter checkpoint."""
    from .core.safetensors import save_file

    os.makedirs(save_directory, exist_ok=True)
    flat = flatten_dict(params)
    out = {}
    for key in [k for k in flat if k.endswith("lora_A")]:
        prefix = key[: -len(".lora_A")]
        out[f"base_model.model.{prefix}.lora_A.weight"] = np.asarray(flat[key]).T
        out[f"base_model.model.{prefix}.lora_B.weight"] = np.asarray(flat[prefix + ".lora_B"]).T
    save_file(out, os.path.join(save_directory, ADAPTER_WEIGHTS_NAME), metadata={"format": "pt"})
    with open(os.path.join(save_directory, ADAPTER_CONFIG_NAME), "w", encoding="utf-8") as f:
        json.dump(config.to_dict(), f, indent=2)


def lora_trainable_mask(params: dict) -> dict:
    """optax mask: True only for lora leaves (freeze the base model)."""
    flat = flatten_dict(params)
    mask = {k: (k.endswith("lora_A") or k.endswith("lora_B")) for k in flat}
    from .utils.generic import unflatten_dict

    return unflatten_dict(mask)


def lora_optimizer(base_optimizer, params: dict):
    """Wrap an optax optimizer so ONLY lora leaves train (the PEFT
    freeze-base behavior): non-lora leaves get zero updates."""
    import optax

    mask = lora_trainable_mask(params)
    labels = jax.tree.map(lambda trainable: "train" if trainable else "freeze", mask)
    return optax.multi_transform({"train": base_optimizer, "freeze": optax.set_to_zero()},
                                 labels)
