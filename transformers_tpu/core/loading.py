"""Streaming checkpoint -> param-pytree loading engine.

TPU-native analog of the reference's declarative weight-conversion loader
(reference: src/transformers/core_model_loading.py:83 ``ConversionOps``,
:1138 ``WeightConverter``, :1465 ``convert_and_load_state_dict_in_model``).

Design differences from the reference:
- Param trees are nested dicts whose dot-joined paths equal checkpoint keys,
  so the bulk of loading is key intersection + per-leaf layout transform.
- Leaf modules own their layout conversion (``Module.param_load_transform``),
  e.g. Linear transposes torch ``[out, in]`` -> ``[in, out]``.
- Model classes may declare extra ``WeightRule``s (regex renames, fusions,
  splits) for checkpoint-vintage compatibility.
- Each tensor is read zero-copy from the safetensors mmap, transformed on
  host, then ``jax.device_put`` with an optional ``NamedSharding`` so
  multi-chip placement happens *during* load (the reference's
  ``shard_and_distribute_module`` tensor_parallel.py:1509 analog).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging
from ..utils.generic import flatten_dict, set_nested
from ..utils.hub import (
    SAFE_WEIGHTS_INDEX_NAME,
    SAFE_WEIGHTS_NAME,
    WEIGHTS_INDEX_NAME,
    WEIGHTS_NAME,
    cached_file,
    get_checkpoint_shard_files,
    has_file,
)
from .safetensors import SafetensorsFile, save_file

logger = logging.get_logger(__name__)


@dataclass
class WeightRule:
    """A regex-keyed checkpoint transformation (ConversionOps analog).

    ``pattern`` matches checkpoint keys; ``rename`` rewrites them (regex
    substitution); ``transform`` maps the numpy array. ``collect`` rules that
    gather several source keys into one target (qkv fusion) provide
    ``sources`` patterns instead.
    """

    pattern: str
    rename: Optional[str] = None
    transform: Optional[Callable[[np.ndarray], np.ndarray]] = None
    # optional inverse applied at save time so our save_pretrained round-trips
    # to the original checkpoint key (e.g. raw nn.Parameter names)
    save_pattern: Optional[str] = None
    save_rename: Optional[str] = None

    def apply_name(self, key: str) -> str:
        if self.rename is None:
            return key
        return re.sub(self.pattern, self.rename, key)


@dataclass
class CollectRule:
    """Gather many checkpoint keys into ONE stacked param (the reference
    ConversionOps ``MergeModulelist`` analog, conversion_mapping.py).

    ``pattern`` is a regex with a named group ``idx`` (the list index) and
    optionally ``part``; ``target`` is the regex substitution producing the
    stacked key. Within one index, ``parts`` are concatenated in order along
    ``part_axis``; indices are then stacked along a new leading axis.

    Example — per-expert MoE weights into a 3D tensor::

        CollectRule(
            pattern=r"^(?P<pre>.*\\.experts)\\.(?P<idx>\\d+)\\.(?P<part>gate_proj|up_proj)\\.weight$",
            target=r"\\g<pre>.gate_up_proj",
            parts=("gate_proj", "up_proj"))
    """

    pattern: str
    target: str
    parts: tuple = ()
    part_axis: int = 0


@dataclass
class LoadReport:
    """Reference parity: utils/loading_report.py — missing/unexpected keys."""

    missing_keys: list[str] = field(default_factory=list)
    unexpected_keys: list[str] = field(default_factory=list)
    mismatched_keys: list[tuple[str, tuple, tuple]] = field(default_factory=list)

    def log(self, name: str):
        if self.unexpected_keys:
            logger.warning(f"Some weights of the checkpoint were not used when initializing {name}: "
                           f"{self.unexpected_keys[:16]}{'...' if len(self.unexpected_keys) > 16 else ''}")
        if self.missing_keys:
            logger.warning(f"Some weights of {name} were newly initialized (missing from checkpoint): "
                           f"{self.missing_keys[:16]}{'...' if len(self.missing_keys) > 16 else ''}")
        if self.mismatched_keys:
            logger.warning(f"Shape-mismatched keys skipped: {self.mismatched_keys}")


def resolve_checkpoint_files(path_or_repo: str) -> tuple[list[str], Optional[dict]]:
    """Find the weight file(s) for a checkpoint (single or sharded),
    preferring safetensors and falling back to legacy torch ``.bin``.

    Reference parity: modeling_utils.py:535 ``_get_resolved_checkpoint_files``
    (safetensors > sharded safetensors > pytorch_model.bin > sharded .bin).
    """
    if has_file(path_or_repo, SAFE_WEIGHTS_NAME):
        return [cached_file(path_or_repo, SAFE_WEIGHTS_NAME)], None
    if has_file(path_or_repo, SAFE_WEIGHTS_INDEX_NAME):
        return get_checkpoint_shard_files(path_or_repo, SAFE_WEIGHTS_INDEX_NAME)
    if has_file(path_or_repo, WEIGHTS_NAME):
        return [cached_file(path_or_repo, WEIGHTS_NAME)], None
    if has_file(path_or_repo, WEIGHTS_INDEX_NAME):
        return get_checkpoint_shard_files(path_or_repo, WEIGHTS_INDEX_NAME)
    raise OSError(
        f"No model weights found at {path_or_repo!r} (looked for {SAFE_WEIGHTS_NAME}, "
        f"{SAFE_WEIGHTS_INDEX_NAME}, {WEIGHTS_NAME}, {WEIGHTS_INDEX_NAME})."
    )


class TorchBinFile:
    """Legacy ``pytorch_model.bin`` shard reader (reference
    modeling_utils.py:319 ``load_state_dict`` torch branch). Tensors are
    deserialized once with ``torch.load(weights_only=True)``; bf16/f16 are
    upcast to f32 on extraction (exact) and recast at the load target dtype."""

    def __init__(self, path: str):
        import torch  # local import: torch is host-side only

        self._sd = torch.load(path, map_location="cpu", weights_only=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._sd = None

    def keys(self):
        return list(self._sd.keys())

    def get_tensor(self, key: str) -> np.ndarray:
        import torch

        t = self._sd[key]
        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.float()
        return t.numpy()


class DictSource:
    """In-memory state-dict adapter (GGUF dequant output, test fixtures)."""

    def __init__(self, tensors: dict):
        self._tensors = tensors

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def keys(self):
        return list(self._tensors.keys())

    def get_tensor(self, key: str) -> np.ndarray:
        return np.asarray(self._tensors[key])


def open_checkpoint_source(file):
    """Dispatch a checkpoint entry to its reader: path → safetensors/.bin,
    dict → in-memory, reader object → itself."""
    if isinstance(file, str):
        if file.endswith(".bin") or file.endswith(".pt") or file.endswith(".pth"):
            return TorchBinFile(file)
        return SafetensorsFile(file)
    if isinstance(file, dict):
        return DictSource(file)
    return file


def _np_cast(arr: np.ndarray, dtype) -> np.ndarray:
    target = np.dtype(jnp.dtype(dtype).name) if not isinstance(dtype, np.dtype) else dtype
    if arr.dtype == target:
        return arr
    return arr.astype(target)


def load_checkpoint_in_model(
    model,
    checkpoint_files: list[str],
    *,
    dtype: Any = None,
    shardings: Optional[dict[str, jax.sharding.Sharding]] = None,
    device: Optional[jax.Device] = None,
    keep_in_fp32_patterns: tuple[str, ...] = (),
) -> tuple[dict, LoadReport]:
    """Stream all checkpoint shards into a param pytree matching ``model``.

    ``model`` is a ``Module`` (tree walked for layout transforms and the
    expected-key set). ``shardings`` maps regex -> NamedSharding for
    load-time distribution. Returns (params, report).
    """
    spec = model.init_abstract()
    expected = flatten_dict(spec)
    expected_keys = set(expected.keys())

    all_rules = list(getattr(model, "_weight_rules", ()))
    rules: list[WeightRule] = [r for r in all_rules if isinstance(r, WeightRule)]
    collect_rules: list[CollectRule] = [r for r in all_rules if isinstance(r, CollectRule)]
    sharding_items = list((shardings or {}).items())

    params: dict = {}
    seen: set[str] = set()
    report = LoadReport()
    collect_buffers: dict = {}

    base_prefix = getattr(model, "base_model_prefix", "")

    def _fix_prefix(key: str) -> str:
        # Reference behavior: load a bare-base checkpoint into a task model and
        # vice versa by adding/stripping the base_model_prefix.
        if key in expected_keys:
            return key
        if base_prefix:
            pref = base_prefix + "."
            if key.startswith(pref) and key[len(pref):] in expected_keys:
                return key[len(pref):]
            if (pref + key) in expected_keys:
                return pref + key
        return key

    def _finalize(key: str, arr: np.ndarray) -> None:
        """Layout-convert, cast, shard, and store one assembled tensor."""
        path = key.split(".")
        owner = model.find_module(path[:-1])
        if owner is not None:
            arr = owner.param_load_transform(path[-1], arr)
        exp = expected[key]
        if tuple(arr.shape) != tuple(exp.shape):
            report.mismatched_keys.append((key, tuple(arr.shape), tuple(exp.shape)))
            return
        target_dtype = exp.dtype if dtype is None else dtype
        if any(re.search(p, key) for p in keep_in_fp32_patterns):
            target_dtype = jnp.float32
        if jnp.issubdtype(exp.dtype, jnp.integer) or exp.dtype == jnp.bool_:
            target_dtype = exp.dtype
        arr = _np_cast(np.asarray(arr), target_dtype)
        sharding = None
        for pat, sh in sharding_items:
            if re.search(pat, key):
                sharding = sh
                break
        if sharding is not None:
            value = jax.device_put(arr, sharding)
        elif device is not None:
            value = jax.device_put(arr, device)
        else:
            value = jnp.asarray(arr)
        set_nested(params, key, value)
        seen.add(key)

    for file in checkpoint_files:
        with open_checkpoint_source(file) as f:
            for ckpt_key in f.keys():
                crule_match = None
                for crule in collect_rules:
                    m = re.match(crule.pattern, ckpt_key)
                    if m:
                        crule_match = (crule, m)
                        break
                if crule_match is not None:
                    crule, m = crule_match
                    tkey = _fix_prefix(re.sub(crule.pattern, crule.target, ckpt_key))
                    slot = (int(m.group("idx")), m.groupdict().get("part"))
                    collect_buffers.setdefault((id(crule), tkey), (crule, {}))[1][slot] = \
                        np.array(f.get_tensor(ckpt_key))
                    continue
                key = ckpt_key
                # apply every matching rename in declaration order (reference
                # conversion_mapping semantics: WeightRenaming lists chain);
                # search anywhere — renames are often mid-key
                for rule in rules:
                    if re.search(rule.pattern, key):
                        key = rule.apply_name(key)
                key = _fix_prefix(key)
                if key not in expected_keys:
                    report.unexpected_keys.append(ckpt_key)
                    continue
                arr = f.get_tensor(ckpt_key)
                for rule in rules:
                    if rule.transform is not None and re.match(rule.pattern, ckpt_key):
                        arr = rule.transform(arr)
                _finalize(key, arr)

    for (_, tkey), (crule, slots) in collect_buffers.items():
        if tkey not in expected_keys:
            report.unexpected_keys.append(tkey)
            continue
        idxs = sorted({i for i, _ in slots})
        elems = []
        for i in idxs:
            if crule.parts:
                elems.append(np.concatenate([slots[(i, p)] for p in crule.parts],
                                            axis=crule.part_axis))
            else:
                elems.append(slots[(i, None)])
        _finalize(tkey, np.stack(elems, axis=0))

    report.missing_keys = sorted(expected_keys - seen)
    _ensure_module_slots(model, params)
    return params, report


def _ensure_module_slots(module, params: dict) -> None:
    """Insert empty dicts for parameter-free modules (weightless norms, fixed
    position tables) so runtime ``params[name]`` access never KeyErrors."""
    for name, child in module.children.items():
        sub = params.setdefault(name, {})
        if isinstance(sub, dict):
            _ensure_module_slots(child, sub)


def materialize_missing(model, params: dict, missing_keys: list[str], rng: Optional[jax.Array] = None) -> dict:
    """Randomly initialize any params absent from the checkpoint (tied or new heads)."""
    if not missing_keys:
        return params
    rng = rng if rng is not None else jax.random.key(0)
    full = model.init(rng)
    flat_full = flatten_dict(full)
    for key in missing_keys:
        set_nested(params, key, flat_full[key])
    return params


def save_params_as_safetensors(
    model,
    params: dict,
    save_directory: str,
    *,
    max_shard_size: int = 5 * 1024**3,
    tied_keys: tuple[str, ...] = (),
) -> None:
    """Save a param pytree hub-compatibly (torch layouts, sharded + index).

    Reference parity: modeling_utils.py:3278 ``save_pretrained`` (safetensors
    default, index json, tied-weight dedup via ``tied_keys``).
    """
    import json

    os.makedirs(save_directory, exist_ok=True)
    flat = flatten_dict(params)
    for k in tied_keys:
        flat.pop(k, None)
    # Convert to torch layouts on host.
    save_rules = [r for r in getattr(model, "_weight_rules", ())
                  if isinstance(r, WeightRule) and r.save_pattern is not None]
    out: dict[str, np.ndarray] = {}
    for key, value in flat.items():
        path = key.split(".")
        owner = model.find_module(path[:-1])
        arr = np.asarray(jax.device_get(value))
        if owner is not None:
            arr = np.asarray(owner.param_save_transform(path[-1], arr))
        for rule in save_rules:
            if re.search(rule.save_pattern, key):
                key = re.sub(rule.save_pattern, rule.save_rename, key)
        out[key] = arr

    total = sum(a.nbytes for a in out.values())
    if total <= max_shard_size:
        save_file(out, os.path.join(save_directory, SAFE_WEIGHTS_NAME), metadata={"format": "pt"})
        return
    # Shard
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for key, arr in out.items():
        if sizes[-1] + arr.nbytes > max_shard_size and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][key] = arr
        sizes[-1] += arr.nbytes
    n = len(shards)
    weight_map = {}
    for i, shard in enumerate(shards):
        name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(save_directory, name), metadata={"format": "pt"})
        for k in shard:
            weight_map[k] = name
    index = {"metadata": {"total_size": total}, "weight_map": weight_map}
    with open(os.path.join(save_directory, SAFE_WEIGHTS_INDEX_NAME), "w") as f:
        json.dump(index, f, indent=2, sort_keys=True)
