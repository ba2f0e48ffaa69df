"""Generic utilities: pluggable function registries and output dataclasses.

``GeneralInterface`` mirrors the reference's registry base
(reference: src/transformers/utils/generic.py:1097) — a dict-like object with
class-level defaults plus instance-level user registrations, used for the
attention registry, mask registry, experts registry, etc.

``ModelOutput`` mirrors reference src/transformers/utils/generic.py ModelOutput
semantics (tuple-like + attribute access) but is a registered JAX pytree so
outputs flow through ``jax.jit`` unchanged.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from collections.abc import MutableMapping
from typing import Any, Callable, Optional

import jax


class GeneralInterface(MutableMapping):
    """Dict-like registry with class-level defaults + instance registrations.

    Subclasses set ``_global_mapping`` with built-in entries; instances can
    ``register`` extras without mutating the class.
    """

    _global_mapping: dict[str, Callable] = {}

    def __init__(self):
        self._local_mapping: dict[str, Callable] = {}

    def __getitem__(self, key):
        if key in self._local_mapping:
            return self._local_mapping[key]
        return self._global_mapping[key]

    def __setitem__(self, key, value):
        self._local_mapping[key] = value

    def __delitem__(self, key):
        del self._local_mapping[key]

    def __iter__(self):
        return iter({**self._global_mapping, **self._local_mapping})

    def __len__(self):
        return len({**self._global_mapping, **self._local_mapping})

    def __contains__(self, key):
        return key in self._local_mapping or key in self._global_mapping

    def valid_keys(self) -> list[str]:
        return sorted({**self._global_mapping, **self._local_mapping}.keys())

    @classmethod
    def register(cls, key: str, value: Callable):
        cls._global_mapping[key] = value

    def register_local(self, key: str, value: Callable):
        self._local_mapping[key] = value


_MODEL_OUTPUT_REGISTERED: set[type] = set()


class ModelOutput(OrderedDict):
    """Base class for typed model outputs (reference utils/generic.py ModelOutput).

    Subclasses are dataclasses; ``None`` fields are dropped. Registered as JAX
    pytrees so they can be returned from jitted functions.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        # Register each concrete subclass as a pytree once it's a dataclass.
        # Done lazily in __post_init__ because the dataclass decorator runs
        # after __init_subclass__.

    def __post_init__(self):
        cls = type(self)
        if cls not in _MODEL_OUTPUT_REGISTERED:
            _register_model_output_pytree(cls)
            _MODEL_OUTPUT_REGISTERED.add(cls)
        for field in dataclasses.fields(self):
            v = getattr(self, field.name)
            if v is not None:
                self[field.name] = v

    def __getitem__(self, k):
        if isinstance(k, str):
            return dict(self.items())[k]
        return self.to_tuple()[k]

    def __setattr__(self, name, value):
        if name in self.keys() and value is not None:
            super().__setitem__(name, value)
        super().__setattr__(name, value)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        super().__setattr__(key, value)

    def to_tuple(self) -> tuple:
        return tuple(self[k] for k in self.keys())


def _register_model_output_pytree(cls):
    def flatten(obj):
        keys = list(obj.keys())
        return [obj[k] for k in keys], keys

    def flatten_with_keys(obj):
        keys = list(obj.keys())
        return [(jax.tree_util.GetAttrKey(k), obj[k]) for k in keys], keys

    def unflatten(keys, values):
        return cls(**dict(zip(keys, values)))

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)


def can_return_tuple(fn):
    """Decorator placeholder for reference parity — outputs support .to_tuple()."""
    return fn


def flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    """Flatten a nested dict into dot-joined keys."""
    items = {}
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, dict):
            items.update(flatten_dict(v, new_key, sep=sep))
        else:
            items[new_key] = v
    return items


def unflatten_dict(d: dict, sep: str = ".") -> dict:
    """Inverse of flatten_dict."""
    out: dict = {}
    for k, v in d.items():
        parts = k.split(sep)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def get_nested(d: dict, key: str, sep: str = ".") -> Any:
    cur = d
    for p in key.split(sep):
        cur = cur[p]
    return cur


def set_nested(d: dict, key: str, value: Any, sep: str = ".") -> None:
    parts = key.split(sep)
    cur = d
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value
