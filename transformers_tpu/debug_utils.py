"""Numeric sanitizers + module-IO capture.

TPU-native analogs of two reference debug subsystems (SURVEY §5.1-5.2):
- ``DebugUnderflowOverflow`` (reference debug_utils.py:27): per-leaf
  abs-min/max tracing and inf/nan detection over activations and params.
  Torch uses forward hooks; here ``trace_module_stats`` wraps module
  ``__call__``s, and ``detect_overflow`` scans pytrees.
- ``model_addition_debugger_context`` (reference
  model_debugging_utils.py:393): record every submodule's outputs to nested
  JSON for diffing a port against the original — the logit-parity harness.
"""

from __future__ import annotations

import contextlib
import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.module import Module
from .utils import logging
from .utils.generic import flatten_dict

logger = logging.get_logger(__name__)


def detect_overflow(tree, name: str = "") -> list[str]:
    """Scan a pytree for inf/nan; returns offending leaf paths (reference
    debug_utils.py:300 ``detect_overflow``)."""
    bad = []
    flat = flatten_dict(tree) if isinstance(tree, dict) else {"value": tree}
    for key, leaf in flat.items():
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(f"{name}{'.' if name else ''}{key}")
    return bad


def tree_stats(tree) -> dict[str, dict]:
    """abs-min/max/mean per leaf (the reference's per-frame statistics)."""
    out = {}
    flat = flatten_dict(tree) if isinstance(tree, dict) else {"value": tree}
    for key, leaf in flat.items():
        if not hasattr(leaf, "dtype"):
            continue
        arr = np.abs(np.asarray(leaf, np.float32))
        out[key] = {"abs_min": float(arr.min()), "abs_max": float(arr.max()),
                    "mean": float(arr.mean()), "shape": list(leaf.shape)}
    return out


class DebugUnderflowOverflow:
    """Halt when any traced module output goes inf/nan (reference
    debug_utils.py:27). Usage::

        with DebugUnderflowOverflow(model):
            model(params, input_ids=...)
    """

    def __init__(self, model: Module, abort_on_overflow: bool = True, max_frames: int = 21):
        self.model = model
        self.abort = abort_on_overflow
        self.frames: list[dict] = []
        self.max_frames = max_frames
        self._originals: dict = {}

    def __enter__(self):
        seen_types = set()
        def walk(module, path):
            t = type(module)
            if t not in seen_types and t.__call__ is not Module.__call__:
                self._originals[t] = t.__call__
                t.__call__ = self._wrap_type(t)
                seen_types.add(t)
            for name, child in module.children.items():
                walk(child, f"{path}.{name}" if path else name)
        walk(self.model, "")
        return self

    def _wrap_type(self, t):
        original = self._originals[t]
        tracker = self

        def wrapped(mod_self, params, *args, **kwargs):
            out = original(mod_self, params, *args, **kwargs)
            leaf = out[0] if isinstance(out, tuple) else out
            leaf = getattr(leaf, "last_hidden_state", leaf)
            if hasattr(leaf, "dtype") and not isinstance(leaf, (int, float)) and \
                    jnp.issubdtype(leaf.dtype, jnp.floating) and not isinstance(leaf, jax.core.Tracer):
                arr = np.asarray(leaf)
                tracker.frames.append({"module": t.__name__, "abs_max": float(np.abs(arr).max())})
                tracker.frames = tracker.frames[-tracker.max_frames :]
                if not np.isfinite(arr).all():
                    msg = (f"inf/nan detected in output of {t.__name__}\n"
                           f"last frames:\n{json.dumps(tracker.frames, indent=2)}")
                    if tracker.abort:
                        raise FloatingPointError(msg)
                    logger.error(msg)
            return out

        return wrapped

    def __exit__(self, *exc):
        for t, original in self._originals.items():
            t.__call__ = original
        self._originals.clear()
        return False


@contextlib.contextmanager
def model_addition_debugger_context(model: Module, debug_path: str):
    """Record every module call's output summary to JSON (reference
    model_debugging_utils.py:393) — diff two frameworks' traces to localize
    a porting divergence."""
    records: list[dict] = []
    originals: dict = {}
    seen = set()

    def wrap_type(t):
        original = originals[t]

        def wrapped(mod_self, params, *args, **kwargs):
            out = original(mod_self, params, *args, **kwargs)
            leaf = out[0] if isinstance(out, tuple) else out
            leaf = getattr(leaf, "last_hidden_state", leaf)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating) \
                    and not isinstance(leaf, jax.core.Tracer):
                arr = np.asarray(leaf, np.float32)
                records.append({
                    "module": t.__name__, "shape": list(arr.shape),
                    "mean": float(arr.mean()), "std": float(arr.std()),
                    "first_values": arr.reshape(-1)[:8].tolist(),
                })
            return out

        return wrapped

    def walk(module):
        t = type(module)
        if t not in seen and t.__call__ is not Module.__call__:
            originals[t] = t.__call__
            t.__call__ = wrap_type(t)
            seen.add(t)
        for child in module.children.values():
            walk(child)

    walk(model)
    try:
        yield records
    finally:
        for t, original in originals.items():
            t.__call__ = original
        with open(debug_path, "w", encoding="utf-8") as f:
            json.dump(records, f, indent=2)


@contextlib.contextmanager
def capture_attentions(store: Optional[list] = None):
    """Record attention probabilities from the eager kernel (the analog of
    ``output_attentions=True`` / utils/attention_visualizer.py — hook-based
    capture instead of plumbing flags through every model). Eager mode only
    (under jit the values are tracers and are skipped)."""
    from .ops import attention as attention_mod

    records = store if store is not None else []
    original = attention_mod.eager_attention

    def capturing(q, k, v, bias=None, **kwargs):
        out = original(q, k, v, bias, **kwargs)
        # recompute probs cheaply for the record (eager/debug path only)
        if not isinstance(q, jax.core.Tracer):
            from .ops.attention import _render_bias

            b = bias if bias is not None else _render_bias(
                q, k, kwargs.get("q_positions"), kwargs.get("kv_valid"),
                kwargs.get("is_causal", True), kwargs.get("sliding_window"))
            h, kvh = q.shape[2], k.shape[2]
            kk = jnp.repeat(k, h // kvh, axis=2) if kvh != h else k
            scale = kwargs.get("scale") or q.shape[-1] ** -0.5
            scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                                kk.astype(jnp.float32)) * scale + b.astype(jnp.float32)
            records.append(np.asarray(jax.nn.softmax(scores, axis=-1)))
        return out

    prev = dict(attention_mod.ALL_ATTENTION_FUNCTIONS._global_mapping)
    for key, fn in list(attention_mod.ALL_ATTENTION_FUNCTIONS._global_mapping.items()):
        if fn is original:
            attention_mod.ALL_ATTENTION_FUNCTIONS._global_mapping[key] = capturing
    attention_mod.eager_attention = capturing
    try:
        yield records
    finally:
        attention_mod.eager_attention = original
        attention_mod.ALL_ATTENTION_FUNCTIONS._global_mapping.update(prev)
