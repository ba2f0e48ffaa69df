"""Lightweight functional module system.

The TPU-native replacement for the reference's ``nn.Module`` usage
(reference: src/transformers/modeling_utils.py — torch modules with mutable
state). Here a :class:`Module` is a *stateless* description: it holds config
and hyperparameters, builds its children in ``__init__``, and exposes

- ``init(rng) -> params``: a nested-dict pytree of ``jax.Array`` leaves whose
  paths match the hub checkpoint names 1:1 (``model.layers.0.self_attn.
  q_proj.weight`` -> ``params["model"]["layers"]["0"]["self_attn"]["q_proj"]
  ["weight"]``), which makes safetensors loading a pure key-intersection.
- ``__call__(params, *args) -> outputs``: a pure function, safe under
  ``jax.jit`` / ``pjit`` / ``shard_map``.

Leaf modules own their checkpoint-layout conversion (e.g. ``Linear`` stores
kernels ``[in, out]`` and transposes the torch ``[out, in]`` layout at
load/save), so the weight loader needs no per-model regex tables for the
common cases — the module tree *is* the conversion plan.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict  # nested dict pytree of jax.Array


class Module:
    """Base class. Subclasses build children in __init__ via self.child = ...

    Attribute assignment of Module instances auto-registers them as children
    (in declaration order), so ``init`` and tree walks need no bookkeeping.
    """

    def __init__(self, *, dtype=jnp.float32, param_dtype=jnp.float32):
        object.__setattr__(self, "_children", {})
        self.dtype = dtype
        self.param_dtype = param_dtype

    def __setattr__(self, name: str, value: Any):
        if isinstance(value, Module):
            self._children[name] = value
        elif isinstance(value, (list, tuple)) and value and all(isinstance(v, Module) for v in value):
            # A list of layers registers as an indexed child dict ("0", "1", ...)
            self._children[name] = ModuleList(value)
            object.__setattr__(self, name, self._children[name])
            return
        object.__setattr__(self, name, value)

    @property
    def children(self) -> dict[str, "Module"]:
        return dict(self._children)

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array) -> Params:
        """Default init: split the rng across children. Leaves override."""
        params: Params = {}
        names = list(self._children.keys())
        if not names:
            return params
        keys = jax.random.split(rng, len(names))
        for key, name in zip(keys, names):
            # keep empty subtrees: weightless modules (parameter-free norms,
            # fixed position tables) still get their params[name] slot
            params[name] = self._children[name].init(key)
        return params

    def init_abstract(self) -> Params:
        """Shape/dtype spec tree without materializing arrays."""
        return jax.eval_shape(self.init, jax.random.key(0))

    # -------------------------------------------------------- load transforms
    def param_load_transform(self, name: str, arr: np.ndarray) -> np.ndarray:
        """Convert a checkpoint tensor (torch layout) to this module's layout."""
        return arr

    def param_save_transform(self, name: str, arr) -> Any:
        """Inverse of param_load_transform (our layout -> torch layout)."""
        return arr

    def find_module(self, path: list[str]) -> Optional["Module"]:
        """Walk the child tree along ``path`` (param dir names, no leaf name)."""
        mod: Module = self
        for p in path:
            child = mod._children.get(p)
            if child is None:
                return None
            mod = child
        return mod

    def __call__(self, params: Params, *args, **kwargs):
        raise NotImplementedError


class ModuleList(Module):
    """Indexed container; children named "0", "1", ... to mirror hub paths."""

    def __init__(self, modules):
        object.__setattr__(self, "_children", {})
        for i, m in enumerate(modules):
            self._children[str(i)] = m

    def __getitem__(self, i: int) -> Module:
        return self._children[str(i)]

    def __len__(self):
        return len(self._children)

    def __iter__(self):
        return iter(self._children.values())


# ---------------------------------------------------------------------------
# Initializers (reference: src/transformers/initialization.py — torch-init
# reimplementations; here as jax.nn.initializers-compatible callables)
# ---------------------------------------------------------------------------

def normal_init(stddev: float):
    def init(key, shape, dtype):
        return (jax.random.normal(key, shape, jnp.float32) * stddev).astype(dtype)

    return init


def zeros_init():
    def init(key, shape, dtype):
        return jnp.zeros(shape, dtype)

    return init


def ones_init():
    def init(key, shape, dtype):
        return jnp.ones(shape, dtype)

    return init


def kaiming_uniform_init(fan_in: int):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)

    return init


# ---------------------------------------------------------------------------
# Leaf modules
# ---------------------------------------------------------------------------


class Linear(Module):
    """Dense layer. Param key "weight" (hub parity) stored as [in, out] kernel;
    torch checkpoints store [out, in] — transposed at load/save.

    ``transpose_at_load=False`` handles GPT-2-style ``Conv1D`` checkpoints
    (reference src/transformers/pytorch_utils.py Conv1D) whose weights are
    already ``[in, out]``.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        *,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        kernel_init: Optional[Callable] = None,
        transpose_at_load: bool = True,
    ):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias
        self.kernel_init = kernel_init or normal_init(0.02)
        self.transpose_at_load = transpose_at_load

    def init(self, rng):
        kw, kb = jax.random.split(rng)
        params = {"weight": self.kernel_init(kw, (self.in_features, self.out_features), self.param_dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_features,), self.param_dtype)
        return params

    def param_load_transform(self, name, arr):
        if name == "weight" and self.transpose_at_load:
            return np.ascontiguousarray(arr.transpose())
        return arr

    def param_save_transform(self, name, arr):
        if name == "weight" and self.transpose_at_load:
            return arr.T
        return arr

    def materialize_weight(self, params):
        """Kernel in compute dtype; dequantizes weight-only int8/int4 leaves
        (quantizers/weight_only.py) — XLA fuses the dequant into the matmul."""
        w = params["weight"]
        if "weight_scale" in params:
            from ..quantizers.weight_only import dequantize_fp8, dequantize_int8, unpack_int4

            if w.dtype == jnp.float8_e4m3fn:
                return dequantize_fp8(w, params["weight_scale"], self.dtype)
            if w.shape[0] == self.in_features:
                return dequantize_int8(w, params["weight_scale"], self.dtype)
            return unpack_int4(w, params["weight_scale"], self.dtype)
        return w.astype(self.dtype)

    def __call__(self, params, x):
        x = x.astype(self.dtype)
        if "weight_scale" in params:
            # quantized runtime compute: codes stream from HBM at stored
            # width, scales applied to the dot OUTPUT (per-output-channel
            # scales commute with the contraction)
            from ..quantizers.weight_only import quantized_dot, unpack_int4_codes

            w = params["weight"]
            if w.dtype == jnp.int8 and w.shape[0] != self.in_features:
                w = unpack_int4_codes(w)
            y = quantized_dot(x, w, params["weight_scale"], self.dtype)
        else:
            y = jnp.dot(x, params["weight"].astype(self.dtype))
        if "lora_A" in params:
            # LoRA adapter leaves in the same tree (peft.py): rank-r update
            a = params["lora_A"].astype(self.dtype)
            b = params["lora_B"].astype(self.dtype)
            scaling = params.get("lora_scaling", 1.0)
            y = y + jnp.dot(jnp.dot(x, a), b) * jnp.asarray(scaling, self.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(self.dtype)
        return y


class Embedding(Module):
    """Token embedding. torch layout [num_embeddings, features] kept as-is."""

    def __init__(self, num_embeddings: int, features: int, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 embedding_init: Optional[Callable] = None):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_embeddings = num_embeddings
        self.features = features
        self.embedding_init = embedding_init or normal_init(0.02)

    def init(self, rng):
        return {"weight": self.embedding_init(rng, (self.num_embeddings, self.features), self.param_dtype)}

    def __call__(self, params, ids):
        return jnp.take(params["weight"], ids, axis=0).astype(self.dtype)

    def attend(self, params, x):
        """Tied-decoder logits: x @ E.T"""
        return jnp.dot(x.astype(self.dtype), params["weight"].astype(self.dtype).T)


class RMSNorm(Module):
    """Root-mean-square norm (reference models/llama/modeling_llama.py:53).

    Variance in float32 for numerical parity, scale applied in compute dtype.
    """

    def __init__(self, dim: int, eps: float = 1e-6, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 with_scale: bool = True, scale_offset: float = 0.0):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.eps = eps
        self.with_scale = with_scale
        # gemma-style (1 + weight) parameterization support
        self.scale_offset = scale_offset

    def init(self, rng):
        if not self.with_scale:
            return {}
        return {"weight": jnp.full((self.dim,), 1.0 - self.scale_offset, self.param_dtype)}

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
        h = h * jax.lax.rsqrt(var + self.eps)
        if self.with_scale:
            scale = params["weight"].astype(jnp.float32) + self.scale_offset
            h = h * scale
        return h.astype(self.dtype)


class LayerNorm(Module):
    """Standard layer norm (elementwise affine), torch-compatible."""

    def __init__(self, dim: int, eps: float = 1e-5, use_bias: bool = True, *, dtype=jnp.float32,
                 param_dtype=jnp.float32):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.eps = eps
        self.use_bias = use_bias

    def init(self, rng):
        params = {"weight": jnp.ones((self.dim,), self.param_dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.dim,), self.param_dtype)
        return params

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        h = h * params["weight"].astype(jnp.float32)
        if self.use_bias:
            h = h + params["bias"].astype(jnp.float32)
        return h.astype(self.dtype)


class BatchNorm(Module):
    """Inference-mode BatchNorm over [N, C, *spatial] using running statistics
    (torch BatchNorm2d.eval()). The running stats are ordinary params here —
    fine-tuning uses them FROZEN, exactly the reference DETR recipe
    (``replace_batch_norm`` -> DetrFrozenBatchNorm2d)."""

    def __init__(self, num_features: int, eps: float = 1e-5, *,
                 dtype=jnp.float32, param_dtype=jnp.float32):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_features = num_features
        self.eps = eps

    def init(self, rng):
        return {
            "weight": jnp.ones((self.num_features,), self.param_dtype),
            "bias": jnp.zeros((self.num_features,), self.param_dtype),
            "running_mean": jnp.zeros((self.num_features,), self.param_dtype),
            "running_var": jnp.ones((self.num_features,), self.param_dtype),
        }

    def __call__(self, params, x):
        shape = (1, self.num_features) + (1,) * (x.ndim - 2)
        mean = params["running_mean"].astype(jnp.float32).reshape(shape)
        var = params["running_var"].astype(jnp.float32).reshape(shape)
        w = params["weight"].astype(jnp.float32).reshape(shape)
        b = params["bias"].astype(jnp.float32).reshape(shape)
        h = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (h * w + b).astype(x.dtype)


class GroupNorm(Module):
    """torch-compatible GroupNorm over [N, C, *spatial]: normalize within each
    of ``num_groups`` channel groups across (channels-in-group, *spatial)."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5, *,
                 dtype=jnp.float32, param_dtype=jnp.float32):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps

    def init(self, rng):
        return {"weight": jnp.ones((self.num_channels,), self.param_dtype),
                "bias": jnp.zeros((self.num_channels,), self.param_dtype)}

    def __call__(self, params, x):
        n, c = x.shape[:2]
        spatial = x.shape[2:]
        h = x.astype(jnp.float32).reshape(n, self.num_groups, c // self.num_groups, *spatial)
        axes = tuple(range(2, h.ndim))
        mean = jnp.mean(h, axis=axes, keepdims=True)
        var = jnp.var(h, axis=axes, keepdims=True)
        h = ((h - mean) * jax.lax.rsqrt(var + self.eps)).reshape(n, c, *spatial)
        shape = (1, c) + (1,) * len(spatial)
        h = h * params["weight"].astype(jnp.float32).reshape(shape)
        h = h + params["bias"].astype(jnp.float32).reshape(shape)
        return h.astype(x.dtype)


class ConvTranspose(Module):
    """N-D transposed convolution, torch semantics and weight layout
    [in, out, *kernel]: out = (in-1)*stride - 2*padding + kernel. Implemented
    as VALID lax.conv_transpose (gradient-of-conv) followed by a crop of
    ``padding`` on each spatial edge."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 use_bias=True, output_padding=0, *, ndim=2, dtype=jnp.float32,
                 param_dtype=jnp.float32):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        to_tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) else (v,) * ndim
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_tuple(kernel_size)
        self.stride = to_tuple(stride)
        self.padding = to_tuple(padding)
        self.output_padding = to_tuple(output_padding)
        self.use_bias = use_bias
        self.ndim = ndim

    def init(self, rng):
        k = 1.0 / math.sqrt(self.in_channels * int(np.prod(self.kernel_size)))
        kw_, kb = jax.random.split(rng)
        params = {"weight": jax.random.uniform(
            kw_, (self.in_channels, self.out_channels, *self.kernel_size),
            self.param_dtype, -k, k)}
        if self.use_bias:
            params["bias"] = jax.random.uniform(kb, (self.out_channels,),
                                                self.param_dtype, -k, k)
        return params

    def __call__(self, params, x):
        spatial = "HWD"[: self.ndim] if self.ndim <= 3 else None
        lhs = "NC" + "HWD"[: self.ndim]
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), params["weight"].astype(self.dtype),
            strides=self.stride, padding="VALID",
            dimension_numbers=(lhs, "OI" + "HWD"[: self.ndim], lhs),
            transpose_kernel=True)
        # torch output_padding extends the RIGHT edge: crop p on the left and
        # p - output_padding on the right
        idx = (slice(None), slice(None)) + tuple(
            slice(p, y.shape[2 + i] - p + op)
            for i, (p, op) in enumerate(zip(self.padding, self.output_padding)))
        y = y[idx]
        if self.use_bias:
            b = params["bias"].astype(self.dtype)
            y = y + b.reshape((1, -1) + (1,) * self.ndim)
        return y


class Conv(Module):
    """N-D convolution keeping torch weight layout [out, in, *kernel] (OIHW),
    so checkpoint tensors load with zero transformation; XLA picks the
    physical layout at compile time."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size, stride=1, padding=0,
                 use_bias: bool = True, groups: int = 1, *, ndim: int = 2, dilation=1,
                 dtype=jnp.float32, param_dtype=jnp.float32):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        to_tuple = lambda v: tuple(v) if isinstance(v, (tuple, list)) else (v,) * ndim
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_tuple(kernel_size)
        self.stride = to_tuple(stride)
        self.padding = to_tuple(padding) if not isinstance(padding, str) else padding
        self.use_bias = use_bias
        self.groups = groups
        self.ndim = ndim
        self.dilation = to_tuple(dilation)

    def init(self, rng):
        kw, kb = jax.random.split(rng)
        fan_in = (self.in_channels // self.groups) * int(np.prod(self.kernel_size))
        shape = (self.out_channels, self.in_channels // self.groups, *self.kernel_size)
        params = {"weight": kaiming_uniform_init(fan_in)(kw, shape, self.param_dtype)}
        if self.use_bias:
            params["bias"] = kaiming_uniform_init(fan_in)(kb, (self.out_channels,), self.param_dtype)
        return params

    def __call__(self, params, x):
        # x: [N, C, *spatial] (torch convention kept at the model level)
        spatial = "DHW"[-self.ndim:] if self.ndim <= 3 else None
        lhs_spec = "NC" + spatial
        rhs_spec = "OI" + spatial
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            padding = [(p, p) for p in self.padding]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            params["weight"].astype(self.dtype),
            window_strides=self.stride,
            padding=padding,
            rhs_dilation=self.dilation,
            dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + params["bias"].astype(self.dtype).reshape((1, -1) + (1,) * self.ndim)
        return y
