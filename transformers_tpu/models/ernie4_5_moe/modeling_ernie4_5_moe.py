"""ERNIE 4.5 MoE decoder (reference
src/transformers/models/ernie4_5_moe/modular_ernie4_5_moe.py).

Ernie4.5 attention/MLP (interleaved rope, use_bias switch) with MoE layers
on a configurable schedule (interval/start/end). Router: softmax probs,
top-k SELECTED by bias-corrected probs (``moe_statics``), weights are the
uncorrected probs renormalized with a clamped denominator; plus optional
shared experts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn
from ..ernie4_5.modeling_ernie4_5 import (
    Ernie4_5Attention,
    Ernie4_5DecoderLayer,
    Ernie4_5MLP,
    Ernie4_5Model,
)
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from .configuration_ernie4_5_moe import Ernie4_5_MoeConfig


class _ErnieExpertMLP(Module):
    def __init__(self, config, inter, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Linear

        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = config.use_bias
        self.gate_proj = Linear(config.hidden_size, inter, bias, **kw)
        self.up_proj = Linear(config.hidden_size, inter, bias, **kw)
        self.down_proj = Linear(inter, config.hidden_size, bias, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class _ErnieGate(Module):
    """gate.weight [E, H] float32 (torch layout kept)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.e = config.moe_num_experts
        self.h = config.hidden_size

    def init(self, rng):
        return {"weight": jnp.zeros((self.e, self.h), jnp.float32)}


class _ErnieStatics(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.e = config.moe_num_experts

    def init(self, rng):
        return {"e_score_correction_bias": jnp.zeros((1, self.e), jnp.float32)}


class Ernie4_5_MoeSparseBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.gate = _ErnieGate(config, **kw)
        self.moe_statics = _ErnieStatics(config, **kw)
        self.experts = [_ErnieExpertMLP(config, config.moe_intermediate_size, **kw)
                        for _ in range(config.moe_num_experts)]
        self.shared_experts = None
        if config.moe_num_shared_experts > 0:
            self.shared_experts = _ErnieExpertMLP(
                config, config.moe_intermediate_size * config.moe_num_shared_experts, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        logits = jnp.dot(x.astype(jnp.float32), params["gate"]["weight"].astype(jnp.float32).T)
        probs = jax.nn.softmax(logits, axis=-1)
        bias = params["moe_statics"]["e_score_correction_bias"].astype(jnp.float32).reshape(-1)
        _, idx = jax.lax.top_k(probs + bias[None, :], self.config.moe_k)
        w = jnp.take_along_axis(probs, idx, axis=-1)
        w = w / jnp.maximum(w.sum(-1, keepdims=True), self.config.moe_norm_min)
        e = self.config.moe_num_experts
        wg = jnp.stack([params["experts"][str(i)]["gate_proj"]["weight"] for i in range(e)])
        wu = jnp.stack([params["experts"][str(i)]["up_proj"]["weight"] for i in range(e)])
        wd = jnp.stack([params["experts"][str(i)]["down_proj"]["weight"] for i in range(e)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), wg.astype(self.dtype), wu.astype(self.dtype),
                         wd.astype(self.dtype), w, idx, self.act)
        out = out.reshape(b, s, h)
        if self.shared_experts is not None:
            out = out + self.shared_experts(params["shared_experts"], hidden)
        return out.astype(hidden.dtype)


class Ernie4_5_MoeDecoderLayer(Ernie4_5DecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        is_moe = (((layer_idx + 1) % config.moe_layer_interval == 0)
                  and config.moe_layer_start_index <= layer_idx <= config.moe_layer_end_index)
        if is_moe:
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = Ernie4_5_MoeSparseBlock(config, dtype=dtype, param_dtype=param_dtype)


class Ernie4_5_MoeModel(Ernie4_5Model):
    decoder_layer_cls = Ernie4_5_MoeDecoderLayer


class Ernie4_5_MoeForCausalLM(LlamaForCausalLM):
    config_class = Ernie4_5_MoeConfig
    model_cls = Ernie4_5_MoeModel


class Ernie4_5_MoeModelStandalone(LlamaModelStandalone):
    config_class = Ernie4_5_MoeConfig
    model_cls = Ernie4_5_MoeModel
