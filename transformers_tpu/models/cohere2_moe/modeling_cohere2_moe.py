"""Cohere2Moe (reference src/transformers/models/cohere2_moe/modular_cohere2_moe.py).

Cohere2's parallel-residual sliding/NoPE skeleton with a top-k MoE FFN:
stacked gate_up/down expert tensors (MixtralExperts layout), softmax-or-
sigmoid routing over the TOP-K scores (reference Cohere2MoeTopKRouter :53),
optional shared experts (sum or average combination), dense prefix layers,
and ``force_rope`` on dense layers when the prefix sliding pattern is 1."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.loading import CollectRule
from ...core.module import LayerNorm, Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.moe import dense_experts_forward
from ..cohere.modeling_cohere import CohereDecoderLayer, CohereMLP
from ..cohere2.modeling_cohere2 import (
    Cohere2Attention,
    Cohere2ForCausalLM,
    Cohere2Model,
    Cohere2ModelStandalone,
)
from .configuration_cohere2_moe import Cohere2MoeConfig


class Cohere2MoeExperts(Module):
    """Stacked gate_up/down tensors (reference MixtralExperts layout)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_experts
        self.hidden = config.hidden_size
        self.inter = config.intermediate_size

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        std = 0.02
        return {"gate_up_proj": jax.random.normal(
                    k1, (self.num_experts, 2 * self.inter, self.hidden),
                    self.param_dtype) * std,
                "down_proj": jax.random.normal(
                    k2, (self.num_experts, self.hidden, self.inter),
                    self.param_dtype) * std}


class Cohere2MoeSparseMoeBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.gate = Linear(config.hidden_size, config.num_experts, False,
                           kernel_init=normal_init(0.02), **kw)
        self.experts = Cohere2MoeExperts(config, **kw)
        if config.num_shared_experts > 0:
            import copy

            shared_cfg = copy.copy(config)
            shared_cfg.intermediate_size = (config.intermediate_size
                                            * config.num_shared_experts)
            self.shared_experts = CohereMLP(shared_cfg, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = self.gate(params["gate"], x).astype(jnp.float32)
        scores, idx = jax.lax.top_k(logits, self.top_k)
        if self.config.expert_selection_fn == "softmax":
            weights = jax.nn.softmax(scores, axis=-1)
        else:  # sigmoid
            weights = jax.nn.sigmoid(scores)
            if self.config.norm_topk_prob:
                weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        gate_up = params["experts"]["gate_up_proj"].astype(self.dtype)
        gate_w = jnp.swapaxes(gate_up[:, : self.config.intermediate_size], 1, 2)
        up_w = jnp.swapaxes(gate_up[:, self.config.intermediate_size :], 1, 2)
        down_w = jnp.swapaxes(params["experts"]["down_proj"].astype(self.dtype), 1, 2)
        out = dense_experts_forward(x.astype(self.dtype), gate_w, up_w, down_w,
                                    weights, idx, self.act)
        if self.config.num_shared_experts > 0:
            shared = self.shared_experts(params["shared_experts"], x)
            if self.config.shared_expert_combination_strategy == "sum":
                out = out + shared
            else:
                out = (out + shared) / 2
        return out.reshape(b, s, h).astype(hidden.dtype)


class Cohere2MoeAttention(Cohere2Attention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        force_rope = (config.mlp_layer_types[layer_idx] == "dense"
                      and config.prefix_dense_sliding_window_pattern == 1)
        self.apply_rope = (self.sliding_window is not None) or force_rope


class Cohere2MoeDecoderLayer(CohereDecoderLayer):
    attention_cls = Cohere2MoeAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if config.rms_norm_eps is not None:
            del self._children["input_layernorm"]
            object.__delattr__(self, "input_layernorm")
            self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        if config.mlp_layer_types[layer_idx] == "dense":
            import copy

            dense_cfg = copy.copy(config)
            if config.prefix_dense_intermediate_size is not None:
                dense_cfg.intermediate_size = config.prefix_dense_intermediate_size
            self.mlp = CohereMLP(dense_cfg, **kw)
        else:
            self.mlp = Cohere2MoeSparseMoeBlock(config, **kw)


class Cohere2MoeModel(Cohere2Model):
    decoder_layer_cls = Cohere2MoeDecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if config.rms_norm_eps is not None:
            del self._children["norm"]
            object.__delattr__(self, "norm")
            self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                                dtype=dtype, param_dtype=param_dtype)


class Cohere2MoeForCausalLM(Cohere2ForCausalLM):
    config_class = Cohere2MoeConfig
    model_cls = Cohere2MoeModel
    # hub checkpoints store per-expert gate/up/down (the reference save path
    # unstacks MixtralExperts); collect back into the stacked tensors
    _weight_rules = (
        CollectRule(
            pattern=r"^(?P<pre>.*\.experts)\.(?P<idx>\d+)\.(?P<part>gate_proj|up_proj)\.weight$",
            target=r"\g<pre>.gate_up_proj", parts=("gate_proj", "up_proj")),
        CollectRule(
            pattern=r"^(?P<pre>.*\.experts)\.(?P<idx>\d+)\.down_proj\.weight$",
            target=r"\g<pre>.down_proj"),
    )


class Cohere2MoeModelStandalone(Cohere2ModelStandalone):
    config_class = Cohere2MoeConfig
    model_cls = Cohere2MoeModel
