"""Mixtral sparse-MoE decoder (reference
src/transformers/models/mixtral/modeling_mixtral.py).

Mistral attention skeleton + ``block_sparse_moe`` replacing the MLP.
Expert weights keep the checkpoint layout (``experts.N.w{1,2,3}``) in the
param tree for hub parity; at call time they are stacked to ``[E, in, out]``
and executed by the registry-dispatched MoE kernel (ops/moe.py — dense
batched-mm or ragged_dot grouped-mm, the reference's ExpertsInterface analog).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn, topk_routing
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..mistral.modeling_mistral import MistralAttention
from .configuration_mixtral import MixtralConfig


class MixtralExpertMLP(Module):
    """One expert: w1 (gate), w3 (up), w2 (down) — checkpoint layout
    (reference MixtralBlockSparseTop2MLP)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.w1 = Linear(config.hidden_size, config.intermediate_size, False, **kw)
        self.w2 = Linear(config.intermediate_size, config.hidden_size, False, **kw)
        self.w3 = Linear(config.hidden_size, config.intermediate_size, False, **kw)


class MixtralSparseMoeBlock(Module):
    """Router + experts (reference MixtralSparseMoeBlock)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_local_experts
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_local_experts, False, **kw)
        self.experts = [MixtralExpertMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_local_experts)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = self.gate(params["gate"], x)
        weights, idx = topk_routing(router_logits, self.top_k, renormalize=True)
        # Stack expert weights -> [E, in, out]; XLA fuses the concat into the
        # surrounding program (a repack pass removes it entirely — see
        # parallel/packing notes).
        w1 = jnp.stack([params["experts"][str(e)]["w1"]["weight"] for e in range(self.num_experts)])
        w2 = jnp.stack([params["experts"][str(e)]["w2"]["weight"] for e in range(self.num_experts)])
        w3 = jnp.stack([params["experts"][str(e)]["w3"]["weight"] for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w1.astype(self.dtype), w3.astype(self.dtype),
                         w2.astype(self.dtype), weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class MixtralDecoderLayer(LlamaDecoderLayer):
    attention_cls = MistralAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # Replace the dense MLP with the sparse MoE block under the
        # checkpoint name (block_sparse_moe).
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.block_sparse_moe = MixtralSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.block_sparse_moe(params["block_sparse_moe"], h)
        hidden = residual + h
        return hidden, cache


# LlamaMLP hyperparams unused by MixtralDecoderLayer, but the base-class
# __init__ builds one before we swap in the MoE block; keep construction cheap
# by reusing the Llama MLP class attribute (no params are created for deleted
# children).


class MixtralModel(LlamaModel):
    decoder_layer_cls = MixtralDecoderLayer


class MixtralForCausalLM(LlamaForCausalLM):
    config_class = MixtralConfig
    model_cls = MixtralModel


class MixtralModelStandalone(LlamaModelStandalone):
    config_class = MixtralConfig
    model_cls = MixtralModel
