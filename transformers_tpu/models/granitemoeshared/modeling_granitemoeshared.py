"""GraniteMoeShared decoder (reference
src/transformers/models/granitemoeshared/modular_granitemoeshared.py).

GraniteMoe plus a dense shared-expert MLP whose output is ADDED to the MoE
output each layer. The shared MLP packs gate|up into one ``input_linear``
[2*shared_inter, H] projection (chunked) like the stacked experts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..granitemoe.modeling_granitemoe import GraniteMoeDecoderLayer, GraniteMoeModel
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from .configuration_granitemoeshared import GraniteMoeSharedConfig


class GraniteMoeSharedMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.inter = config.shared_intermediate_size
        self.input_linear = Linear(config.hidden_size, 2 * self.inter, False, **kw)
        self.output_linear = Linear(self.inter, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        gu = self.input_linear(params["input_linear"], x)
        gate, up = gu[..., : self.inter], gu[..., self.inter:]
        return self.output_linear(params["output_linear"], self.act(gate) * up)


class GraniteMoeSharedDecoderLayer(GraniteMoeDecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.shared_intermediate_size:
            self.shared_mlp = GraniteMoeSharedMLP(config, dtype=dtype, param_dtype=param_dtype)
        else:
            self.shared_mlp = None

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        m = jnp.asarray(self.residual_multiplier, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        moe = self.block_sparse_moe(params["block_sparse_moe"], h)
        if self.shared_mlp is not None:
            moe = moe + self.shared_mlp(params["shared_mlp"], h)
        return residual + moe * m, cache


class GraniteMoeSharedModel(GraniteMoeModel):
    decoder_layer_cls = GraniteMoeSharedDecoderLayer


class GraniteMoeSharedForCausalLM(LlamaForCausalLM):
    config_class = GraniteMoeSharedConfig
    model_cls = GraniteMoeSharedModel

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.config.logits_scaling


class GraniteMoeSharedModelStandalone(LlamaModelStandalone):
    config_class = GraniteMoeSharedConfig
    model_cls = GraniteMoeSharedModel
