"""ERNIE 4.5 decoder (reference src/transformers/models/ernie4_5/modular_ernie4_5.py):
Llama skeleton with GLM-style INTERLEAVED rotary and a single ``use_bias``
switch for all attention/MLP projections."""

from __future__ import annotations

from ...core.module import Linear
from ...ops.rope import apply_rotary_pos_emb_interleaved, compute_cos_sin_interleaved
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_ernie4_5 import Ernie4_5Config


class Ernie4_5Attention(LlamaAttention):
    rope_fn = staticmethod(apply_rotary_pos_emb_interleaved)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, config.use_bias, config.use_bias, kw)


class Ernie4_5MLP(LlamaMLP):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if config.use_bias:
            from ...core.module import normal_init

            kw = dict(dtype=dtype, param_dtype=param_dtype,
                      kernel_init=normal_init(config.initializer_range))
            self.gate_proj = Linear(config.hidden_size, config.intermediate_size, True, **kw)
            self.up_proj = Linear(config.hidden_size, config.intermediate_size, True, **kw)
            self.down_proj = Linear(config.intermediate_size, config.hidden_size, True, **kw)


class Ernie4_5DecoderLayer(LlamaDecoderLayer):
    attention_cls = Ernie4_5Attention
    mlp_cls = Ernie4_5MLP


class Ernie4_5Model(LlamaModel):
    decoder_layer_cls = Ernie4_5DecoderLayer

    def compute_rope(self, position_ids):
        return compute_cos_sin_interleaved(position_ids, self.inv_freq,
                                           self.attention_scaling, dtype=self.dtype)


class Ernie4_5ForCausalLM(LlamaForCausalLM):
    config_class = Ernie4_5Config
    model_cls = Ernie4_5Model


class Ernie4_5ModelStandalone(LlamaModelStandalone):
    config_class = Ernie4_5Config
    model_cls = Ernie4_5Model
