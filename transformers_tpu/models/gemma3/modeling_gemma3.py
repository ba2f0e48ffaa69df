"""Gemma3 text decoder (reference models/gemma3/modeling_gemma3.py).

Gemma2 sandwich-norm skeleton plus: per-head zero-centered q/k RMSNorm and
DUAL rotary tables — global rope (scaled theta 1M) for full-attention layers,
local rope (theta 10k) for sliding layers — selected per layer type.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import RMSNorm
from ...ops.rope import compute_cos_sin, rope_inv_freq, _default_inv_freq
from ..gemma2.modeling_gemma2 import Gemma2DecoderLayer, Gemma2MLP
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_gemma3 import Gemma3TextConfig


class Gemma3Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, scale_offset=1.0, **kw)
        self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, scale_offset=1.0, **kw)


class Gemma3DecoderLayer(Gemma2DecoderLayer):
    attention_cls = Gemma3Attention
    mlp_cls = Gemma2MLP


class Gemma3TextModel(LlamaModel):
    decoder_layer_cls = Gemma3DecoderLayer
    scale_embeddings = True

    def __init__(self, config: Gemma3TextConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # local rope table for sliding layers (reference Gemma3TextModel:
        # rope_local_base_freq, no scaling)
        class _LocalCfg:
            rope_theta = config.rope_local_base_freq
            head_dim = config.head_dim
            hidden_size = config.hidden_size
            num_attention_heads = config.num_attention_heads
            partial_rotary_factor = 1.0
            rope_scaling = None

        self.local_inv_freq = _default_inv_freq(_LocalCfg)

    def compute_rope(self, position_ids):
        global_rope = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                      dtype=self.dtype)
        local_rope = compute_cos_sin(position_ids, self.local_inv_freq, 1.0, dtype=self.dtype)
        return {"global": global_rope, "local": local_rope}

    def rope_for_layer(self, rope, layer_idx):
        if self.config.layer_types[layer_idx] == "sliding_attention":
            return rope["local"]
        return rope["global"]


class Gemma3ForCausalLM(LlamaForCausalLM):
    config_class = Gemma3TextConfig
    model_cls = Gemma3TextModel


class Gemma3TextModelStandalone(LlamaModelStandalone):
    config_class = Gemma3TextConfig
    model_cls = Gemma3TextModel
