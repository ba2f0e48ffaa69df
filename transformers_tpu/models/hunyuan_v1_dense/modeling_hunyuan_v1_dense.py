"""HunYuanDenseV1 decoder (reference
src/transformers/models/hunyuan_v1_dense/modular_hunyuan_v1_dense.py).

Llama skeleton + per-head RMSNorms applied to q/k AFTER rope
(query_layernorm/key_layernorm) and the dynamic-NTK-*alpha* rope variant:
base = rope_theta * alpha^(dim / (dim - 2)).
"""

from __future__ import annotations

import numpy as np

from ...core.module import RMSNorm
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_hunyuan_v1_dense import HunYuanDenseV1Config


class HunYuanDenseV1Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.query_layernorm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
        self.key_layernorm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)

    def post_rope_qk(self, params, q, k):
        return (self.query_layernorm(params["query_layernorm"], q),
                self.key_layernorm(params["key_layernorm"], k))


class HunYuanDenseV1DecoderLayer(LlamaDecoderLayer):
    attention_cls = HunYuanDenseV1Attention


class HunYuanDenseV1Model(LlamaModel):
    decoder_layer_cls = HunYuanDenseV1DecoderLayer

    def __init__(self, config, *, dtype, param_dtype):
        scaling = getattr(config, "rope_scaling", None) or {}
        alpha = scaling.get("alpha")
        is_alpha = scaling.get("type", scaling.get("rope_type")) == "dynamic" and alpha
        if is_alpha:
            config.rope_scaling = None  # the generic dynamic handler needs "factor"
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if is_alpha:
            config.rope_scaling = scaling
            dim = (getattr(config, "head_dim", None)
                   or config.hidden_size // config.num_attention_heads)
            base = config.rope_theta * alpha ** (dim / (dim - 2))
            self.inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
            self.attention_scaling = 1.0


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    config_class = HunYuanDenseV1Config
    model_cls = HunYuanDenseV1Model


class HunYuanDenseV1ModelStandalone(LlamaModelStandalone):
    config_class = HunYuanDenseV1Config
    model_cls = HunYuanDenseV1Model
