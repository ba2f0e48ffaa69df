"""OLMo2 decoder (reference src/transformers/models/olmo2/modeling_olmo2.py).

Llama skeleton with q/k RMSNorm over the FULL projection (before the head
reshape) and norms applied to sublayer OUTPUTS (post-norm residual):
``x + post_attention_layernorm(attn(x))`` / ``x + post_ff_layernorm(mlp(x))``.
"""

from __future__ import annotations

from ...core.module import RMSNorm
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_olmo2 import Olmo2Config


class Olmo2Attention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        # full-projection norms applied BEFORE the head reshape; registered
        # under the checkpoint names but kept off the base class's per-head
        # q_norm/k_norm hook (which runs after the reshape)
        object.__setattr__(self, "_q_norm_full",
                           RMSNorm(self.num_heads * self.head_dim, config.rms_norm_eps, **kw))
        object.__setattr__(self, "_k_norm_full",
                           RMSNorm(self.num_kv_heads * self.head_dim, config.rms_norm_eps, **kw))
        self._children["q_norm"] = self._q_norm_full
        self._children["k_norm"] = self._k_norm_full

    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        q = self._q_norm_full(params["q_norm"], self.q_proj(params["q_proj"], hidden))
        k = self._k_norm_full(params["k_norm"], self.k_proj(params["k_proj"], hidden))
        v = self.v_proj(params["v_proj"], hidden)
        return (q.reshape(b, s, self.num_heads, self.head_dim),
                k.reshape(b, s, self.num_kv_heads, self.head_dim),
                v.reshape(b, s, self.num_kv_heads, self.head_dim))


class Olmo2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Olmo2Attention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # rename: post-norms only (no input norms)
        del self._children["input_layernorm"]
        object.__delattr__(self, "input_layernorm")
        self.post_feedforward_layernorm = self.make_norm(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h, cache = self.self_attn(params["self_attn"], hidden, cos, sin, attn_args, cache, cache_position)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.mlp(params["mlp"], hidden)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        return residual + h, cache


class Olmo2Model(LlamaModel):
    decoder_layer_cls = Olmo2DecoderLayer


class Olmo2ForCausalLM(LlamaForCausalLM):
    config_class = Olmo2Config
    model_cls = Olmo2Model


class Olmo2ModelStandalone(LlamaModelStandalone):
    config_class = Olmo2Config
    model_cls = Olmo2Model
