"""GLM-4.5-MoE (reference src/transformers/models/glm4_moe/modeling_glm4_moe.py).

Llama skeleton with partial (0.5) concat-layout rotary, optional per-head
qk RMSNorm, o_proj bias-free, and the DeepSeek-V3 sigmoid group-limited MoE
(shared experts + e_score_correction_bias router) on layers past
``first_k_dense_replace`` — the MoE block is the shared DeepseekV3MoE."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ...core.module import RMSNorm
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MoE
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)


class Glm4MoeConfig(PretrainedConfig):
    model_type = "glm4_moe"

    def __init__(self, vocab_size=151552, hidden_size=4096, intermediate_size=10944,
                 num_hidden_layers=46, num_attention_heads=96, num_key_value_heads=8,
                 partial_rotary_factor=0.5, head_dim=128, hidden_act="silu",
                 max_position_embeddings=131072, initializer_range=0.02,
                 rms_norm_eps=1e-5, use_cache=True, tie_word_embeddings=False,
                 rope_theta=10000.0, rope_scaling=None, attention_bias=False,
                 attention_dropout=0.0, moe_intermediate_size=1408,
                 num_experts_per_tok=8, n_shared_experts=1, n_routed_experts=128,
                 routed_scaling_factor=1.0, n_group=1, topk_group=1,
                 first_k_dense_replace=1, norm_topk_prob=True, use_qk_norm=False,
                 pad_token_id=None, bos_token_id=None, eos_token_id=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.partial_rotary_factor = partial_rotary_factor
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.moe_intermediate_size = moe_intermediate_size
        self.num_experts_per_tok = num_experts_per_tok
        self.n_shared_experts = n_shared_experts
        self.n_routed_experts = n_routed_experts
        self.routed_scaling_factor = routed_scaling_factor
        self.n_group = n_group
        self.topk_group = topk_group
        self.first_k_dense_replace = first_k_dense_replace
        self.norm_topk_prob = norm_topk_prob
        self.use_qk_norm = use_qk_norm
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, tie_word_embeddings=tie_word_embeddings,
                         **kwargs)


class Glm4MoeAttention(LlamaAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if config.use_qk_norm:
            kw = dict(dtype=dtype, param_dtype=param_dtype)
            self.q_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)
            self.k_norm = RMSNorm(self.head_dim, config.rms_norm_eps, **kw)

    def build_projections(self, config, qkv_bias, o_bias, kw):
        super().build_projections(config, config.attention_bias, False, kw)


class Glm4MoeDecoderLayer(LlamaDecoderLayer):
    attention_cls = Glm4MoeAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.first_k_dense_replace:
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = DeepseekV3MoE(config, dtype=dtype, param_dtype=param_dtype)


class Glm4MoeModel(LlamaModel):
    decoder_layer_cls = Glm4MoeDecoderLayer


class Glm4MoeForCausalLM(LlamaForCausalLM):
    config_class = Glm4MoeConfig
    model_cls = Glm4MoeModel


class Glm4MoeModelStandalone(LlamaModelStandalone):
    config_class = Glm4MoeConfig
    model_cls = Glm4MoeModel
