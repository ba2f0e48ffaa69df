"""HY-V3 (Hunyuan V3) config (reference models/hy_v3/modular_hy_v3.py:34-118)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class HYV3Config(PretrainedConfig):
    model_type = "hy_v3"

    def __init__(self, vocab_size=120832, hidden_size=4096,
                 intermediate_size=13312, num_hidden_layers=80,
                 num_attention_heads=64, num_key_value_heads=8, head_dim=128,
                 hidden_act="silu", max_position_embeddings=131072,
                 initializer_range=0.006, rms_norm_eps=1e-5, use_cache=True,
                 tie_word_embeddings=False, attention_bias=False,
                 attention_dropout=0.0, mlp_bias=False, num_experts=192,
                 num_experts_per_tok=8, num_shared_experts=1,
                 moe_intermediate_size=1536, router_scaling_factor=2.826,
                 enable_moe_fp32_combine=True, mlp_layer_types=None,
                 output_router_logits=False, rope_theta=11_158_840.0,
                 rope_scaling=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.mlp_bias = mlp_bias
        self.num_experts = num_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.num_shared_experts = num_shared_experts
        self.moe_intermediate_size = moe_intermediate_size
        self.router_scaling_factor = router_scaling_factor
        self.enable_moe_fp32_combine = enable_moe_fp32_combine
        # reference __post_init__: first layer dense, rest sparse
        if mlp_layer_types is None:
            mlp_layer_types = (["dense"] * (1 if num_hidden_layers > 0 else 0)
                               + ["sparse"] * max(num_hidden_layers - 1, 0))
        self.mlp_layer_types = mlp_layer_types
        self.output_router_logits = output_router_logits
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
