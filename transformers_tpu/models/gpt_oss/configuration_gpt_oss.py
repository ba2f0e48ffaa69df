"""GPT-OSS config (reference
src/transformers/models/gpt_oss/configuration_gpt_oss.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class GptOssConfig(PretrainedConfig):
    model_type = "gpt_oss"
    attribute_map = {"num_experts": "num_local_experts"}

    def __init__(
        self,
        num_hidden_layers=36,
        num_local_experts=128,
        vocab_size=201088,
        hidden_size=2880,
        intermediate_size=2880,
        head_dim=64,
        num_attention_heads=64,
        num_key_value_heads=8,
        sliding_window=128,
        rope_theta=150000.0,
        hidden_act="silu",
        initializer_range=0.02,
        max_position_embeddings=131072,
        rms_norm_eps=1e-5,
        rope_scaling=None,
        attention_dropout=0.0,
        num_experts_per_tok=4,
        router_aux_loss_coef=0.9,
        output_router_logits=False,
        use_cache=True,
        layer_types=None,
        attention_bias=True,
        tie_word_embeddings=False,
        **kwargs,
    ):
        self.num_hidden_layers = num_hidden_layers
        self.num_local_experts = num_local_experts
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.head_dim = head_dim
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.sliding_window = sliding_window
        self.rope_theta = rope_theta
        self.hidden_act = hidden_act
        self.initializer_range = initializer_range
        self.max_position_embeddings = max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.attention_dropout = attention_dropout
        self.num_experts_per_tok = num_experts_per_tok
        self.router_aux_loss_coef = router_aux_loss_coef
        self.output_router_logits = output_router_logits
        self.use_cache = use_cache
        self.layer_types = layer_types
        if self.layer_types is None:
            self.layer_types = [
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(num_hidden_layers)
            ]
        self.attention_bias = attention_bias
        self.rope_scaling = rope_scaling
        if self.rope_scaling is None:
            self.rope_scaling = {
                "rope_type": "yarn", "factor": 32.0, "beta_fast": 32.0,
                "beta_slow": 1.0, "truncate": False,
                "original_max_position_embeddings": 4096,
            }
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
