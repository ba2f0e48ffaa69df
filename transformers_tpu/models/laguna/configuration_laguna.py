"""Laguna config (reference models/laguna/modular_laguna.py:50-181)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LagunaConfig(PretrainedConfig):
    model_type = "laguna"

    def __init__(
        self,
        vocab_size=100352,
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=40,
        num_attention_heads=48,
        num_key_value_heads=8,
        head_dim=128,
        hidden_act="silu",
        max_position_embeddings=131072,
        initializer_range=0.02,
        rms_norm_eps=1e-6,
        use_cache=True,
        tie_word_embeddings=False,
        rope_parameters=None,
        sliding_window=512,
        layer_types=None,
        attention_bias=False,
        attention_dropout=0.0,
        gating=True,
        num_attention_heads_per_layer=None,
        mlp_layer_types=None,
        num_experts=256,
        num_experts_per_tok=8,
        moe_intermediate_size=512,
        shared_expert_intermediate_size=512,
        moe_routed_scaling_factor=1.0,
        moe_apply_router_weight_on_input=False,
        moe_router_logit_softcapping=0.0,
        output_router_logits=False,
        router_aux_loss_coef=0.001,
        **kwargs,
    ):
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
        self.sliding_window = sliding_window
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.gating = gating
        self.num_attention_heads_per_layer = num_attention_heads_per_layer
        self.mlp_layer_types = mlp_layer_types
        self.num_experts = num_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.moe_intermediate_size = moe_intermediate_size
        self.shared_expert_intermediate_size = shared_expert_intermediate_size
        self.moe_routed_scaling_factor = moe_routed_scaling_factor
        self.moe_apply_router_weight_on_input = moe_apply_router_weight_on_input
        self.moe_router_logit_softcapping = moe_router_logit_softcapping
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        # per-layer-type rope tables (reference default_rope_params :140):
        # full attention = theta 500k at HALF rotary; sliding = theta 10k full
        self.rope_parameters = rope_parameters or {
            "full_attention": {"rope_type": "default", "rope_theta": 500000.0,
                               "partial_rotary_factor": 0.5},
            "sliding_attention": {"rope_type": "default", "rope_theta": 10000.0,
                                  "partial_rotary_factor": 1.0},
        }
        if layer_types is None:
            # reference: every 4th layer full attention, rest sliding
            layer_types = ["full_attention" if (i + 1) % 4 == 0
                           else "sliding_attention"
                           for i in range(num_hidden_layers)]
        self.layer_types = layer_types
        if self.mlp_layer_types is None:
            self.mlp_layer_types = (["dense"]
                                    + ["sparse"] * (num_hidden_layers - 1))
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
