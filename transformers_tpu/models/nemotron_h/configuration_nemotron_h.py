"""NemotronH config (reference
src/transformers/models/nemotron_h/configuration_nemotron_h.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class NemotronHConfig(PretrainedConfig):
    model_type = "nemotron_h"

    def __init__(self, vocab_size=131072, hidden_size=4096, layers_block_type=None,
                 num_hidden_layers=None, tie_word_embeddings=False,
                 num_attention_heads=32, num_key_value_heads=8, head_dim=128,
                 max_position_embeddings=4096, attention_bias=False,
                 attention_dropout=0.0, sliding_window=None,
                 intermediate_size=21504, mlp_hidden_act="relu2", mlp_bias=False,
                 ssm_state_size=128, mamba_num_heads=128, mamba_head_dim=64,
                 mamba_hidden_act="silu", n_groups=8, conv_kernel=4, expand=2,
                 time_step_min=0.001, time_step_max=0.1,
                 time_step_limit=(0.0, float("inf")), time_step_floor=1e-4,
                 use_conv_bias=True, chunk_size=128, mamba_proj_bias=False,
                 n_routed_experts=8, n_shared_experts=1,
                 moe_intermediate_size=7688,
                 moe_shared_expert_intermediate_size=7688, moe_latent_size=None,
                 num_experts_per_tok=2, routed_scaling_factor=1.0, n_group=1,
                 topk_group=1, norm_topk_prob=True, use_bias=False,
                 initializer_range=0.02, layer_norm_epsilon=1e-5,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        if layers_block_type is None:
            n = num_hidden_layers or 8
            # default ratio: mostly mamba with sparse attention (the real
            # configs always ship an explicit list)
            layers_block_type = ["linear_attention" if i % 4 != 2 else "full_attention"
                                 for i in range(n)]
            layers_block_type = [t if i % 4 != 3 else "mlp"
                                 for i, t in enumerate(layers_block_type)]
        self.layers_block_type = list(layers_block_type)
        self.num_hidden_layers = len(self.layers_block_type)
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.max_position_embeddings = max_position_embeddings
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.sliding_window = sliding_window
        self.intermediate_size = intermediate_size
        self.mlp_hidden_act = mlp_hidden_act
        self.hidden_act = mlp_hidden_act  # alias for shared MLP modules
        self.mlp_bias = mlp_bias
        self.ssm_state_size = ssm_state_size
        self.mamba_num_heads = mamba_num_heads
        self.mamba_head_dim = mamba_head_dim
        self.mamba_hidden_act = mamba_hidden_act
        self.n_groups = n_groups
        self.conv_kernel = conv_kernel
        self.expand = expand
        self.time_step_min = time_step_min
        self.time_step_max = time_step_max
        # the v5 config serializer writes non-finite floats as
        # {"__float__": "Infinity"}; coerce back on load
        def _f(v):
            if isinstance(v, dict):
                v = v.get("__float__", v)
            return float(v)

        self.time_step_limit = tuple(_f(v) for v in time_step_limit)
        self.time_step_floor = time_step_floor
        self.use_conv_bias = use_conv_bias
        self.chunk_size = chunk_size
        self.mamba_proj_bias = mamba_proj_bias
        self.n_routed_experts = n_routed_experts
        self.n_shared_experts = n_shared_experts
        self.moe_intermediate_size = moe_intermediate_size
        self.moe_shared_expert_intermediate_size = moe_shared_expert_intermediate_size
        self.moe_latent_size = moe_latent_size
        self.num_experts_per_tok = num_experts_per_tok
        self.routed_scaling_factor = routed_scaling_factor
        self.n_group = n_group
        self.topk_group = topk_group
        self.norm_topk_prob = norm_topk_prob
        self.use_bias = use_bias
        self.initializer_range = initializer_range
        self.layer_norm_epsilon = layer_norm_epsilon
        self.rms_norm_eps = layer_norm_epsilon
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
