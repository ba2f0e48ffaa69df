"""OLMo-Hybrid config (reference models/olmo_hybrid/modular_olmo_hybrid.py:44-148)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class OlmoHybridConfig(PretrainedConfig):
    model_type = "olmo_hybrid"

    def __init__(self, vocab_size=100352, hidden_size=3840,
                 intermediate_size=11008, num_hidden_layers=32,
                 num_attention_heads=30, num_key_value_heads=None,
                 hidden_act="silu", max_position_embeddings=65536,
                 initializer_range=0.02, rms_norm_eps=1e-6, use_cache=True,
                 tie_word_embeddings=False, attention_bias=False,
                 attention_dropout=0.0, layer_types=None,
                 linear_num_key_heads=None, linear_num_value_heads=None,
                 linear_key_head_dim=None, linear_value_head_dim=None,
                 linear_a_log_min=0.0, linear_a_log_max=16.0,
                 linear_dt_min=0.001, linear_dt_max=0.1,
                 linear_dt_init_floor=1e-4, linear_conv_kernel_dim=4,
                 linear_allow_neg_eigval=True, rope_theta=None,
                 rope_scaling=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads
                                    if num_key_value_heads is not None
                                    else num_attention_heads)
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        # reference __post_init__: every 4th layer full attention, at least one
        if layer_types is None:
            layer_types = ["full_attention" if i % 4 == 3 else "linear_attention"
                           for i in range(num_hidden_layers)]
            if "full_attention" not in layer_types:
                layer_types[-1] = "full_attention"
        self.layer_types = layer_types
        self.linear_num_key_heads = (linear_num_key_heads
                                     if linear_num_key_heads is not None
                                     else num_attention_heads)
        self.linear_num_value_heads = (linear_num_value_heads
                                       if linear_num_value_heads is not None
                                       else num_attention_heads)
        self.linear_key_head_dim = (linear_key_head_dim
                                    if linear_key_head_dim is not None
                                    else int(0.75 * hidden_size / self.linear_num_key_heads))
        self.linear_value_head_dim = (linear_value_head_dim
                                      if linear_value_head_dim is not None
                                      else 2 * self.linear_key_head_dim)
        self.linear_a_log_min = linear_a_log_min
        self.linear_a_log_max = linear_a_log_max
        self.linear_dt_min = linear_dt_min
        self.linear_dt_max = linear_dt_max
        self.linear_dt_init_floor = linear_dt_init_floor
        self.linear_conv_kernel_dim = linear_conv_kernel_dim
        self.linear_allow_neg_eigval = linear_allow_neg_eigval
        # released checkpoints run NoPE: rope_theta stays None
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
