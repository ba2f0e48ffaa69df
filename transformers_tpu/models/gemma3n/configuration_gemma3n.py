"""Gemma3n text config (reference
src/transformers/models/gemma3n/configuration_gemma3n.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Gemma3nTextConfig(PretrainedConfig):
    model_type = "gemma3n_text"

    def __init__(self, vocab_size=262400, vocab_size_per_layer_input=262144,
                 hidden_size=2048, hidden_size_per_layer_input=256,
                 intermediate_size=16384, num_hidden_layers=35,
                 num_attention_heads=8, num_key_value_heads=2, head_dim=256,
                 max_position_embeddings=32768, initializer_range=0.02,
                 rms_norm_eps=1e-6, use_cache=True, rope_theta=1000000.0,
                 rope_local_base_freq=10000.0, rope_scaling=None,
                 attention_bias=False, attention_dropout=0.0,
                 hidden_activation="gelu_pytorch_tanh", sliding_window=512,
                 layer_types=None, final_logit_softcapping=30.0,
                 altup_active_idx=0, altup_coef_clip=120.0,
                 altup_correct_scale=True, altup_num_inputs=4, laurel_rank=64,
                 num_kv_shared_layers=15, activation_sparsity_pattern=None,
                 tie_word_embeddings=True, **kwargs):
        self.vocab_size = vocab_size
        self.vocab_size_per_layer_input = vocab_size_per_layer_input
        self.hidden_size = hidden_size
        self.hidden_size_per_layer_input = hidden_size_per_layer_input
        if isinstance(intermediate_size, int):
            intermediate_size = [intermediate_size] * num_hidden_layers
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.rope_local_base_freq = rope_local_base_freq
        self.rope_scaling = rope_scaling
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.hidden_activation = hidden_activation
        self.sliding_window = sliding_window
        if layer_types is None:
            # every 5th layer is full attention (reference default)
            layer_types = ["full_attention" if (i + 1) % 5 == 0 else "sliding_attention"
                           for i in range(num_hidden_layers)]
        self.layer_types = layer_types
        self.final_logit_softcapping = final_logit_softcapping
        self.altup_active_idx = altup_active_idx
        self.altup_coef_clip = altup_coef_clip
        self.altup_correct_scale = altup_correct_scale
        self.altup_num_inputs = altup_num_inputs
        self.laurel_rank = laurel_rank
        self.num_kv_shared_layers = num_kv_shared_layers
        if activation_sparsity_pattern is None:
            activation_sparsity_pattern = [0.0] * num_hidden_layers
        self.activation_sparsity_pattern = activation_sparsity_pattern
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)
