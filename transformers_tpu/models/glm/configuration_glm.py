"""GLM config (reference src/transformers/models/glm/configuration_glm.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class GlmConfig(PretrainedConfig):
    model_type = "glm"

    def __init__(
        self,
        vocab_size=151552,
        hidden_size=4096,
        intermediate_size=13696,
        num_hidden_layers=40,
        num_attention_heads=32,
        num_key_value_heads=2,
        head_dim=128,
        hidden_act="silu",
        attention_dropout=0.0,
        max_position_embeddings=131072,
        initializer_range=0.02,
        rms_norm_eps=1.5625e-07,
        use_cache=True,
        rope_theta=10000.0,
        partial_rotary_factor=None,
        attention_bias=True,
        pad_token_id=151329,
        eos_token_id=(151329, 151336, 151338),
        bos_token_id=None,
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
        self.attention_dropout = attention_dropout
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        # reference configuration_glm.py:77 — defaults to 0.5 for BC
        self.partial_rotary_factor = 0.5 if partial_rotary_factor is None else partial_rotary_factor
        self.attention_bias = attention_bias
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
