"""NanoChat config (reference src/transformers/models/nanochat/configuration_nanochat.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class NanoChatConfig(PretrainedConfig):
    model_type = "nanochat"

    def __init__(self, vocab_size=50304, hidden_size=768, intermediate_size=8192,
                 num_hidden_layers=12, num_attention_heads=6,
                 num_key_value_heads=None, max_position_embeddings=2048,
                 hidden_act="relu2", attention_dropout=0.0, rms_norm_eps=1e-6,
                 initializer_range=0.02, use_cache=True,
                 final_logit_softcapping=15.0, attention_bias=False,
                 bos_token_id=0, eos_token_id=1, pad_token_id=1,
                 tie_word_embeddings=False, rope_theta=10000.0,
                 rope_scaling=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads
                                    if num_key_value_heads is not None
                                    else num_attention_heads)
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.attention_dropout = attention_dropout
        self.rms_norm_eps = rms_norm_eps
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.final_logit_softcapping = final_logit_softcapping
        self.attention_bias = attention_bias
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.head_dim = hidden_size // num_attention_heads
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id,
                         pad_token_id=pad_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
