"""BioGPT config (reference src/transformers/models/biogpt/configuration_biogpt.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class BioGptConfig(PretrainedConfig):
    model_type = "biogpt"

    def __init__(self, vocab_size=42384, hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=1024, initializer_range=0.02,
                 layer_norm_eps=1e-12, scale_embedding=True, use_cache=True,
                 layerdrop=0.0, activation_dropout=0.0, pad_token_id=1,
                 bos_token_id=0, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.scale_embedding = scale_embedding
        self.use_cache = use_cache
        self.layerdrop = layerdrop
        self.activation_dropout = activation_dropout
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)

    # OPT-layer attribute views (the decoder layer is structurally OPT's)
    @property
    def ffn_dim(self):
        return self.intermediate_size

    @property
    def activation_function(self):
        return self.hidden_act

    @property
    def init_std(self):
        return self.initializer_range

    @property
    def do_layer_norm_before(self):
        return True

    @property
    def enable_bias(self):
        return True
