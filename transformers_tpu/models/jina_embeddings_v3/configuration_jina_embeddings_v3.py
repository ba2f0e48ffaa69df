"""Jina Embeddings V3 config (reference
models/jina_embeddings_v3/modular_jina_embeddings_v3.py:36-62): XLM-R
geometry moved onto rope (theta 20000) with a post-norm rope encoder."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class JinaEmbeddingsV3Config(PretrainedConfig):
    model_type = "jina_embeddings_v3"

    def __init__(self, vocab_size=250002, hidden_size=1024,
                 num_hidden_layers=24, num_attention_heads=16,
                 intermediate_size=4096, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=8194, type_vocab_size=1,
                 initializer_range=0.02, layer_norm_eps=1e-5,
                 rope_theta=20000.0, rope_scaling=None, pad_token_id=1,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.rope_theta = rope_theta
        self.rope_scaling = rope_scaling
        self.head_dim = hidden_size // num_attention_heads
        super().__init__(pad_token_id=pad_token_id, **kwargs)
