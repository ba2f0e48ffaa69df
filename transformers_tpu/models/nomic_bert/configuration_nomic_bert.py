"""Nomic BERT config (reference models/nomic_bert/modular_nomic_bert.py:35-77):
BERT geometry on rope (theta 1000) with SwiGLU MLP and unbiased projections."""

from __future__ import annotations

from ..jina_embeddings_v3.configuration_jina_embeddings_v3 import (
    JinaEmbeddingsV3Config,
)


class NomicBertConfig(JinaEmbeddingsV3Config):
    model_type = "nomic_bert"

    def __init__(self, vocab_size=30528, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="silu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
                 type_vocab_size=2, max_position_embeddings=2048,
                 rope_theta=1000.0, pad_token_id=0, tie_word_embeddings=True,
                 **kwargs):
        super().__init__(
            vocab_size=vocab_size, hidden_size=hidden_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            intermediate_size=intermediate_size, hidden_act=hidden_act,
            hidden_dropout_prob=hidden_dropout_prob,
            attention_probs_dropout_prob=attention_probs_dropout_prob,
            layer_norm_eps=layer_norm_eps, type_vocab_size=type_vocab_size,
            max_position_embeddings=max_position_embeddings,
            rope_theta=rope_theta, pad_token_id=pad_token_id,
            tie_word_embeddings=tie_word_embeddings, **kwargs)
