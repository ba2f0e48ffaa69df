"""LUKE config (reference models/luke/configuration_luke.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LukeConfig(PretrainedConfig):
    model_type = "luke"

    def __init__(self, vocab_size=50267, entity_vocab_size=500000,
                 hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 entity_emb_size=256, initializer_range=0.02,
                 layer_norm_eps=1e-12, use_entity_aware_attention=True,
                 classifier_dropout=None, pad_token_id=1, bos_token_id=0,
                 eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.entity_vocab_size = entity_vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.entity_emb_size = entity_emb_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_entity_aware_attention = use_entity_aware_attention
        self.classifier_dropout = classifier_dropout
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
