"""RemBERT config (reference src/transformers/models/rembert/configuration_rembert.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class RemBertConfig(PretrainedConfig):
    model_type = "rembert"

    def __init__(self, vocab_size=250300, hidden_size=1152, num_hidden_layers=32,
                 num_attention_heads=18, input_embedding_size=256,
                 output_embedding_size=1664, intermediate_size=4608, hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 classifier_dropout_prob=0.1, max_position_embeddings=512,
                 type_vocab_size=2, initializer_range=0.02, layer_norm_eps=1e-12,
                 use_cache=True, pad_token_id=0, bos_token_id=312, eos_token_id=313,
                 **kwargs):
        self.vocab_size = vocab_size
        self.input_embedding_size = input_embedding_size
        self.output_embedding_size = output_embedding_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.classifier_dropout_prob = classifier_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_cache = use_cache
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
