"""BigBird config (reference src/transformers/models/big_bird/configuration_big_bird.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class BigBirdConfig(PretrainedConfig):
    model_type = "big_bird"

    def __init__(self, vocab_size=50358, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu_new",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=4096, type_vocab_size=2, initializer_range=0.02,
                 layer_norm_eps=1e-12, use_cache=True, pad_token_id=0, bos_token_id=1,
                 eos_token_id=2, sep_token_id=66, attention_type="block_sparse",
                 use_bias=True, rescale_embeddings=False, block_size=64,
                 num_random_blocks=3, classifier_dropout=None, **kwargs):
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
        self.use_cache = use_cache
        self.attention_type = attention_type
        self.use_bias = use_bias
        self.rescale_embeddings = rescale_embeddings
        self.block_size = block_size
        self.num_random_blocks = num_random_blocks
        self.classifier_dropout = classifier_dropout
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, sep_token_id=sep_token_id, **kwargs)
