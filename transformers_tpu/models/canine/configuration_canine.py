"""CANINE config (reference src/transformers/models/canine/configuration_canine.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class CanineConfig(PretrainedConfig):
    model_type = "canine"

    def __init__(self, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.1,
                 attention_probs_dropout_prob=0.1,
                 max_position_embeddings=16384, type_vocab_size=16,
                 initializer_range=0.02, layer_norm_eps=1e-12, pad_token_id=0,
                 bos_token_id=0xE000, eos_token_id=0xE001, downsampling_rate=4,
                 upsampling_kernel_size=4, num_hash_functions=8,
                 num_hash_buckets=16384, local_transformer_stride=128, **kwargs):
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
        self.downsampling_rate = downsampling_rate
        self.upsampling_kernel_size = upsampling_kernel_size
        self.num_hash_functions = num_hash_functions
        self.num_hash_buckets = num_hash_buckets
        self.local_transformer_stride = local_transformer_stride
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
