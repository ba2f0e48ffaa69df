"""TrOCR config (reference src/transformers/models/trocr/configuration_trocr.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class TrOCRConfig(PretrainedConfig):
    model_type = "trocr"
    attribute_map = {"num_attention_heads": "decoder_attention_heads",
                     "hidden_size": "d_model", "num_hidden_layers": "decoder_layers"}

    def __init__(self, vocab_size=50265, d_model=1024, decoder_layers=12,
                 decoder_attention_heads=16, decoder_ffn_dim=4096,
                 activation_function="gelu", max_position_embeddings=512, dropout=0.1,
                 attention_dropout=0.0, activation_dropout=0.0, decoder_start_token_id=2,
                 init_std=0.02, decoder_layerdrop=0.0, use_cache=True,
                 scale_embedding=False, use_learned_position_embeddings=True,
                 layernorm_embedding=True, cross_attention_hidden_size=None,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.decoder_layers = decoder_layers
        self.decoder_attention_heads = decoder_attention_heads
        self.decoder_ffn_dim = decoder_ffn_dim
        self.activation_function = activation_function
        self.max_position_embeddings = max_position_embeddings
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.init_std = init_std
        self.initializer_range = init_std
        self.decoder_layerdrop = decoder_layerdrop
        self.use_cache = use_cache
        self.scale_embedding = scale_embedding
        self.use_learned_position_embeddings = use_learned_position_embeddings
        self.layernorm_embedding = layernorm_embedding
        self.cross_attention_hidden_size = cross_attention_hidden_size
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)
