"""Pegasus-X config (reference src/transformers/models/pegasus_x/configuration_pegasus_x.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class PegasusXConfig(PretrainedConfig):
    model_type = "pegasus_x"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "encoder_attention_heads",
                     "num_hidden_layers": "encoder_layers"}

    def __init__(self, vocab_size=96103, max_position_embeddings=16384,
                 encoder_layers=16, encoder_ffn_dim=4096,
                 encoder_attention_heads=16, decoder_layers=16,
                 decoder_ffn_dim=4096, decoder_attention_heads=16,
                 use_cache=True, is_encoder_decoder=True,
                 activation_function="gelu", d_model=1024, dropout=0.1,
                 attention_dropout=0.0, activation_dropout=0.0, init_std=0.02,
                 decoder_layerdrop=0.0, encoder_layerdrop=0.0,
                 scale_embedding=True, pad_token_id=0, eos_token_id=1,
                 forced_eos_token_id=1, num_global_tokens=32, block_size=512,
                 stagger_local_blocks=True, **kwargs):
        self.vocab_size = vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.d_model = d_model
        self.encoder_layers = encoder_layers
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_layers = decoder_layers
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_attention_heads = decoder_attention_heads
        self.activation_function = activation_function
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.init_std = init_std
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_layerdrop = decoder_layerdrop
        self.use_cache = use_cache
        self.scale_embedding = scale_embedding
        self.num_global_tokens = num_global_tokens
        self.block_size = block_size
        self.stagger_local_blocks = stagger_local_blocks
        super().__init__(pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder,
                         decoder_start_token_id=kwargs.pop("decoder_start_token_id", 0),
                         forced_eos_token_id=forced_eos_token_id, **kwargs)
