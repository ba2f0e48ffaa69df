"""BigBirdPegasus config (reference
src/transformers/models/bigbird_pegasus/configuration_bigbird_pegasus.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class BigBirdPegasusConfig(PretrainedConfig):
    model_type = "bigbird_pegasus"
    attribute_map = {"num_attention_heads": "encoder_attention_heads",
                     "hidden_size": "d_model",
                     "attention_probs_dropout_prob": "attention_dropout",
                     "num_hidden_layers": "encoder_layers"}

    def __init__(self, vocab_size=96103, max_position_embeddings=4096,
                 encoder_layers=16, encoder_ffn_dim=4096,
                 encoder_attention_heads=16, decoder_layers=16,
                 decoder_ffn_dim=4096, decoder_attention_heads=16,
                 encoder_layerdrop=0.0, decoder_layerdrop=0.0, use_cache=True,
                 is_encoder_decoder=True, activation_function="gelu_new",
                 d_model=1024, dropout=0.1, attention_dropout=0.0,
                 activation_dropout=0.0, init_std=0.02,
                 decoder_start_token_id=2, classifier_dropout=0.0,
                 scale_embedding=True, pad_token_id=0, bos_token_id=2,
                 eos_token_id=1, attention_type="block_sparse", block_size=64,
                 num_random_blocks=3, use_bias=False, **kwargs):
        self.vocab_size = vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.d_model = d_model
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_layers = encoder_layers
        self.encoder_attention_heads = encoder_attention_heads
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_layers = decoder_layers
        self.decoder_attention_heads = decoder_attention_heads
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.activation_function = activation_function
        self.init_std = init_std
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_layerdrop = decoder_layerdrop
        self.classifier_dropout = classifier_dropout
        self.use_cache = use_cache
        self.scale_embedding = scale_embedding
        self.attention_type = attention_type
        self.block_size = block_size
        self.num_random_blocks = num_random_blocks
        self.use_bias = use_bias
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)
