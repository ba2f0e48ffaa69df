"""LED config (reference src/transformers/models/led/configuration_led.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LEDConfig(PretrainedConfig):
    model_type = "led"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "encoder_attention_heads",
                     "num_hidden_layers": "encoder_layers",
                     "attention_probs_dropout_prob": "attention_dropout"}

    def __init__(self, vocab_size=50265, max_encoder_position_embeddings=16384,
                 max_decoder_position_embeddings=1024, encoder_layers=12,
                 encoder_ffn_dim=4096, encoder_attention_heads=16, decoder_layers=12,
                 decoder_ffn_dim=4096, decoder_attention_heads=16,
                 encoder_layerdrop=0.0, decoder_layerdrop=0.0, use_cache=True,
                 is_encoder_decoder=True, activation_function="gelu", d_model=1024,
                 dropout=0.1, attention_dropout=0.0, activation_dropout=0.0,
                 init_std=0.02, decoder_start_token_id=2, classifier_dropout=0.0,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2,
                 attention_window=512, **kwargs):
        self.vocab_size = vocab_size
        self.max_encoder_position_embeddings = max_encoder_position_embeddings
        self.max_decoder_position_embeddings = max_decoder_position_embeddings
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
        self.initializer_range = init_std
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_layerdrop = decoder_layerdrop
        self.classifier_dropout = classifier_dropout
        self.use_cache = use_cache
        self.attention_window = attention_window
        self.scale_embedding = False
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, is_encoder_decoder=is_encoder_decoder,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)
