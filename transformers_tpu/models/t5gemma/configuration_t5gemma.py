"""T5Gemma config (reference models/t5gemma/modular_t5gemma.py:69-150):
encoder-decoder built from two Gemma2 module configs."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..gemma2.configuration_gemma2 import Gemma2Config


class T5GemmaModuleConfig(Gemma2Config):
    model_type = "t5gemma_module"

    def __init__(self, cross_attention_hidden_size=None, is_decoder=False,
                 **kwargs):
        super().__init__(**kwargs)
        self.cross_attention_hidden_size = cross_attention_hidden_size
        self.is_decoder = is_decoder


class T5GemmaConfig(PretrainedConfig):
    model_type = "t5gemma"
    sub_configs = {"encoder": T5GemmaModuleConfig,
                   "decoder": T5GemmaModuleConfig}

    def __init__(self, encoder=None, decoder=None, is_encoder_decoder=True,
                 dropout_rate=0.0, classifier_dropout_rate=0.0,
                 attention_dropout=0.0, tie_word_embeddings=True,
                 vocab_size=256000, **kwargs):
        if isinstance(encoder, dict):
            encoder = T5GemmaModuleConfig(**encoder)
        elif encoder is None:
            encoder = T5GemmaModuleConfig()
        if isinstance(decoder, dict):
            decoder = T5GemmaModuleConfig(**decoder)
        elif decoder is None:
            decoder = T5GemmaModuleConfig(**encoder.to_dict())
        decoder.is_decoder = True
        decoder.cross_attention_hidden_size = encoder.hidden_size
        self.encoder = encoder
        self.decoder = decoder
        self.vocab_size = vocab_size
        self.encoder.vocab_size = vocab_size
        self.decoder.vocab_size = vocab_size
        self.dropout_rate = dropout_rate
        self.classifier_dropout_rate = classifier_dropout_rate
        self.attention_dropout = attention_dropout
        super().__init__(is_encoder_decoder=is_encoder_decoder,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
