"""MVP config (reference src/transformers/models/mvp/configuration_mvp.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MvpConfig(PretrainedConfig):
    model_type = "mvp"
    attribute_map = {"hidden_size": "d_model",
                     "num_attention_heads": "encoder_attention_heads",
                     "num_hidden_layers": "encoder_layers"}

    def __init__(self, vocab_size=50267, max_position_embeddings=1024,
                 encoder_layers=12, encoder_ffn_dim=4096,
                 encoder_attention_heads=16, decoder_layers=12,
                 decoder_ffn_dim=4096, decoder_attention_heads=16,
                 activation_function="gelu", d_model=1024, dropout=0.1,
                 attention_dropout=0.0, activation_dropout=0.0, init_std=0.02,
                 classifier_dropout=0.0, scale_embedding=False, use_cache=True,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2,
                 is_encoder_decoder=True, decoder_start_token_id=2,
                 forced_eos_token_id=2, use_prompt=False, prompt_length=100,
                 prompt_mid_dim=800, **kwargs):
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
        self.classifier_dropout = classifier_dropout
        self.scale_embedding = scale_embedding
        self.use_cache = use_cache
        self.use_prompt = use_prompt
        self.prompt_length = prompt_length
        self.prompt_mid_dim = prompt_mid_dim
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         is_encoder_decoder=is_encoder_decoder,
                         decoder_start_token_id=decoder_start_token_id,
                         forced_eos_token_id=forced_eos_token_id, **kwargs)
