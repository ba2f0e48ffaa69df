"""XGLM config (reference src/transformers/models/xglm/configuration_xglm.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class XGLMConfig(PretrainedConfig):
    model_type = "xglm"
    attribute_map = {
        "hidden_size": "d_model",
        "num_attention_heads": "attention_heads",
        "num_hidden_layers": "num_layers",
    }

    def __init__(self, vocab_size=256008, max_position_embeddings=2048, d_model=1024,
                 ffn_dim=4096, num_layers=24, attention_heads=16,
                 activation_function="gelu", dropout=0.1, attention_dropout=0.1,
                 activation_dropout=0.0, layerdrop=0.0, init_std=0.02,
                 scale_embedding=True, use_cache=True, decoder_start_token_id=2,
                 pad_token_id=1, bos_token_id=0, eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.max_position_embeddings = max_position_embeddings
        self.d_model = d_model
        self.ffn_dim = ffn_dim
        self.num_layers = num_layers
        self.attention_heads = attention_heads
        self.activation_function = activation_function
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.activation_dropout = activation_dropout
        self.layerdrop = layerdrop
        self.init_std = init_std
        self.scale_embedding = scale_embedding
        self.use_cache = use_cache
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)

    @property
    def do_layer_norm_before(self):
        return True

    @property
    def enable_bias(self):
        return True
