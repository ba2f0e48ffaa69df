"""Pix2Struct configs (reference src/transformers/models/pix2struct/configuration_pix2struct.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class Pix2StructTextConfig(PretrainedConfig):
    model_type = "pix2struct_text_model"
    attribute_map = {"hidden_size": "hidden_size", "num_attention_heads": "num_heads",
                     "num_hidden_layers": "num_layers"}

    def __init__(self, vocab_size=50244, hidden_size=768, d_kv=64, d_ff=2048,
                 num_layers=12, num_heads=12, relative_attention_num_buckets=32,
                 relative_attention_max_distance=128, dropout_rate=0.1,
                 layer_norm_epsilon=1e-6, initializer_factor=1.0,
                 dense_act_fn="gelu_new", decoder_start_token_id=0,
                 use_cache=False, pad_token_id=0, eos_token_id=1, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.d_kv = d_kv
        self.d_ff = d_ff
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        self.dropout_rate = dropout_rate
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_factor = initializer_factor
        self.dense_act_fn = dense_act_fn
        self.use_cache = use_cache
        kwargs.setdefault("tie_word_embeddings", False)
        super().__init__(pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         decoder_start_token_id=decoder_start_token_id, **kwargs)


class Pix2StructVisionConfig(PretrainedConfig):
    model_type = "pix2struct_vision_model"

    def __init__(self, hidden_size=768, patch_embed_hidden_size=768, d_ff=2048,
                 d_kv=64, num_hidden_layers=12, num_attention_heads=12,
                 dense_act_fn="gelu_new", layer_norm_eps=1e-6, dropout_rate=0.0,
                 attention_dropout=0.0, initializer_range=1e-10,
                 initializer_factor=1.0, seq_len=4096,
                 relative_attention_num_buckets=32,
                 relative_attention_max_distance=128, **kwargs):
        self.hidden_size = hidden_size
        self.patch_embed_hidden_size = patch_embed_hidden_size
        self.d_ff = d_ff
        self.d_kv = d_kv
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.dense_act_fn = dense_act_fn
        self.layer_norm_eps = layer_norm_eps
        self.dropout_rate = dropout_rate
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.initializer_factor = initializer_factor
        self.seq_len = seq_len
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        super().__init__(**kwargs)


class Pix2StructConfig(PretrainedConfig):
    model_type = "pix2struct"
    sub_configs = {"text_config": Pix2StructTextConfig,
                   "vision_config": Pix2StructVisionConfig}

    def __init__(self, text_config=None, vision_config=None,
                 initializer_factor=1.0, initializer_range=0.02, is_vqa=False,
                 **kwargs):
        kwargs.setdefault("tie_word_embeddings", False)
        kwargs.setdefault("is_encoder_decoder", True)
        self.text_config = Pix2StructTextConfig(**(text_config or {})) \
            if not isinstance(text_config, Pix2StructTextConfig) else text_config
        self.vision_config = Pix2StructVisionConfig(**(vision_config or {})) \
            if not isinstance(vision_config, Pix2StructVisionConfig) else vision_config
        self.initializer_factor = initializer_factor
        self.initializer_range = initializer_range
        self.is_vqa = is_vqa
        kwargs.setdefault("decoder_start_token_id", self.text_config.decoder_start_token_id)
        kwargs.setdefault("pad_token_id", self.text_config.pad_token_id)
        kwargs.setdefault("eos_token_id", self.text_config.eos_token_id)
        super().__init__(**kwargs)
