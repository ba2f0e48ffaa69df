"""KOSMOS-2.5 configs (reference models/kosmos2_5/configuration_kosmos2_5.py):
a Pix2Struct-style patch-input vision encoder + the KOSMOS-2 text stack with
document-segment embeddings, bridged by a 2048-latent-query resampler."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig
from ..kosmos2.configuration_kosmos2 import Kosmos2TextConfig


class Kosmos2_5TextConfig(Kosmos2TextConfig):
    model_type = "kosmos_2_5_text_model"

    def __init__(self, vocab_size=108481, max_position_embeddings=4096,
                 embed_dim=1536, layers=24, ffn_dim=6144, attention_heads=16,
                 attention_dropout=0.0, **kwargs):
        super().__init__(vocab_size=vocab_size,
                         max_position_embeddings=max_position_embeddings,
                         embed_dim=embed_dim, layers=layers, ffn_dim=ffn_dim,
                         attention_heads=attention_heads,
                         attention_dropout=attention_dropout, **kwargs)


class Kosmos2_5VisionConfig(PretrainedConfig):
    model_type = "kosmos_2_5_vision_model"

    def __init__(self, hidden_size=1536, patch_embed_hidden_size=768,
                 intermediate_size=3968, head_dim=64, num_hidden_layers=18,
                 num_attention_heads=24, dense_act_fn="gelu_new",
                 layer_norm_eps=1e-6, dropout_rate=0.0, attention_dropout=0.0,
                 max_num_patches=4096, initializer_factor=1.0,
                 initializer_range=0.02, **kwargs):
        self.hidden_size = hidden_size
        self.patch_embed_hidden_size = patch_embed_hidden_size
        self.intermediate_size = intermediate_size
        self.d_ff = intermediate_size  # Pix2StructVisionMlp reads d_ff
        self.head_dim = head_dim
        self.d_kv = head_dim  # Pix2StructVisionLayer reads d_kv
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.dense_act_fn = dense_act_fn
        self.layer_norm_eps = layer_norm_eps
        self.dropout_rate = dropout_rate
        self.attention_dropout = attention_dropout
        self.max_num_patches = max_num_patches
        self.seq_len = max_num_patches  # Pix2StructVisionEmbeddings reads seq_len
        self.initializer_factor = initializer_factor
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class Kosmos2_5Config(PretrainedConfig):
    model_type = "kosmos-2.5"
    sub_configs = {"text_config": Kosmos2_5TextConfig,
                   "vision_config": Kosmos2_5VisionConfig}

    def __init__(self, text_config=None, vision_config=None,
                 latent_query_num=2048, **kwargs):
        self.text_config = (Kosmos2_5TextConfig(**(text_config or {}))
                            if not isinstance(text_config, Kosmos2_5TextConfig)
                            else text_config)
        self.vision_config = (Kosmos2_5VisionConfig(**(vision_config or {}))
                              if not isinstance(vision_config, Kosmos2_5VisionConfig)
                              else vision_config)
        self.latent_query_num = latent_query_num
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(**kwargs)
