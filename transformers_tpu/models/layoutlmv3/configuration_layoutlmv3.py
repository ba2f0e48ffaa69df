"""LayoutLMv3 config (reference src/transformers/models/layoutlmv3/configuration_layoutlmv3.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class LayoutLMv3Config(PretrainedConfig):
    model_type = "layoutlmv3"

    def __init__(self, vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2,
                 initializer_range=0.02, layer_norm_eps=1e-5, pad_token_id=1,
                 bos_token_id=0, eos_token_id=2, max_2d_position_embeddings=1024,
                 coordinate_size=128, shape_size=128,
                 has_relative_attention_bias=True, rel_pos_bins=32, max_rel_pos=128,
                 rel_2d_pos_bins=64, max_rel_2d_pos=256,
                 has_spatial_attention_bias=True, text_embed=True, visual_embed=True,
                 input_size=224, num_channels=3, patch_size=16,
                 classifier_dropout=None, **kwargs):
        self.vocab_size = vocab_size
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
        self.max_2d_position_embeddings = max_2d_position_embeddings
        self.coordinate_size = coordinate_size
        self.shape_size = shape_size
        self.has_relative_attention_bias = has_relative_attention_bias
        self.rel_pos_bins = rel_pos_bins
        self.max_rel_pos = max_rel_pos
        self.rel_2d_pos_bins = rel_2d_pos_bins
        self.max_rel_2d_pos = max_rel_2d_pos
        self.has_spatial_attention_bias = has_spatial_attention_bias
        self.text_embed = text_embed
        self.visual_embed = visual_embed
        self.input_size = input_size
        self.num_channels = num_channels
        self.patch_size = patch_size
        self.classifier_dropout = classifier_dropout
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
