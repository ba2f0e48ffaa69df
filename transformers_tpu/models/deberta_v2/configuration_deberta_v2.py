"""DeBERTa-v2 config (reference src/transformers/models/deberta_v2/configuration_deberta_v2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class DebertaV2Config(PretrainedConfig):
    model_type = "deberta-v2"

    def __init__(self, vocab_size=128100, hidden_size=1536, num_hidden_layers=24,
                 num_attention_heads=24, intermediate_size=6144, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=0, initializer_range=0.02,
                 layer_norm_eps=1e-7, relative_attention=False, max_relative_positions=-1,
                 pad_token_id=0, position_biased_input=True, pos_att_type=None,
                 pooler_dropout=0, pooler_hidden_act="gelu", position_buckets=-1,
                 share_att_key=False, norm_rel_ebd="none", conv_kernel_size=0,
                 conv_groups=1, conv_act="tanh", **kwargs):
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
        self.relative_attention = relative_attention
        self.max_relative_positions = max_relative_positions
        self.position_biased_input = position_biased_input
        if isinstance(pos_att_type, str):
            pos_att_type = [x.strip() for x in pos_att_type.lower().split("|")]
        self.pos_att_type = pos_att_type or []
        self.position_buckets = position_buckets
        self.share_att_key = share_att_key
        self.norm_rel_ebd = norm_rel_ebd
        self.conv_kernel_size = conv_kernel_size
        self.conv_groups = conv_groups
        self.conv_act = conv_act
        self.pooler_hidden_size = kwargs.pop("pooler_hidden_size", hidden_size)
        self.pooler_dropout = pooler_dropout
        self.pooler_hidden_act = pooler_hidden_act
        super().__init__(pad_token_id=pad_token_id, **kwargs)
