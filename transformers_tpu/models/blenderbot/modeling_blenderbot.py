"""Blenderbot (reference src/transformers/models/blenderbot/modeling_blenderbot.py).

BART skeleton rewired PRE-norm with a final ``layer_norm``, NO
layernorm_embedding, and learned positions WITHOUT the +2 offset."""

from __future__ import annotations

from ...core.module import Embedding
from ..bart.configuration_bart import BartConfig
from ..bart.modeling_bart import (
    BartDecoder,
    BartEncoder,
    BartForConditionalGeneration,
    BartModel,
)
from ..mbart.modeling_mbart import MBartDecoderLayer, MBartEncoderLayer


class BlenderbotConfig(BartConfig):
    model_type = "blenderbot"


class NoOffsetPositionalEmbedding(Embedding):
    """Learned positions, zero offset (reference Blenderbot/LED variants)."""

    def __init__(self, num_positions, features, **kw):
        super().__init__(num_positions, features, **kw)


class BlenderbotEncoder(BartEncoder):
    layer_cls = MBartEncoderLayer
    pos_cls = NoOffsetPositionalEmbedding
    use_layernorm_embedding = False
    use_final_norm = True


class BlenderbotDecoder(BartDecoder):
    layer_cls = MBartDecoderLayer
    pos_cls = NoOffsetPositionalEmbedding
    use_layernorm_embedding = False
    use_final_norm = True


class BlenderbotModel(BartModel):
    encoder_cls = BlenderbotEncoder
    decoder_cls = BlenderbotDecoder


class BlenderbotForConditionalGeneration(BartForConditionalGeneration):
    config_class = BlenderbotConfig
    model_cls = BlenderbotModel
