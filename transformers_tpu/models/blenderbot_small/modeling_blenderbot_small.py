"""BlenderbotSmall (reference src/transformers/models/blenderbot_small/
modeling_blenderbot_small.py). BART post-LN skeleton with zero-offset
learned positions."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig
from ..bart.modeling_bart import (
    BartDecoder,
    BartEncoder,
    BartForConditionalGeneration,
    BartModel,
)
from ..blenderbot.modeling_blenderbot import NoOffsetPositionalEmbedding


class BlenderbotSmallConfig(BartConfig):
    model_type = "blenderbot-small"


class BlenderbotSmallEncoder(BartEncoder):
    pos_cls = NoOffsetPositionalEmbedding


class BlenderbotSmallDecoder(BartDecoder):
    pos_cls = NoOffsetPositionalEmbedding
    ln_embed_before_positions = True


class BlenderbotSmallModel(BartModel):
    encoder_cls = BlenderbotSmallEncoder
    decoder_cls = BlenderbotSmallDecoder


class BlenderbotSmallForConditionalGeneration(BartForConditionalGeneration):
    config_class = BlenderbotSmallConfig
    model_cls = BlenderbotSmallModel
