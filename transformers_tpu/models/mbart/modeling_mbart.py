"""mBART (reference src/transformers/models/mbart/modeling_mbart.py).

BART skeleton with pre-LN layers (norm before each sublayer) and a final
``layer_norm`` on both encoder and decoder (reference :284-315 encoder layer,
:510-511 layernorm_embedding + layer_norm), learned offset-2 positions and
``final_logits_bias`` as in BART.
"""

from __future__ import annotations

from ..bart.modeling_bart import (
    BartDecoder,
    BartDecoderLayer,
    BartEncoder,
    BartEncoderLayer,
    BartForConditionalGeneration,
    BartModel,
    BartPreTrainedModel,
)
from .configuration_mbart import MBartConfig


class MBartEncoderLayer(BartEncoderLayer):
    pre_norm = True


class MBartDecoderLayer(BartDecoderLayer):
    pre_norm = True


class MBartEncoder(BartEncoder):
    layer_cls = MBartEncoderLayer
    use_final_norm = True


class MBartDecoder(BartDecoder):
    layer_cls = MBartDecoderLayer
    use_final_norm = True


class MBartModel(BartModel):
    encoder_cls = MBartEncoder
    decoder_cls = MBartDecoder


class MBartForConditionalGeneration(BartForConditionalGeneration):
    config_class = MBartConfig
    model_cls = MBartModel
