"""PLBart (reference src/transformers/models/plbart/modeling_plbart.py).

The BART skeleton verbatim (post-LN, layernorm_embedding, +2 position
offset) with mBART-style multilingual vocab and sqrt(d) embedding scale
(``scale_embedding=True`` in real checkpoints; read from config)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig
from ..bart.modeling_bart import BartForConditionalGeneration, BartModel


class PLBartConfig(BartConfig):
    model_type = "plbart"

    def __init__(self, **kwargs):
        # PLBart has NO decoder_start_token_id default (generation falls back
        # to bos, reference configuration_plbart.py)
        kwargs.setdefault("decoder_start_token_id", None)
        super().__init__(**kwargs)


class PLBartModel(BartModel):
    pass


class PLBartForConditionalGeneration(BartForConditionalGeneration):
    config_class = PLBartConfig
    model_cls = PLBartModel
