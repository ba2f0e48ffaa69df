"""mT5 (reference models/mt5/modeling_mt5.py): the T5 v1.1 architecture
(gated-gelu FFN, no FFN-embedding tying) under the ``mt5`` model_type — the
reference file is an auto-generated copy of the T5 classes."""

from __future__ import annotations

from ..t5.configuration_t5 import T5Config
from ..t5.modeling_t5 import T5EncoderModel, T5ForConditionalGeneration


class MT5Config(T5Config):
    model_type = "mt5"


class MT5ForConditionalGeneration(T5ForConditionalGeneration):
    config_class = MT5Config


class MT5EncoderModel(T5EncoderModel):
    config_class = MT5Config
