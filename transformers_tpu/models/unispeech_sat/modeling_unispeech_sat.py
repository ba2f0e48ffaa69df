"""UniSpeechSat (reference src/transformers/models/unispeech_sat/
modeling_unispeech_sat.py). Wav2Vec2 skeleton (the SAT delta — speaker-aware
quantizer — is pretraining-only); checkpoint prefix ``unispeech_sat``."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_utils import PreTrainedModel
from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2Model,
)


class UniSpeechSatConfig(Wav2Vec2Config):
    model_type = "unispeech-sat"


class UniSpeechSatPreTrainedModel(PreTrainedModel):
    config_class = UniSpeechSatConfig
    base_model_prefix = "unispeech_sat"


class UniSpeechSatModelStandalone(UniSpeechSatPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.unispeech_sat = Wav2Vec2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.unispeech_sat(params["unispeech_sat"], input_values, **kwargs)


class UniSpeechSatForCTC(UniSpeechSatPreTrainedModel, Wav2Vec2ForCTC):
    base_attr = "unispeech_sat"
    model_cls = Wav2Vec2Model

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForCTC.__init__(self, config, dtype=dtype, param_dtype=param_dtype)


class UniSpeechSatForSequenceClassification(UniSpeechSatPreTrainedModel,
                                            Wav2Vec2ForSequenceClassification):
    base_attr = "unispeech_sat"
    model_cls = Wav2Vec2Model

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForSequenceClassification.__init__(self, config, dtype=dtype,
                                                   param_dtype=param_dtype)
