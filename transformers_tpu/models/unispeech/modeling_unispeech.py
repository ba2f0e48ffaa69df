"""UniSpeech (reference src/transformers/models/unispeech/modeling_unispeech.py).

The fine-tuning/CTC surface is exactly the Wav2Vec2 skeleton (the UniSpeech
delta — codebook quantizer + CTC-mix pretraining head — exists only in the
pretraining objective); checkpoint prefix ``unispeech``."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_utils import PreTrainedModel
from ..wav2vec2.configuration_wav2vec2 import Wav2Vec2Config
from ..wav2vec2.modeling_wav2vec2 import (
    Wav2Vec2ForCTC,
    Wav2Vec2ForSequenceClassification,
    Wav2Vec2Model,
)


class UniSpeechConfig(Wav2Vec2Config):
    model_type = "unispeech"


class UniSpeechPreTrainedModel(PreTrainedModel):
    config_class = UniSpeechConfig
    base_model_prefix = "unispeech"


class UniSpeechModelStandalone(UniSpeechPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.unispeech = Wav2Vec2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, input_values=None, **kwargs):
        return self.unispeech(params["unispeech"], input_values, **kwargs)


class UniSpeechForCTC(UniSpeechPreTrainedModel, Wav2Vec2ForCTC):
    base_attr = "unispeech"
    model_cls = Wav2Vec2Model

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForCTC.__init__(self, config, dtype=dtype, param_dtype=param_dtype)


class UniSpeechForSequenceClassification(UniSpeechPreTrainedModel,
                                         Wav2Vec2ForSequenceClassification):
    base_attr = "unispeech"
    model_cls = Wav2Vec2Model

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        Wav2Vec2ForSequenceClassification.__init__(self, config, dtype=dtype,
                                                   param_dtype=param_dtype)
