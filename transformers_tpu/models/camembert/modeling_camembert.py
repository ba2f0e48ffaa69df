"""CamemBERT (reference models/camembert/modeling_camembert.py): RoBERTa
architecture verbatim under the ``camembert`` prefix/model_type — the
reference file is an auto-generated copy of the RoBERTa classes."""

from __future__ import annotations

import jax.numpy as jnp

from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import (RobertaForMaskedLM,
                                        RobertaForQuestionAnswering,
                                        RobertaForSequenceClassification,
                                        RobertaModel)
from ...modeling_utils import PreTrainedModel


class CamembertConfig(RobertaConfig):
    model_type = "camembert"


class CamembertModel(RobertaModel):
    pass


class _Base(PreTrainedModel):
    config_class = CamembertConfig
    base_model_prefix = "roberta"


class CamembertModelStandalone(_Base):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = CamembertModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class CamembertForMaskedLM(RobertaForMaskedLM):
    config_class = CamembertConfig


class CamembertForSequenceClassification(RobertaForSequenceClassification):
    config_class = CamembertConfig


class CamembertForQuestionAnswering(RobertaForQuestionAnswering):
    config_class = CamembertConfig
