"""XLM-RoBERTa (reference models/xlm_roberta/modeling_xlm_roberta.py):
RoBERTa architecture verbatim under the ``xlm-roberta`` model_type."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_utils import PreTrainedModel
from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import RobertaForMaskedLM, RobertaModel


class XLMRobertaConfig(RobertaConfig):
    model_type = "xlm-roberta"


class XLMRobertaModel(RobertaModel):
    pass


class XLMRobertaModelStandalone(PreTrainedModel):
    config_class = XLMRobertaConfig
    base_model_prefix = "roberta"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = XLMRobertaModel(config, dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class XLMRobertaForMaskedLM(RobertaForMaskedLM):
    config_class = XLMRobertaConfig
