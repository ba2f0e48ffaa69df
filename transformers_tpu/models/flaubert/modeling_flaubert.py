"""FlauBERT (reference models/flaubert/modeling_flaubert.py): the XLM
architecture (post-LN, lang embeddings) with ``pre_norm``/``layerdrop``
training-time options that are inert at inference; model_type flaubert."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_utils import PreTrainedModel
from ..xlm.modeling_xlm import XLMConfig, XLMModel, XLMWithLMHeadModel


class FlaubertConfig(XLMConfig):
    model_type = "flaubert"

    def __init__(self, layerdrop=0.0, pre_norm=False, **kwargs):
        self.layerdrop = layerdrop
        self.pre_norm = pre_norm
        super().__init__(**kwargs)


class FlaubertModel(XLMModel):
    config_class = FlaubertConfig


class FlaubertModelStandalone(PreTrainedModel):
    config_class = FlaubertConfig
    base_model_prefix = "transformer"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = FlaubertModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)


class FlaubertWithLMHeadModel(XLMWithLMHeadModel):
    config_class = FlaubertConfig
