"""Donut-Swin, TPU-native (reference
src/transformers/models/donut/modeling_donut_swin.py).

Architecturally identical to Swin (the reference file is a Swin copy with
optional absolute position embeddings); serves as the OCR-free document
encoder inside VisionEncoderDecoder Donut checkpoints
(naver-clova-ix/donut-*)."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_utils import PreTrainedModel
from ..swin.modeling_swin import SWIN_WEIGHT_RULES, SwinModel
from .configuration_donut_swin import DonutSwinConfig


class _DonutSwinInner(SwinModel):
    use_final_layernorm = False


class DonutSwinPreTrainedModel(PreTrainedModel):
    config_class = DonutSwinConfig
    base_model_prefix = "swin"
    main_input_name = "pixel_values"
    _weight_rules = SWIN_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (r"relative_position_index",)


class DonutSwinModel(DonutSwinPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.swin = _DonutSwinInner(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.swin(params["swin"], pixel_values, **kwargs)
