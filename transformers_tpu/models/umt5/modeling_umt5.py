"""UMT5, TPU-native (reference src/transformers/models/umt5/modeling_umt5.py).

UMT5 = mT5 skeleton where EVERY layer owns its relative_attention_bias and
recomputes it per layer (reference UMT5Attention — "UMT5 uses a relative
position bias in each layer") instead of T5's block-0-shared table. All other
math rides the shared T5 stack."""

from __future__ import annotations

import jax.numpy as jnp

from ..t5.configuration_t5 import T5Config
from ..t5.modeling_t5 import T5EncoderModel, T5ForConditionalGeneration, T5Stack


class UMT5Config(T5Config):
    model_type = "umt5"

    def __init__(self, feed_forward_proj="gated-gelu", **kwargs):
        super().__init__(feed_forward_proj=feed_forward_proj, **kwargs)


class UMT5Stack(T5Stack):
    per_layer_bias = True


class UMT5ForConditionalGeneration(T5ForConditionalGeneration):
    config_class = UMT5Config
    stack_cls = UMT5Stack


class UMT5EncoderModel(T5EncoderModel):
    config_class = UMT5Config

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.encoder = UMT5Stack(config, False, config.num_layers,
                                 dtype=self.dtype, param_dtype=self.param_dtype)
