"""Aya Vision (reference models/aya_vision/modeling_aya_vision.py).

LLaVA composition (SigLIP tower + Cohere2 decoder) with a pixel-shuffle
SwiGLU projector (:40): features are 2x2-shuffled, layernormed, projected to
``alignment_intermediate_size``, split into (x, gate) with SiLU(gate)·x, and
projected to the text width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ..llava.modeling_llava import (LlavaForConditionalGeneration, LlavaModel,
                                    LlavaPreTrainedModel)
from .configuration_aya_vision import AyaVisionConfig


class AyaVisionMultiModalProjector(Module):
    def __init__(self, config: AyaVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.factor = config.downsample_factor
        in_dim = config.vision_config.hidden_size * config.downsample_factor**2
        inter = getattr(config, "alignment_intermediate_size",
                        config.text_config.hidden_size)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.layernorm = LayerNorm(in_dim, config.adapter_layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.linear_1 = Linear(in_dim, inter, True, **kw)
        self.linear_2 = Linear(inter // 2, config.text_config.hidden_size, True, **kw)

    def _pixel_shuffle(self, x):  # [B, S, D]
        b, s, d = x.shape
        f = self.factor
        side = int(s ** 0.5)
        x = x.reshape(b, side, side, d)
        x = x.reshape(b, side, side // f, d * f)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, side // f, side // f, -1)
        return x.transpose(0, 2, 1, 3)

    def __call__(self, params, image_features):
        h = self._pixel_shuffle(image_features)
        h = self.layernorm(params["layernorm"], h)
        h = self.linear_1(params["linear_1"], h)
        x, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate) * x
        return self.linear_2(params["linear_2"], h)


class AyaVisionModel(LlavaModel):
    projector_cls = AyaVisionMultiModalProjector


class AyaVisionPreTrainedModel(LlavaPreTrainedModel):
    config_class = AyaVisionConfig


class AyaVisionForConditionalGeneration(LlavaForConditionalGeneration):
    config_class = AyaVisionConfig
    model_cls = AyaVisionModel
