"""VipLlava (reference src/transformers/models/vipllava/modeling_vipllava.py).

LLaVA composition where the projector LayerNorms the CONCATENATION of
several vision-tower layers (default [-2, -5, -8, -11, 6], CLS removed)
before the 2-layer MLP."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.activations import get_activation
from ..llava.modeling_llava import (
    LlavaForConditionalGeneration,
    LlavaModel,
)
from .configuration_vipllava import VipLlavaConfig


class VipLlavaMultiModalProjector(Module):
    def __init__(self, config: VipLlavaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        n = (1 if isinstance(config.vision_feature_layers, int)
             else len(config.vision_feature_layers))
        in_dim = n * config.vision_config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.projector_layernorm = LayerNorm(in_dim, config.projector_layernorm_eps,
                                             dtype=dtype, param_dtype=param_dtype)
        self.linear_1 = Linear(in_dim, config.text_config.hidden_size, True, **kw)
        self.linear_2 = Linear(config.text_config.hidden_size,
                               config.text_config.hidden_size, True, **kw)
        self.act = get_activation(config.projector_hidden_act)

    def __call__(self, params, image_features):
        h = self.projector_layernorm(params["projector_layernorm"], image_features)
        h = self.act(self.linear_1(params["linear_1"], h))
        return self.linear_2(params["linear_2"], h)


class VipLlavaModel(LlavaModel):
    def __init__(self, config: VipLlavaConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.multi_modal_projector = VipLlavaMultiModalProjector(
            config, dtype=dtype, param_dtype=param_dtype)

    def get_image_features(self, params, pixel_values, vision_feature_layers=None,
                           **kwargs):
        layers = (vision_feature_layers if vision_feature_layers is not None
                  else self.config.vision_feature_layers)
        out = self.vision_tower(params["vision_tower"], pixel_values,
                                output_hidden_states=True)
        if isinstance(layers, int):
            feats = out.hidden_states[layers][:, 1:]
        else:
            feats = jnp.concatenate([out.hidden_states[i][:, 1:] for i in layers], axis=-1)
        return self.multi_modal_projector(params["multi_modal_projector"], feats)


class VipLlavaForConditionalGeneration(LlavaForConditionalGeneration):
    config_class = VipLlavaConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = VipLlavaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
