"""DINOv3 ConvNext (reference
models/dinov3_convnext/modeling_dinov3_convnext.py): ConvNext trunk with
per-stage downsample [conv,LN] / [LN,conv] pairs; the model head average-pools
the final map into a CLS-like token and layer-norms [cls; patches]."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..convnext.modeling_convnext import ConvNextChannelsFirstLayerNorm
from ..luke.modeling_luke import _Container
from .configuration_dinov3_convnext import DINOv3ConvNextConfig


@dataclass
class BaseModelOutputWithPoolingAndNoAttention(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


@dataclass
class BackboneOutput(ModelOutput):
    feature_maps: Optional[tuple] = None
    hidden_states: Optional[tuple] = None


class DINOv3ConvNextLayer(Module):
    def __init__(self, config, channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.channels = channels
        self.depthwise_conv = Conv(channels, channels, 7, padding=3,
                                   groups=channels, ndim=2, **kw)
        self.layer_norm = LayerNorm(channels, config.layer_norm_eps, **kw)
        self.pointwise_conv1 = Linear(channels, 4 * channels, True, **lkw)
        self.pointwise_conv2 = Linear(4 * channels, channels, True, **lkw)
        self.act = get_activation(config.hidden_act)
        self.layer_scale_init_value = config.layer_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["gamma"] = jnp.full((self.channels,),
                                   self.layer_scale_init_value, self.param_dtype)
        return params

    def __call__(self, params, x):  # [B, C, H, W]
        residual = x
        h = self.depthwise_conv(params["depthwise_conv"], x)
        h = h.transpose(0, 2, 3, 1)
        h = self.layer_norm(params["layer_norm"], h)
        h = self.pointwise_conv1(params["pointwise_conv1"], h)
        h = self.act(h)
        h = self.pointwise_conv2(params["pointwise_conv2"], h)
        h = h * params["gamma"].astype(h.dtype)
        return residual + h.transpose(0, 3, 1, 2)


class DINOv3ConvNextStage(Module):
    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        cin = (config.hidden_sizes[stage_idx - 1] if stage_idx > 0
               else config.num_channels)
        cout = config.hidden_sizes[stage_idx]
        if stage_idx == 0:
            downs = [Conv(config.num_channels, cout, 4, stride=4, ndim=2, **kw),
                     ConvNextChannelsFirstLayerNorm(cout, config.layer_norm_eps, **kw)]
        else:
            downs = [ConvNextChannelsFirstLayerNorm(cin, config.layer_norm_eps, **kw),
                     Conv(cin, cout, 2, stride=2, ndim=2, **kw)]
        self.downsample_layers = downs
        self.layers = [DINOv3ConvNextLayer(config, cout, **kw)
                       for _ in range(config.depths[stage_idx])]

    def __call__(self, params, x):
        for i, layer in enumerate(self.downsample_layers):
            x = layer(params["downsample_layers"][str(i)], x)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class DINOv3ConvNextEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = [DINOv3ConvNextStage(config, i, dtype=dtype,
                                           param_dtype=param_dtype)
                       for i in range(config.num_stages)]

    def __call__(self, params, x):
        hidden_states = [x]
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            hidden_states.append(x)
        return x, tuple(hidden_states)


class DINOv3ConvNextPreTrainedModel(PreTrainedModel):
    config_class = DINOv3ConvNextConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"


class DINOv3ConvNextModel(DINOv3ConvNextPreTrainedModel):
    def __init__(self, config: DINOv3ConvNextConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # hub checkpoints use a flat ``stages.{i}`` tree (no encoder wrapper)
        self.stages = [DINOv3ConvNextStage(config, i, **kw)
                       for i in range(config.num_stages)]
        self.layer_norm = LayerNorm(config.hidden_sizes[-1],
                                    config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values=None,
                 **kwargs) -> BaseModelOutputWithPoolingAndNoAttention:
        x = jnp.asarray(pixel_values, self.dtype)
        hidden_states = [x]
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            hidden_states.append(x)
        hidden_states = tuple(hidden_states)
        pooled = x.mean(axis=(2, 3), keepdims=True)  # AdaptiveAvgPool2d(1)
        b, c = x.shape[:2]
        pooled = pooled.reshape(b, c, 1).transpose(0, 2, 1)
        patches = x.reshape(b, c, -1).transpose(0, 2, 1)
        h = jnp.concatenate([pooled, patches], axis=1)
        h = self.layer_norm(params["layer_norm"], h)
        return BaseModelOutputWithPoolingAndNoAttention(
            last_hidden_state=h, pooler_output=h[:, 0],
            hidden_states=hidden_states)


class DINOv3ConvNextBackbone(DINOv3ConvNextPreTrainedModel):
    def __init__(self, config: DINOv3ConvNextConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = DINOv3ConvNextEncoder(config, **kw)
        self.stage_names = config.stage_names
        self.out_features = (getattr(config, "out_features", None)
                             or [self.stage_names[-1]])

    def __call__(self, params, pixel_values=None, **kwargs) -> BackboneOutput:
        x = jnp.asarray(pixel_values, self.dtype)
        _, hidden_states = self.model(params["model"], x)
        feature_maps = tuple(
            h for name, h in zip(self.stage_names, hidden_states)
            if name in self.out_features)
        return BackboneOutput(feature_maps=feature_maps,
                              hidden_states=hidden_states)
