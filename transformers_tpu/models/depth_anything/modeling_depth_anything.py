"""Depth Anything (reference
src/transformers/models/depth_anything/modeling_depth_anything.py).

DINOv2 backbone (our Dinov2 blocks under ``backbone``, selected hidden
states layernormed) → DPT-style neck WITHOUT readout (CLS dropped) →
size-targeted feature fusion (each step upsamples to the NEXT stage's
resolution, align_corners=True) → relative/metric depth head scaled to the
input resolution."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Module
from ...modeling_utils import PreTrainedModel
from ..dinov2.modeling_dinov2 import Dinov2Model
from ..dpt.modeling_dpt import (
    DPTFeatureFusionLayer,
    DPTReassembleLayer,
    resize_bilinear,
)
from ..glpn.modeling_glpn import DepthEstimatorOutput
from .configuration_depth_anything import DepthAnythingConfig


class DepthAnythingReassembleStage(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from types import SimpleNamespace

        view = SimpleNamespace(hidden_size=config.reassemble_hidden_size)
        self.layers = [DPTReassembleLayer(view, ch, f, dtype=dtype, param_dtype=param_dtype)
                       for ch, f in zip(config.neck_hidden_sizes, config.reassemble_factors)]

    def __call__(self, params, hidden_states, ph, pw):
        out = []
        for i, hs in enumerate(hidden_states):
            hs = hs[:, 1:]
            b, _, c = hs.shape
            fmap = hs.reshape(b, ph, pw, c).transpose(0, 3, 1, 2)
            out.append(self.layers[i](params["layers"][str(i)], fmap))
        return out


class DepthAnythingFusionLayer(DPTFeatureFusionLayer):
    def __call__(self, params, x, residual=None, size=None):
        if residual is not None:
            if x.shape != residual.shape:
                residual = resize_bilinear(residual, x.shape[2:], align_corners=False)
            x = x + self.residual_layer1(params["residual_layer1"], residual)
        x = self.residual_layer2(params["residual_layer2"], x)
        target = size if size is not None else (x.shape[2] * 2, x.shape[3] * 2)
        x = resize_bilinear(x, target, align_corners=True)
        return self.projection(params["projection"], x)


class DepthAnythingFusionStage(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from types import SimpleNamespace

        view = SimpleNamespace(fusion_hidden_size=config.fusion_hidden_size,
                               use_batch_norm_in_fusion_residual=False,
                               use_bias_in_fusion_residual=None)
        self.layers = [DepthAnythingFusionLayer(view, dtype=dtype, param_dtype=param_dtype)
                       for _ in config.neck_hidden_sizes]

    def __call__(self, params, hidden_states):
        hidden_states = hidden_states[::-1]
        fused = None
        outs = []
        for i, hs in enumerate(hidden_states):
            size = hidden_states[i + 1].shape[2:] if i != len(hidden_states) - 1 else None
            p = params["layers"][str(i)]
            fused = (self.layers[i](p, hs, size=size) if fused is None
                     else self.layers[i](p, fused, hs, size=size))
            outs.append(fused)
        return outs


class DepthAnythingNeck(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reassemble_stage = DepthAnythingReassembleStage(config, **kw)
        self.convs = [Conv(ch, config.fusion_hidden_size, 3, padding=1, use_bias=False, **kw)
                      for ch in config.neck_hidden_sizes]
        self.fusion_stage = DepthAnythingFusionStage(config, **kw)

    def __call__(self, params, hidden_states, ph, pw):
        feats = self.reassemble_stage(params["reassemble_stage"], hidden_states, ph, pw)
        feats = [conv(params["convs"][str(i)], f)
                 for i, (conv, f) in enumerate(zip(self.convs, feats))]
        return self.fusion_stage(params["fusion_stage"], feats)


class DepthAnythingHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        f = config.fusion_hidden_size
        self.conv1 = Conv(f, f // 2, 3, padding=1, **kw)
        self.conv2 = Conv(f // 2, config.head_hidden_size, 3, padding=1, **kw)
        self.conv3 = Conv(config.head_hidden_size, 1, 1, **kw)
        self.head_in_index = config.head_in_index
        self.patch_size = config.patch_size
        self.max_depth = config.max_depth
        self.metric = config.depth_estimation_type == "metric"

    def __call__(self, params, hidden_states, ph, pw):
        x = hidden_states[self.head_in_index]
        x = self.conv1(params["conv1"], x)
        x = resize_bilinear(x, (ph * self.patch_size, pw * self.patch_size),
                            align_corners=True)
        x = jax.nn.relu(self.conv2(params["conv2"], x))
        x = self.conv3(params["conv3"], x)
        x = jax.nn.sigmoid(x) if self.metric else jax.nn.relu(x)
        return (x * self.max_depth)[:, 0]


class DepthAnythingPreTrainedModel(PreTrainedModel):
    config_class = DepthAnythingConfig
    base_model_prefix = ""


class DepthAnythingForDepthEstimation(DepthAnythingPreTrainedModel):
    def __init__(self, config: DepthAnythingConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = Dinov2Model(config.backbone_config, **kw)
        self.neck = DepthAnythingNeck(config, **kw)
        self.head = DepthAnythingHead(config, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.backbone(params["backbone"], pixel_values, output_hidden_states=True)
        bb_cfg = self.config.backbone_config
        out_indices = getattr(bb_cfg, "out_indices", None) or [bb_cfg.num_hidden_layers]
        ln = self.backbone.layernorm
        feats = [ln(params["backbone"]["layernorm"], out.hidden_states[i])
                 for i in out_indices]
        h, w = pixel_values.shape[2:]
        ph, pw = h // self.config.patch_size, w // self.config.patch_size
        fused = self.neck(params["neck"], feats, ph, pw)
        depth = self.head(params["head"], fused, ph, pw)
        return DepthEstimatorOutput(predicted_depth=depth)
