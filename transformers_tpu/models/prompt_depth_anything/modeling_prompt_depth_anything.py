"""Prompt Depth Anything (reference
models/prompt_depth_anything/modular_prompt_depth_anything.py): Depth
Anything whose fusion layers additionally inject a min-max-normalized prompt
depth map (sparse/low-res metric depth) through a 3-conv adapter at every
fusion scale; the prediction is rescaled back to the prompt's metric range."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Module
from ..glpn.modeling_glpn import DepthEstimatorOutput
from ..depth_anything.configuration_depth_anything import DepthAnythingConfig
from ..depth_anything.modeling_depth_anything import (
    DepthAnythingForDepthEstimation,
    DepthAnythingFusionLayer,
    DepthAnythingFusionStage,
    DepthAnythingHead,
    DepthAnythingNeck,
)
from ..dpt.modeling_dpt import resize_bilinear


class PromptDepthAnythingConfig(DepthAnythingConfig):
    model_type = "prompt_depth_anything"


class PromptDepthAnythingLayer(Module):
    """reference :20 — conv-relu-conv-relu-conv adapter on the prompt map."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        f = config.fusion_hidden_size
        self.convolution1 = Conv(1, f, 3, padding=1, **kw)
        self.convolution2 = Conv(f, f, 3, padding=1, **kw)
        self.convolution3 = Conv(f, f, 3, padding=1, **kw)

    def __call__(self, params, prompt_depth):
        h = jax.nn.relu(self.convolution1(params["convolution1"], prompt_depth))
        h = jax.nn.relu(self.convolution2(params["convolution2"], h))
        return self.convolution3(params["convolution3"], h)


class PromptDepthAnythingFusionLayer(DepthAnythingFusionLayer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.prompt_depth_layer = PromptDepthAnythingLayer(
            config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x, residual=None, size=None, prompt_depth=None):
        if residual is not None:
            if x.shape != residual.shape:
                residual = resize_bilinear(residual, x.shape[2:],
                                           align_corners=False)
            x = x + self.residual_layer1(params["residual_layer1"], residual)
        x = self.residual_layer2(params["residual_layer2"], x)
        if prompt_depth is not None:
            pd = resize_bilinear(prompt_depth, x.shape[2:], align_corners=False)
            x = x + self.prompt_depth_layer(params["prompt_depth_layer"], pd)
        target = size if size is not None else (x.shape[2] * 2, x.shape[3] * 2)
        x = resize_bilinear(x, target, align_corners=True)
        return self.projection(params["projection"], x)


class PromptDepthAnythingFusionStage(DepthAnythingFusionStage):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # swap in the prompt-aware fusion layers (same child names)
        from types import SimpleNamespace

        view = SimpleNamespace(fusion_hidden_size=config.fusion_hidden_size,
                               use_batch_norm_in_fusion_residual=False,
                               use_bias_in_fusion_residual=None)
        self.layers = [PromptDepthAnythingFusionLayer(
            view, dtype=dtype, param_dtype=param_dtype)
            for _ in config.neck_hidden_sizes]

    def __call__(self, params, hidden_states, prompt_depth=None):
        hidden_states = hidden_states[::-1]
        fused = None
        outs = []
        for i, hs in enumerate(hidden_states):
            size = hidden_states[i + 1].shape[2:] \
                if i != len(hidden_states) - 1 else None
            p = params["layers"][str(i)]
            if fused is None:
                fused = self.layers[i](p, hs, size=size,
                                       prompt_depth=prompt_depth)
            else:
                fused = self.layers[i](p, fused, hs, size=size,
                                       prompt_depth=prompt_depth)
            outs.append(fused)
        return outs


class PromptDepthAnythingNeck(DepthAnythingNeck):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.fusion_stage = PromptDepthAnythingFusionStage(
            config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden_states, ph, pw, prompt_depth=None):
        feats = self.reassemble_stage(params["reassemble_stage"],
                                      hidden_states, ph, pw)
        feats = [conv(params["convs"][str(i)], f)
                 for i, (conv, f) in enumerate(zip(self.convs, feats))]
        return self.fusion_stage(params["fusion_stage"], feats, prompt_depth)


class PromptDepthAnythingHead(DepthAnythingHead):
    """reference :217 — no max_depth multiply; metric range comes from the
    prompt rescale in the model forward."""

    def __call__(self, params, hidden_states, ph, pw):
        x = hidden_states[self.head_in_index]
        x = self.conv1(params["conv1"], x)
        x = resize_bilinear(x, (ph * self.patch_size, pw * self.patch_size),
                            align_corners=True)
        x = jax.nn.relu(self.conv2(params["conv2"], x))
        x = self.conv3(params["conv3"], x)
        x = jax.nn.sigmoid(x) if self.metric else jax.nn.relu(x)
        return x[:, 0]


class PromptDepthAnythingForDepthEstimation(DepthAnythingForDepthEstimation):
    config_class = PromptDepthAnythingConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.neck = PromptDepthAnythingNeck(config, **kw)
        self.head = PromptDepthAnythingHead(config, **kw)

    def __call__(self, params, pixel_values=None, prompt_depth=None,
                 labels=None, **kwargs):
        out = self.backbone(params["backbone"], pixel_values,
                            output_hidden_states=True)
        bb_cfg = self.config.backbone_config
        out_indices = getattr(bb_cfg, "out_indices", None) or \
            [bb_cfg.num_hidden_layers]
        ln = self.backbone.layernorm
        feats = [ln(params["backbone"]["layernorm"], out.hidden_states[i])
                 for i in out_indices]
        h, w = pixel_values.shape[2:]
        ph, pw = h // self.config.patch_size, w // self.config.patch_size
        depth_min = depth_max = None
        if prompt_depth is not None:
            b = prompt_depth.shape[0]
            flat = prompt_depth.reshape(b, -1)
            depth_min = flat.min(axis=1).reshape(b, 1, 1, 1)
            depth_max = flat.max(axis=1).reshape(b, 1, 1, 1)
            prompt_depth = (prompt_depth - depth_min) / (depth_max - depth_min)
        fused = self.neck(params["neck"], feats, ph, pw, prompt_depth)
        depth = self.head(params["head"], fused, ph, pw)
        if prompt_depth is not None:
            depth = depth * (depth_max[:, 0] - depth_min[:, 0]) + depth_min[:, 0]
        return DepthEstimatorOutput(predicted_depth=depth)
