"""GLPN depth estimator, TPU-native.

Semantics match reference src/transformers/models/glpn/modeling_glpn.py: the
encoder IS the SegFormer hierarchical transformer (same checkpoint naming,
reused from models/segformer); the decoder walks stages deepest-first with a
1x1 channel projection, Selective Feature Fusion (two-channel sigmoid
attention over local/global features, :423-464) and 2x bilinear upsampling,
then a conv-relu-conv head with sigmoid * max_depth (:535-556). SiLog loss
(:514) for training.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..segformer.modeling_segformer import SegformerModel
from .configuration_glpn import GLPNConfig


@dataclass
class DepthEstimatorOutput(ModelOutput):
    loss: Any = None
    predicted_depth: Any = None


def _upsample2x(x):
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), method="bilinear")


class GLPNSelectiveFeatureFusion(Module):
    def __init__(self, channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        l1 = Module(**kw)
        l1._children["0"] = Conv(channels * 2, channels, 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        l1._children["1"] = BatchNorm(channels, **kw)
        self.convolutional_layer1 = l1
        l2 = Module(**kw)
        l2._children["0"] = Conv(channels, channels // 2, 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        l2._children["1"] = BatchNorm(channels // 2, **kw)
        self.convolutional_layer2 = l2
        self.convolutional_layer3 = Conv(channels // 2, 2, 3, stride=1, padding=1, use_bias=True, ndim=2, **kw)

    def __call__(self, params, local_feat, global_feat):
        x = jnp.concatenate([local_feat, global_feat], axis=1)
        x = jax.nn.relu(self.convolutional_layer1._children["1"](
            params["convolutional_layer1"]["1"],
            self.convolutional_layer1._children["0"](params["convolutional_layer1"]["0"], x)))
        x = jax.nn.relu(self.convolutional_layer2._children["1"](
            params["convolutional_layer2"]["1"],
            self.convolutional_layer2._children["0"](params["convolutional_layer2"]["0"], x)))
        attn = jax.nn.sigmoid(self.convolutional_layer3(params["convolutional_layer3"], x))
        return local_feat * attn[:, 0:1] + global_feat * attn[:, 1:2]


class GLPNDecoderStage(Module):
    def __init__(self, in_ch, out_ch, with_fusion, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.has_conv = in_ch != out_ch
        if self.has_conv:
            self.convolution = Conv(in_ch, out_ch, 1, stride=1, padding=0, use_bias=True, ndim=2, **kw)
        self.with_fusion = with_fusion
        if with_fusion:
            self.fusion = GLPNSelectiveFeatureFusion(out_ch, **kw)

    def __call__(self, params, x, residual=None):
        if self.has_conv:
            x = self.convolution(params["convolution"], x)
        if self.with_fusion and residual is not None:
            x = self.fusion(params["fusion"], x, residual)
        return _upsample2x(x)


class GLPNDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        sizes = config.hidden_sizes[::-1]
        self.stages = [GLPNDecoderStage(h, config.decoder_hidden_size, i > 0, **kw)
                       for i, h in enumerate(sizes)]

    def __call__(self, params, stage_features):
        outs = []
        cur = None
        for i, feat in enumerate(stage_features[::-1]):
            cur = self.stages[i](params["stages"][str(i)], feat, cur)
            outs.append(cur)
        outs[-1] = _upsample2x(cur)
        return outs


class GLPNPreTrainedModel(PreTrainedModel):
    config_class = GLPNConfig
    base_model_prefix = "glpn"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class GLPNModelStandalone(GLPNPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.glpn = SegformerModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.glpn(params["glpn"], pixel_values, **kwargs)


class GLPNForDepthEstimation(GLPNPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.glpn = SegformerModel(config, **kw)
        self.decoder = GLPNDecoder(config, **kw)
        head = Module(**kw)
        head._children["0"] = Conv(config.decoder_hidden_size, config.decoder_hidden_size,
                                   3, stride=1, padding=1, use_bias=True, ndim=2, **kw)
        head._children["2"] = Conv(config.decoder_hidden_size, 1, 3, stride=1, padding=1,
                                   use_bias=True, ndim=2, **kw)
        outer = Module(**kw)
        outer._children["head"] = head
        self.head = outer

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> DepthEstimatorOutput:
        out = self.glpn(params["glpn"], pixel_values, output_hidden_states=True)
        feats = self.decoder(params["decoder"], list(out.hidden_states))
        x = feats[self.config.head_in_index]
        h = self.head._children["head"]
        x = h._children["2"](params["head"]["head"]["2"],
                             jax.nn.relu(h._children["0"](params["head"]["head"]["0"], x)))
        depth = jax.nn.sigmoid(x)[:, 0] * self.config.max_depth
        loss = None
        if labels is not None:
            # SiLog loss (reference :514): sqrt(mean d^2 - lambda * mean(d)^2)
            lab = jnp.asarray(labels, jnp.float32)
            valid = lab > 0
            d = jnp.where(valid, jnp.log(jnp.maximum(lab, 1e-8))
                          - jnp.log(jnp.maximum(depth, 1e-8)), 0.0)
            n = jnp.maximum(valid.sum(), 1)
            loss = jnp.sqrt((d**2).sum() / n - 0.5 * (d.sum() / n) ** 2)
        return DepthEstimatorOutput(loss=loss, predicted_depth=depth)
