"""ConvNeXt, TPU-native.

Semantics match reference src/transformers/models/convnext/modeling_convnext.py:
patch-conv stem + channels-first LayerNorm (:65-88), stages of
[LN + 2x2 downsample conv] followed by blocks of depthwise 7x7 conv ->
channels-last LN -> pwconv1 -> GELU -> pwconv2 -> layer-scale -> residual
(:114-160), final LayerNorm over the mean-pooled features (:251-282).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_convnext import ConvNextConfig


class ConvNextChannelsFirstLayerNorm(LayerNorm):
    """LayerNorm over the channel dim of [N, C, H, W] (reference :39)."""

    def __call__(self, params, x):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = super().__call__(params, h)
        return jnp.transpose(h, (0, 3, 1, 2))


class ConvNextBlock(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dwconv = Conv(dim, dim, 7, stride=1, padding=3, use_bias=True, groups=dim,
                           ndim=2, **kw)
        self.layernorm = LayerNorm(dim, 1e-6, **kw)
        self.pwconv1 = Linear(dim, 4 * dim, True, **lkw)
        self.pwconv2 = Linear(4 * dim, dim, True, **lkw)
        self.act = get_activation(config.hidden_act)
        self.use_layer_scale = config.layer_scale_init_value > 0
        self.dim = dim
        self.layer_scale_init_value = config.layer_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        if self.use_layer_scale:
            params["layer_scale_parameter"] = jnp.full(
                (self.dim,), self.layer_scale_init_value, self.param_dtype)
        return params

    def __call__(self, params, x):  # [N, C, H, W]
        residual = x
        h = self.dwconv(params["dwconv"], x)
        h = jnp.transpose(h, (0, 2, 3, 1))  # channels last
        h = self.layernorm(params["layernorm"], h)
        h = self.pwconv2(params["pwconv2"], self.act(self.pwconv1(params["pwconv1"], h)))
        if self.use_layer_scale:
            h = params["layer_scale_parameter"].astype(h.dtype) * h
        h = jnp.transpose(h, (0, 3, 1, 2))
        return residual + h


class ConvNextStage(Module):
    def __init__(self, config, in_ch, out_ch, stride=2, depth=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.has_downsample = in_ch != out_ch or stride > 1
        if self.has_downsample:
            ds = Module(**kw)
            ds._children["0"] = ConvNextChannelsFirstLayerNorm(in_ch, 1e-6, **kw)
            ds._children["1"] = Conv(in_ch, out_ch, 2, stride=stride, padding=0,
                                     use_bias=True, ndim=2, **kw)
            self.downsampling_layer = ds
        self.layers = [ConvNextBlock(config, out_ch, **kw) for _ in range(depth)]

    def __call__(self, params, x):
        if self.has_downsample:
            x = self.downsampling_layer._children["0"](params["downsampling_layer"]["0"], x)
            x = self.downsampling_layer._children["1"](params["downsampling_layer"]["1"], x)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class ConvNextEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings = Conv(config.num_channels, config.hidden_sizes[0],
                                     config.patch_size, stride=config.patch_size,
                                     padding=0, use_bias=True, ndim=2, **kw)
        self.layernorm = ConvNextChannelsFirstLayerNorm(config.hidden_sizes[0], 1e-6, **kw)

    def __call__(self, params, pixel_values):
        x = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        return self.layernorm(params["layernorm"], x)


class ConvNextEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        stages = []
        prev = config.hidden_sizes[0]
        for i in range(config.num_stages):
            out = config.hidden_sizes[i]
            stages.append(ConvNextStage(config, prev, out, stride=2 if i > 0 else 1,
                                        depth=config.depths[i], **kw))
            prev = out
        self.stages = stages

    def __call__(self, params, x):
        hidden_states = [x]
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            hidden_states.append(x)
        return x, hidden_states


class ConvNextPreTrainedModel(PreTrainedModel):
    config_class = ConvNextConfig
    base_model_prefix = "convnext"
    main_input_name = "pixel_values"


class ConvNextModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ConvNextEmbeddings(config, **kw)
        self.encoder = ConvNextEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_sizes[-1], config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        x = self.embeddings(params["embeddings"], jnp.asarray(pixel_values, self.dtype))
        last, hidden_states = self.encoder(params["encoder"], x)
        pooled = self.layernorm(params["layernorm"], jnp.mean(last, axis=(2, 3)))
        return BaseModelOutputWithPooling(
            last_hidden_state=last, pooler_output=pooled,
            hidden_states=tuple(hidden_states) if output_hidden_states else None)


class ConvNextModelStandalone(ConvNextPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.convnext = ConvNextModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.convnext(params["convnext"], pixel_values, **kwargs)


class ConvNextForImageClassification(ConvNextPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.convnext = ConvNextModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> ImageClassifierOutput:
        out = self.convnext(params["convnext"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits)
