"""ConvNeXt V2 (reference src/transformers/models/convnextv2/modeling_convnextv2.py).

ConvNeXt with Global Response Normalization in place of layer scale: after
the GELU, features are scaled by their global spatial L2 norm normalized
across channels (reference ConvNextV2GRN :39-53), ``weight * (x * Nx) +
bias + x``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ImageClassifierOutput
from ...ops.activations import get_activation
from ..convnext.modeling_convnext import (
    ConvNextEmbeddings,
    ConvNextEncoder,
    ConvNextForImageClassification,
    ConvNextModel,
    ConvNextModelStandalone,
    ConvNextPreTrainedModel,
    ConvNextStage,
)
from .configuration_convnextv2 import ConvNextV2Config


class ConvNextV2GRN(Module):
    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim

    def init(self, rng):
        return {"weight": jnp.zeros((1, 1, 1, self.dim), self.param_dtype),
                "bias": jnp.zeros((1, 1, 1, self.dim), self.param_dtype)}

    def __call__(self, params, x):  # [B, H, W, C] channels-last
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        w = params["weight"].astype(x.dtype)
        b = params["bias"].astype(x.dtype)
        return w * (x * nx) + b + x


class ConvNextV2Block(Module):
    """dwconv -> LN -> pwconv1 -> GELU -> GRN -> pwconv2 (reference :133)."""

    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dwconv = Conv(dim, dim, 7, stride=1, padding=3, use_bias=True, groups=dim,
                           ndim=2, **kw)
        self.layernorm = LayerNorm(dim, 1e-6, **kw)
        self.pwconv1 = Linear(dim, 4 * dim, True, **lkw)
        self.grn = ConvNextV2GRN(4 * dim, **kw)
        self.pwconv2 = Linear(4 * dim, dim, True, **lkw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):  # [N, C, H, W]
        residual = x
        h = self.dwconv(params["dwconv"], x)
        h = jnp.transpose(h, (0, 2, 3, 1))
        h = self.layernorm(params["layernorm"], h)
        h = self.act(self.pwconv1(params["pwconv1"], h))
        h = self.grn(params["grn"], h)
        h = self.pwconv2(params["pwconv2"], h)
        h = jnp.transpose(h, (0, 3, 1, 2))
        return residual + h


class ConvNextV2Stage(ConvNextStage):
    def __init__(self, config, in_ch, out_ch, stride=2, depth=2, *, dtype, param_dtype):
        super().__init__(config, in_ch, out_ch, stride=stride, depth=depth,
                         dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [ConvNextV2Block(config, out_ch, **kw) for _ in range(depth)]


class ConvNextV2Encoder(ConvNextEncoder):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        stages = []
        prev = config.hidden_sizes[0]
        for i in range(config.num_stages):
            out = config.hidden_sizes[i]
            stages.append(ConvNextV2Stage(config, prev, out, stride=2 if i > 0 else 1,
                                          depth=config.depths[i], **kw))
            prev = out
        self.stages = stages


class ConvNextV2Model(ConvNextModel):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ConvNextEmbeddings(config, **kw)
        self.encoder = ConvNextV2Encoder(config, **kw)


class ConvNextV2PreTrainedModel(ConvNextPreTrainedModel):
    config_class = ConvNextV2Config
    base_model_prefix = "convnextv2"


class ConvNextV2ModelStandalone(ConvNextV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.convnextv2 = ConvNextV2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.convnextv2(params["convnextv2"], pixel_values, **kwargs)


class ConvNextV2ForImageClassification(ConvNextV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.convnextv2 = ConvNextV2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> ImageClassifierOutput:
        out = self.convnextv2(params["convnextv2"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits)
