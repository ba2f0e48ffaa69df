"""RegNet (reference src/transformers/models/regnet/modeling_regnet.py).

Conv tower of X/Y layers: 1x1 → grouped 3x3 → (squeeze-excite for Y) → 1x1,
conv-BN shortcut on shape changes, relu after the residual add."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_regnet import RegNetConfig


@dataclass
class RegNetModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


class RegNetConvLayer(Module):
    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, groups=1,
                 activation="relu", *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=kernel_size // 2, use_bias=False,
                                groups=groups, ndim=2, dtype=dtype,
                                param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, 1e-5, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(activation) if activation is not None else None

    def __call__(self, params, x):
        x = self.normalization(params["normalization"],
                               self.convolution(params["convolution"], x))
        return self.act(x) if self.act is not None else x


class RegNetShortCut(Module):
    def __init__(self, in_ch, out_ch, stride=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, 1, stride=stride, use_bias=False,
                                ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, 1e-5, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.normalization(params["normalization"],
                                  self.convolution(params["convolution"], x))


class RegNetSELayer(Module):
    """Squeeze-excite: pool → 1x1 relu → 1x1 sigmoid gate
    (Sequential indices 0/2 in the checkpoint)."""

    def __init__(self, in_ch, reduced, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.c1 = Conv(in_ch, reduced, 1, use_bias=True, ndim=2, **kw)
        self.c2 = Conv(reduced, in_ch, 1, use_bias=True, ndim=2, **kw)

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {"attention": {"0": self.c1.init(k1), "2": self.c2.init(k2)}}

    def __call__(self, params, x):
        pooled = x.mean(axis=(2, 3), keepdims=True)
        a = jax.nn.relu(self.c1(params["attention"]["0"], pooled))
        a = jax.nn.sigmoid(self.c2(params["attention"]["2"], a))
        return x * a


class RegNetLayer(Module):
    """X (no SE) or Y (with SE) residual layer."""

    def __init__(self, config, in_ch, out_ch, stride=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        groups = max(1, out_ch // config.groups_width)
        self.apply_shortcut = in_ch != out_ch or stride != 1
        if self.apply_shortcut:
            self.shortcut = RegNetShortCut(in_ch, out_ch, stride=stride, **kw)
        self.use_se = config.layer_type == "y"
        mods = [RegNetConvLayer(in_ch, out_ch, 1, activation=config.hidden_act, **kw),
                RegNetConvLayer(out_ch, out_ch, 3, stride=stride, groups=groups,
                                activation=config.hidden_act, **kw)]
        if self.use_se:
            mods.append(RegNetSELayer(out_ch, int(round(in_ch / 4)), **kw))
        mods.append(RegNetConvLayer(out_ch, out_ch, 1, activation=None, **kw))
        self.layer = mods
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        residual = x
        h = x
        for i, mod in enumerate(self.layer):
            h = mod(params["layer"][str(i)], h)
        if self.apply_shortcut:
            residual = self.shortcut(params["shortcut"], residual)
        return self.act(h + residual)


class RegNetModel(Module):
    def __init__(self, config: RegNetConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedder = _Embedder(config, **kw)
        stages = []
        dims = [(config.embedding_size, config.hidden_sizes[0],
                 2 if config.downsample_in_first_stage else 1, config.depths[0])]
        for (cin, cout), depth in zip(zip(config.hidden_sizes, config.hidden_sizes[1:]),
                                      config.depths[1:]):
            dims.append((cin, cout, 2, depth))
        for cin, cout, stride, depth in dims:
            layers = [RegNetLayer(config, cin, cout, stride, **kw)]
            layers += [RegNetLayer(config, cout, cout, **kw) for _ in range(depth - 1)]
            stages.append(_Stage(layers, **kw))
        self.encoder = _Encoder(stages, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.embedder(params["embedder"], jnp.asarray(pixel_values, self.dtype))
        all_hidden = [] if output_hidden_states else None
        for i, stage in enumerate(self.encoder.stages):
            if output_hidden_states:
                all_hidden.append(x)
            x = stage(params["encoder"]["stages"][str(i)], x)
        if output_hidden_states:
            all_hidden.append(x)
        pooled = x.mean(axis=(2, 3), keepdims=True)
        return RegNetModelOutput(
            last_hidden_state=x, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _Embedder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedder = RegNetConvLayer(config.num_channels, config.embedding_size, 3,
                                        stride=2, activation=config.hidden_act,
                                        dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.embedder(params["embedder"], x)


class _Stage(Module):
    def __init__(self, layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = layers

    def __call__(self, params, x):
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return x


class _Encoder(Module):
    def __init__(self, stages, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = stages


class RegNetPreTrainedModel(PreTrainedModel):
    config_class = RegNetConfig
    base_model_prefix = "regnet"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


class RegNetModelStandalone(RegNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.regnet = RegNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.regnet(params["regnet"], pixel_values, **kwargs)


class _SeqClassifier(Module):
    """torch Sequential(Flatten, Linear) — Linear at checkpoint index 1."""

    def __init__(self, din, dout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "1", Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype,
                                  kernel_init=normal_init(0.02)))

    def __call__(self, params, x):
        return getattr(self, "1")(params["1"], x)


class RegNetForImageClassification(RegNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.regnet = RegNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = _SeqClassifier(config.hidden_sizes[-1], config.num_labels,
                                         dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.regnet(params["regnet"], pixel_values)
        pooled = out.pooler_output.reshape(out.pooler_output.shape[0], -1)
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
