"""MobileNetV1 (reference models/mobilenet_v1/modeling_mobilenet_v1.py).

Depthwise-separable conv tower: stem 3x3 s2, then 13 (depthwise 3x3 +
pointwise 1x1) pairs with the canonical stride pattern (:154), TF "SAME"
padding semantics, BatchNorm on stored stats, global average pooling and a
linear classifier (:240-276).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..mobilenet_v2.modeling_mobilenet_v2 import tf_same_pad


class MobileNetV1Config(PretrainedConfig):
    model_type = "mobilenet_v1"

    def __init__(self, num_channels=3, image_size=224, depth_multiplier=1.0,
                 min_depth=8, hidden_act="relu6", tf_padding=True,
                 classifier_dropout_prob=0.999, initializer_range=0.02,
                 layer_norm_eps=0.001, **kwargs):
        self.num_channels = num_channels
        self.image_size = image_size
        self.depth_multiplier = depth_multiplier
        self.min_depth = min_depth
        self.hidden_act = hidden_act
        self.tf_padding = tf_padding
        self.classifier_dropout_prob = classifier_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        super().__init__(**kwargs)


@dataclass
class MobileNetV1ModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


class MobileNetV1ConvLayer(Module):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.tf_padding = config.tf_padding
        self.kernel, self.stride = kernel_size, stride
        padding = 0 if config.tf_padding else (kernel_size - 1) // 2
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                padding=padding, use_bias=False, groups=groups,
                                ndim=2, dtype=dtype, param_dtype=param_dtype)
        self.normalization = BatchNorm(out_ch, config.layer_norm_eps, dtype=dtype,
                                       param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        if self.tf_padding:
            x = tf_same_pad(x, self.kernel, self.stride, 1)
        x = self.convolution(params["convolution"], x)
        x = self.normalization(params["normalization"], x)
        return self.act(x)


class MobileNetV1Model(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        depth = 32
        out_ch = max(int(depth * config.depth_multiplier), config.min_depth)
        self.conv_stem = MobileNetV1ConvLayer(config, config.num_channels, out_ch, 3,
                                              stride=2, **kw)
        strides = [1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1]
        layers = []
        for i in range(13):
            in_ch = out_ch
            if strides[i] == 2 or i == 0:
                depth *= 2
                out_ch = max(int(depth * config.depth_multiplier), config.min_depth)
            layers.append(MobileNetV1ConvLayer(config, in_ch, in_ch, 3,
                                               stride=strides[i], groups=in_ch, **kw))
            layers.append(MobileNetV1ConvLayer(config, in_ch, out_ch, 1, **kw))
        self.layer = layers
        self.last_hidden_size = out_ch

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.conv_stem(params["conv_stem"], pixel_values)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        pooled = jnp.mean(x, axis=(2, 3))
        return MobileNetV1ModelOutput(
            last_hidden_state=x, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class MobileNetV1PreTrainedModel(PreTrainedModel):
    config_class = MobileNetV1Config
    base_model_prefix = "mobilenet_v1"
    main_input_name = "pixel_values"


class MobileNetV1ModelStandalone(MobileNetV1PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilenet_v1 = MobileNetV1Model(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.mobilenet_v1(params["mobilenet_v1"], pixel_values, **kwargs)


class MobileNetV1ForImageClassification(MobileNetV1PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.mobilenet_v1 = MobileNetV1Model(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)
        self.classifier = Linear(self.mobilenet_v1.last_hidden_size, config.num_labels,
                                 True, dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        outputs = self.mobilenet_v1(params["mobilenet_v1"], pixel_values,
                                    output_hidden_states=output_hidden_states)
        logits = self.classifier(params["classifier"], outputs.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import ImageClassifierOutput

        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
