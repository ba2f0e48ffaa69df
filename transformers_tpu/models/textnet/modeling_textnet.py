"""TextNet (reference models/textnet/modeling_textnet.py).

RepVGG-style backbone for text detection: conv stem + stages of
re-parameterizable blocks summing a main KxK conv, optional vertical (Kx1)
and horizontal (1xK) convs, and an identity BatchNorm branch when shapes
allow (:73-162), each BatchNorm'd, then ReLU. Pooling: 2x2 adaptive-average
in the base model, 1x1 in the classification head (:226-284).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput


class TextNetConfig(PretrainedConfig):
    model_type = "textnet"

    def __init__(self, stem_kernel_size=3, stem_stride=2, stem_num_channels=3,
                 stem_out_channels=64, stem_act_func="relu", image_size=(640, 640),
                 conv_layer_kernel_sizes=None, conv_layer_strides=None,
                 hidden_sizes=(64, 64, 128, 256, 512), batch_norm_eps=1e-5,
                 initializer_range=0.02, out_features=None, out_indices=None, **kwargs):
        if conv_layer_kernel_sizes is None:
            conv_layer_kernel_sizes = [
                [[3, 3], [3, 3], [3, 3]],
                [[3, 3], [1, 3], [3, 3], [3, 1]],
                [[3, 3], [3, 3], [3, 1], [1, 3]],
                [[3, 3], [3, 1], [1, 3], [3, 3]],
            ]
        if conv_layer_strides is None:
            conv_layer_strides = [[1, 2, 1], [2, 1, 1, 1], [2, 1, 1, 1], [2, 1, 1, 1]]
        self.stem_kernel_size = stem_kernel_size
        self.stem_stride = stem_stride
        self.stem_num_channels = stem_num_channels
        self.stem_out_channels = stem_out_channels
        self.stem_act_func = stem_act_func
        self.image_size = list(image_size)
        self.conv_layer_kernel_sizes = conv_layer_kernel_sizes
        self.conv_layer_strides = conv_layer_strides
        self.hidden_sizes = list(hidden_sizes)
        self.batch_norm_eps = batch_norm_eps
        self.initializer_range = initializer_range
        self.out_features = out_features
        self.out_indices = out_indices
        super().__init__(**kwargs)


@dataclass
class TextNetModelOutput(ModelOutput):
    last_hidden_state: Any = None
    pooler_output: Any = None
    hidden_states: Any = None


class TextNetRepConvLayer(Module):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kh, kv = kernel_size
        pad = ((kh - 1) // 2, (kv - 1) // 2)
        self.main_conv = Conv(in_ch, out_ch, (kh, kv), stride=stride, padding=pad,
                              use_bias=False, ndim=2, **kw)
        self.main_batch_norm = BatchNorm(out_ch, config.batch_norm_eps, **kw)
        if kv != 1:
            self.vertical_conv = Conv(in_ch, out_ch, (kh, 1), stride=stride,
                                      padding=((kh - 1) // 2, 0), use_bias=False,
                                      ndim=2, **kw)
            self.vertical_batch_norm = BatchNorm(out_ch, config.batch_norm_eps, **kw)
        else:
            self.vertical_conv = None
        if kh != 1:
            self.horizontal_conv = Conv(in_ch, out_ch, (1, kv), stride=stride,
                                        padding=(0, (kv - 1) // 2), use_bias=False,
                                        ndim=2, **kw)
            self.horizontal_batch_norm = BatchNorm(out_ch, config.batch_norm_eps, **kw)
        else:
            self.horizontal_conv = None
        if out_ch == in_ch and stride == 1:
            self.rbr_identity = BatchNorm(in_ch, config.batch_norm_eps, **kw)
        else:
            self.rbr_identity = None

    def __call__(self, params, x):
        out = self.main_batch_norm(params["main_batch_norm"],
                                   self.main_conv(params["main_conv"], x))
        if self.vertical_conv is not None:
            out = out + self.vertical_batch_norm(
                params["vertical_batch_norm"], self.vertical_conv(params["vertical_conv"], x))
        if self.horizontal_conv is not None:
            out = out + self.horizontal_batch_norm(
                params["horizontal_batch_norm"],
                self.horizontal_conv(params["horizontal_conv"], x))
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(params["rbr_identity"], x)
        return jax.nn.relu(out)


class TextNetModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        stem = Module(**kw)
        stem.conv = Conv(config.stem_num_channels, config.stem_out_channels,
                         config.stem_kernel_size, stride=config.stem_stride,
                         padding=config.stem_kernel_size // 2, use_bias=False,
                         ndim=2, **kw)
        stem.batch_norm = BatchNorm(config.stem_out_channels, config.batch_norm_eps, **kw)
        self.stem = stem
        self.stem_act = (get_activation(config.stem_act_func)
                         if config.stem_act_func is not None else None)
        stages = []
        for s, (kernels, strides) in enumerate(zip(config.conv_layer_kernel_sizes,
                                                   config.conv_layer_strides)):
            in_ch = [config.hidden_sizes[s]] + [config.hidden_sizes[s + 1]] * (len(kernels) - 1)
            stage = Module(**kw)
            stage.stage = [TextNetRepConvLayer(config, ic, config.hidden_sizes[s + 1],
                                               ks, st, **kw)
                           for ic, ks, st in zip(in_ch, kernels, strides)]
            stages.append(stage)
        encoder = Module(**kw)
        encoder.stages = stages
        self.encoder = encoder

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = self.stem.batch_norm(params["stem"]["batch_norm"],
                                 self.stem.conv(params["stem"]["conv"], pixel_values))
        if self.stem_act is not None:
            x = self.stem_act(x)
        all_hidden = [x] if output_hidden_states else None
        for i, stage in enumerate(self.encoder.stages):
            sp = params["encoder"]["stages"][str(i)]["stage"]
            for j, block in enumerate(stage.stage):
                x = block(sp[str(j)], x)
            if output_hidden_states:
                all_hidden.append(x)
        pooled = _adaptive_avg_pool(x, 2)
        return TextNetModelOutput(
            last_hidden_state=x, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


def _adaptive_avg_pool(x, out):
    """torch AdaptiveAvgPool2d bins: [floor(i*h/out), ceil((i+1)*h/out))."""
    b, c, h, w = x.shape

    def pool_axis(arr, size, axis):
        parts = []
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)
            parts.append(jnp.take(arr, jnp.arange(lo, hi), axis=axis).mean(
                axis=axis, keepdims=True))
        return jnp.concatenate(parts, axis=axis)

    return pool_axis(pool_axis(x, h, 2), w, 3)


class TextNetPreTrainedModel(PreTrainedModel):
    config_class = TextNetConfig
    base_model_prefix = "textnet"
    main_input_name = "pixel_values"


class TextNetModelStandalone(TextNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.textnet = TextNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.textnet(params["textnet"], pixel_values, **kwargs)


class TextNetForImageClassification(TextNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.textnet = TextNetModel(config, **kw)
        self.fc = Linear(config.hidden_sizes[-1], config.num_labels, True,
                         kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        outputs = self.textnet(params["textnet"], pixel_values,
                               output_hidden_states=output_hidden_states)
        pooled = outputs.last_hidden_state.mean(axis=(2, 3))
        logits = self.fc(params["fc"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import ImageClassifierOutput

        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
