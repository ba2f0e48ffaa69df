"""HGNet-V2 (reference models/hgnet_v2/modeling_hgnet_v2.py; the RT-DETR /
D-FINE detection backbone).

Conv stem with a parallel max-pool / 2x2-conv branch concat (:130-194),
stages of HGNet basic layers: ``layer_num`` (light) conv blocks whose
outputs are concatenated with the input and squeezed/excited by two 1x1
convs (:196-265), optional LearnableAffineBlock scale/bias after each
activation (:57-66), depthwise downsample per stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import BatchNorm, Conv, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class HGNetV2Config(PretrainedConfig):
    model_type = "hgnet_v2"

    def __init__(self, num_channels=3, embedding_size=64, depths=(3, 4, 6, 3),
                 hidden_sizes=(256, 512, 1024, 2048), hidden_act="relu",
                 out_features=None, out_indices=None, stem_channels=(3, 32, 48),
                 stage_in_channels=(48, 128, 512, 1024),
                 stage_mid_channels=(48, 96, 192, 384),
                 stage_out_channels=(128, 512, 1024, 2048),
                 stage_num_blocks=(1, 1, 3, 1),
                 stage_downsample=(False, True, True, True),
                 stage_light_block=(False, False, True, True),
                 stage_kernel_size=(3, 3, 5, 5), stage_numb_of_layers=(6, 6, 6, 6),
                 use_learnable_affine_block=False, initializer_range=0.02, **kwargs):
        self.num_channels = num_channels
        self.embedding_size = embedding_size
        self.depths = list(depths)
        self.hidden_sizes = list(hidden_sizes)
        self.hidden_act = hidden_act
        self.out_features = out_features
        self.out_indices = out_indices
        self.stem_channels = list(stem_channels)
        self.stage_in_channels = list(stage_in_channels)
        self.stage_mid_channels = list(stage_mid_channels)
        self.stage_out_channels = list(stage_out_channels)
        self.stage_num_blocks = list(stage_num_blocks)
        self.stage_downsample = list(stage_downsample)
        self.stage_light_block = list(stage_light_block)
        self.stage_kernel_size = list(stage_kernel_size)
        self.stage_numb_of_layers = list(stage_numb_of_layers)
        self.use_learnable_affine_block = use_learnable_affine_block
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class HGNetV2ConvLayer(Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 activation="relu", use_lab=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convolution = Conv(in_ch, out_ch, kernel_size, stride=stride,
                                groups=groups, padding=(kernel_size - 1) // 2,
                                use_bias=False, ndim=2, **kw)
        self.normalization = BatchNorm(out_ch, 1e-5, **kw)
        self.act = get_activation(activation) if activation is not None else None
        self.use_lab = bool(activation) and use_lab
        if self.use_lab:
            lab = Module(**kw)
            self.lab = lab

    def init(self, rng):
        params = super().init(rng)
        if self.use_lab:
            params["lab"] = {"scale": jnp.ones((1,), self.param_dtype),
                             "bias": jnp.zeros((1,), self.param_dtype)}
        return params

    def __call__(self, params, x):
        x = self.normalization(params["normalization"],
                               self.convolution(params["convolution"], x))
        if self.act is not None:
            x = self.act(x)
        if self.use_lab:
            x = params["lab"]["scale"].astype(x.dtype) * x \
                + params["lab"]["bias"].astype(x.dtype)
        return x


class HGNetV2ConvLayerLight(Module):
    def __init__(self, in_ch, out_ch, kernel_size, use_lab=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = HGNetV2ConvLayer(in_ch, out_ch, 1, activation=None,
                                      use_lab=use_lab, **kw)
        self.conv2 = HGNetV2ConvLayer(out_ch, out_ch, kernel_size, groups=out_ch,
                                      use_lab=use_lab, **kw)

    def __call__(self, params, x):
        return self.conv2(params["conv2"], self.conv1(params["conv1"], x))


def _maxpool2_s1(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                 (1, 1, 1, 1), "VALID")


class HGNetV2Embeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lab = config.use_learnable_affine_block
        act = config.hidden_act
        c = config.stem_channels
        self.stem1 = HGNetV2ConvLayer(c[0], c[1], 3, stride=2, activation=act,
                                      use_lab=lab, **kw)
        self.stem2a = HGNetV2ConvLayer(c[1], c[1] // 2, 2, stride=1, activation=act,
                                       use_lab=lab, **kw)
        self.stem2b = HGNetV2ConvLayer(c[1] // 2, c[1], 2, stride=1, activation=act,
                                       use_lab=lab, **kw)
        self.stem3 = HGNetV2ConvLayer(c[1] * 2, c[1], 3, stride=2, activation=act,
                                      use_lab=lab, **kw)
        self.stem4 = HGNetV2ConvLayer(c[1], c[2], 1, stride=1, activation=act,
                                      use_lab=lab, **kw)

    def __call__(self, params, pixel_values):
        x = self.stem1(params["stem1"], pixel_values)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
        a = self.stem2a(params["stem2a"], x)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 1), (0, 1)))
        a = self.stem2b(params["stem2b"], a)
        pooled = _maxpool2_s1(x)
        x = jnp.concatenate([pooled, a], axis=1)
        x = self.stem3(params["stem3"], x)
        return self.stem4(params["stem4"], x)


class HGNetV2BasicLayer(Module):
    def __init__(self, in_ch, mid_ch, out_ch, layer_num, kernel_size=3,
                 residual=False, light_block=False, use_lab=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.residual = residual
        layers = []
        for i in range(layer_num):
            ic = in_ch if i == 0 else mid_ch
            if light_block:
                layers.append(HGNetV2ConvLayerLight(ic, mid_ch, kernel_size,
                                                    use_lab=use_lab, **kw))
            else:
                layers.append(HGNetV2ConvLayer(ic, mid_ch, kernel_size,
                                               use_lab=use_lab, **kw))
        self.layers = layers
        total = in_ch + layer_num * mid_ch
        agg = Module(**kw)
        setattr(agg, "0", HGNetV2ConvLayer(total, out_ch // 2, 1, use_lab=use_lab, **kw))
        setattr(agg, "1", HGNetV2ConvLayer(out_ch // 2, out_ch, 1, use_lab=use_lab, **kw))
        self.aggregation = agg

    def __call__(self, params, x):
        identity = x
        outs = [x]
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
            outs.append(x)
        x = jnp.concatenate(outs, axis=1)
        x = getattr(self.aggregation, "0")(params["aggregation"]["0"], x)
        x = getattr(self.aggregation, "1")(params["aggregation"]["1"], x)
        if self.residual:
            x = x + identity
        return x


class HGNetV2Stage(Module):
    def __init__(self, config, stage_index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        s = stage_index
        in_ch = config.stage_in_channels[s]
        if config.stage_downsample[s]:
            self.downsample = HGNetV2ConvLayer(in_ch, in_ch, 3, stride=2,
                                               groups=in_ch, activation=None, **kw)
        else:
            self.downsample = None
        self.blocks = [HGNetV2BasicLayer(
            in_ch if i == 0 else config.stage_out_channels[s],
            config.stage_mid_channels[s], config.stage_out_channels[s],
            config.stage_numb_of_layers[s], kernel_size=config.stage_kernel_size[s],
            residual=(i != 0), light_block=config.stage_light_block[s],
            use_lab=config.use_learnable_affine_block, **kw)
            for i in range(config.stage_num_blocks[s])]

    def __call__(self, params, x):
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x)
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][str(i)], x)
        return x


class HGNetV2Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = [HGNetV2Stage(config, i, dtype=dtype, param_dtype=param_dtype)
                       for i in range(len(config.stage_in_channels))]

    def __call__(self, params, x, output_hidden_states=False):
        all_hidden = [x] if output_hidden_states else None
        for i, stage in enumerate(self.stages):
            x = stage(params["stages"][str(i)], x)
            if output_hidden_states:
                all_hidden.append(x)
        return x, all_hidden


class HGNetV2PreTrainedModel(PreTrainedModel):
    config_class = HGNetV2Config
    base_model_prefix = "hgnetv2"
    main_input_name = "pixel_values"


class HGNetV2Backbone(HGNetV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embedder = HGNetV2Embeddings(config, **kw)
        self.encoder = HGNetV2Encoder(config, **kw)

    def __call__(self, params, pixel_values, output_hidden_states=True, **kwargs):
        x = self.embedder(params["embedder"], pixel_values)
        last, all_hidden = self.encoder(params["encoder"], x,
                                        output_hidden_states=True)
        from ...modeling_outputs import BaseModelOutput

        return BaseModelOutput(last_hidden_state=last,
                               hidden_states=tuple(all_hidden))


class HGNetV2ForImageClassification(HGNetV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.embedder = HGNetV2Embeddings(config, **kw)
        self.encoder = HGNetV2Encoder(config, **kw)
        self.fc = Linear(config.hidden_sizes[-1], config.num_labels, True,
                         kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        x = self.embedder(params["embedder"], pixel_values)
        x, all_hidden = self.encoder(params["encoder"], x, output_hidden_states)
        pooled = x.mean(axis=(2, 3))
        logits = self.fc(params["fc"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        from ...modeling_outputs import ImageClassifierOutput

        return ImageClassifierOutput(
            loss=loss, logits=logits,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)
