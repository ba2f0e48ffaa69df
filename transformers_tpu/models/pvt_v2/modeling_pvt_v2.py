"""PVTv2 (reference models/pvt_v2/modeling_pvt_v2.py).

Hierarchical pyramid ViT b-series (also the backbone of Segformer-style
heads): overlapping conv patch embeddings per stage (:37-63), spatial-
reduction attention — k/v computed on a strided-conv-reduced (or, in the
``linear_attention`` variant, 7x7-adaptive-pooled + GELU) token grid
(:85-175) — and a conv feed-forward with a depthwise 3x3 positional conv
(:177-201). Stages reshape tokens back to feature maps (:320-345).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..textnet.modeling_textnet import _adaptive_avg_pool


class PvtV2Config(PretrainedConfig):
    model_type = "pvt_v2"

    def __init__(self, image_size=224, num_channels=3, num_encoder_blocks=4,
                 depths=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1),
                 hidden_sizes=(32, 64, 160, 256), patch_sizes=(7, 3, 3, 3),
                 strides=(4, 2, 2, 2), num_attention_heads=(1, 2, 5, 8),
                 mlp_ratios=(8, 8, 4, 4), hidden_act="gelu",
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 initializer_range=0.02, drop_path_rate=0.0, layer_norm_eps=1e-6,
                 qkv_bias=True, linear_attention=False, out_features=None,
                 out_indices=None, **kwargs):
        self.image_size = image_size
        self.num_channels = num_channels
        self.num_encoder_blocks = num_encoder_blocks
        self.depths = list(depths)
        self.sr_ratios = list(sr_ratios)
        self.hidden_sizes = list(hidden_sizes)
        self.patch_sizes = list(patch_sizes)
        self.strides = list(strides)
        self.num_attention_heads = list(num_attention_heads)
        self.mlp_ratios = list(mlp_ratios)
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.drop_path_rate = drop_path_rate
        self.layer_norm_eps = layer_norm_eps
        self.qkv_bias = qkv_bias
        self.linear_attention = linear_attention
        self.out_features = out_features
        self.out_indices = out_indices
        super().__init__(**kwargs)


class PvtV2SelfAttention(Module):
    def __init__(self, config, hidden_size, num_heads, sr_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.linear_attention = config.linear_attention
        self.hidden_size = hidden_size
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.sr_ratio = sr_ratio
        self.query = Linear(hidden_size, hidden_size, config.qkv_bias, **lkw)
        self.key = Linear(hidden_size, hidden_size, config.qkv_bias, **lkw)
        self.value = Linear(hidden_size, hidden_size, config.qkv_bias, **lkw)
        self.proj = Linear(hidden_size, hidden_size, True, **lkw)
        if self.linear_attention:
            self.spatial_reduction = Conv(hidden_size, hidden_size, 1, stride=1,
                                          use_bias=True, ndim=2, **kw)
            self.layer_norm = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        elif sr_ratio > 1:
            self.spatial_reduction = Conv(hidden_size, hidden_size, sr_ratio,
                                          stride=sr_ratio, use_bias=True, ndim=2, **kw)
            self.layer_norm = LayerNorm(hidden_size, config.layer_norm_eps, **kw)

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim)

    def __call__(self, params, hidden, height, width):
        b, s, c = hidden.shape
        q = self._heads(self.query(params["query"], hidden))
        kv_in = hidden
        if self.linear_attention:
            grid = hidden.transpose(0, 2, 1).reshape(b, c, height, width)
            grid = _adaptive_avg_pool(grid, 7)
            grid = self.spatial_reduction(params["spatial_reduction"], grid)
            kv_in = grid.reshape(b, c, -1).transpose(0, 2, 1)
            kv_in = jax.nn.gelu(self.layer_norm(params["layer_norm"], kv_in),
                                approximate=False)
        elif self.sr_ratio > 1:
            grid = hidden.transpose(0, 2, 1).reshape(b, c, height, width)
            grid = self.spatial_reduction(params["spatial_reduction"], grid)
            kv_in = grid.reshape(b, c, -1).transpose(0, 2, 1)
            kv_in = self.layer_norm(params["layer_norm"], kv_in)
        k = self._heads(self.key(params["key"], kv_in))
        v = self._heads(self.value(params["value"], kv_in))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)
        return self.proj(params["proj"], ctx)


class PvtV2ConvFFN(Module):
    def __init__(self, config, in_features, hidden_features, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dense1 = Linear(in_features, hidden_features, True, **lkw)
        dwconv = Module(**kw)
        dwconv.dwconv = Conv(hidden_features, hidden_features, 3, stride=1, padding=1,
                             groups=hidden_features, use_bias=True, ndim=2, **kw)
        self.dwconv = dwconv
        self.dense2 = Linear(hidden_features, in_features, True, **lkw)
        self.act = get_activation(config.hidden_act)
        self.use_relu = config.linear_attention

    def __call__(self, params, x, height, width):
        x = self.dense1(params["dense1"], x)
        if self.use_relu:
            x = jax.nn.relu(x)
        b, s, c = x.shape
        grid = x.transpose(0, 2, 1).reshape(b, c, height, width)
        grid = self.dwconv.dwconv(params["dwconv"]["dwconv"], grid)
        x = grid.reshape(b, c, -1).transpose(0, 2, 1)
        x = self.act(x)
        return self.dense2(params["dense2"], x)


class PvtV2BlockLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = config.hidden_sizes[layer_idx]
        self.layer_norm_1 = LayerNorm(hidden, config.layer_norm_eps, **kw)
        self.attention = PvtV2SelfAttention(config, hidden,
                                            config.num_attention_heads[layer_idx],
                                            config.sr_ratios[layer_idx], **kw)
        self.layer_norm_2 = LayerNorm(hidden, config.layer_norm_eps, **kw)
        self.mlp = PvtV2ConvFFN(config, hidden,
                                int(hidden * config.mlp_ratios[layer_idx]), **kw)

    def __call__(self, params, hidden, height, width):
        attn = self.attention(params["attention"],
                              self.layer_norm_1(params["layer_norm_1"], hidden),
                              height, width)
        hidden = attn + hidden
        mlp = self.mlp(params["mlp"], self.layer_norm_2(params["layer_norm_2"], hidden),
                       height, width)
        return hidden + mlp


class PvtV2EncoderLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        patch = config.patch_sizes[layer_idx]
        in_ch = config.num_channels if layer_idx == 0 else config.hidden_sizes[layer_idx - 1]
        hidden = config.hidden_sizes[layer_idx]
        pe = Module(**kw)
        pe.proj = Conv(in_ch, hidden, patch, stride=config.strides[layer_idx],
                       padding=patch // 2, use_bias=True, ndim=2, **kw)
        pe.layer_norm = LayerNorm(hidden, config.layer_norm_eps, **kw)
        self.patch_embedding = pe
        self.blocks = [PvtV2BlockLayer(config, layer_idx, **kw)
                       for _ in range(config.depths[layer_idx])]
        self.layer_norm = LayerNorm(hidden, config.layer_norm_eps, **kw)

    def __call__(self, params, x):
        grid = self.patch_embedding.proj(params["patch_embedding"]["proj"], x)
        b, c, h, w = grid.shape
        tokens = grid.reshape(b, c, -1).transpose(0, 2, 1)
        tokens = self.patch_embedding.layer_norm(
            params["patch_embedding"]["layer_norm"], tokens)
        for i, block in enumerate(self.blocks):
            tokens = block(params["blocks"][str(i)], tokens, h, w)
        tokens = self.layer_norm(params["layer_norm"], tokens)
        return tokens, h, w


class PvtV2Model(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        encoder = Module(dtype=dtype, param_dtype=param_dtype)
        encoder.layers = [PvtV2EncoderLayer(config, i, dtype=dtype, param_dtype=param_dtype)
                          for i in range(config.num_encoder_blocks)]
        self.encoder = encoder

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x = pixel_values
        all_hidden = [] if output_hidden_states else None
        b = x.shape[0]
        for i, layer in enumerate(self.encoder.layers):
            tokens, h, w = layer(params["encoder"]["layers"][str(i)], x)
            x = tokens.reshape(b, h, w, -1).transpose(0, 3, 1, 2)
            if output_hidden_states:
                all_hidden.append(x)
        return BaseModelOutput(
            last_hidden_state=x,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class PvtV2PreTrainedModel(PreTrainedModel):
    config_class = PvtV2Config
    base_model_prefix = "pvt_v2"
    main_input_name = "pixel_values"


class PvtV2ModelStandalone(PvtV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.pvt_v2 = PvtV2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values, **kwargs):
        return self.pvt_v2(params["pvt_v2"], pixel_values, **kwargs)


class PvtV2ForImageClassification(PvtV2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.num_labels = config.num_labels
        self.pvt_v2 = PvtV2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values, labels=None, output_hidden_states=False,
                 **kwargs):
        outputs = self.pvt_v2(params["pvt_v2"], pixel_values,
                              output_hidden_states=output_hidden_states)
        pooled = outputs.last_hidden_state.mean(axis=(2, 3))
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
