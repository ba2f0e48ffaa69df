"""RT-DETRv2 (reference src/transformers/models/rt_detr_v2/modular_rt_detr_v2.py).

RT-DETR with the v2 deformable attention: flat (levels*points) sampling axis,
per-point 1/n scaling with a configurable offset_scale, and an optional
'discrete' nearest-texel sampling mode (reference :290)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module
from ...ops.deformable import multi_scale_deformable_attention_v2
from ..rt_detr.modeling_rt_detr import (
    RTDetrDecoder,
    RTDetrDecoderLayer,
    RTDetrForObjectDetection,
    RTDetrModel,
    RTDetrPreTrainedModel,
    _RTDetrCore,
)
from .configuration_rt_detr_v2 import RTDetrV2Config


class RTDetrV2MultiscaleDeformableAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.d_model = d
        self.n_levels = config.decoder_n_levels
        self.n_heads = config.decoder_attention_heads
        self.n_points = config.decoder_n_points
        self.offset_scale = config.decoder_offset_scale
        self.method = config.decoder_method
        self.n_points_list = [self.n_points] * self.n_levels
        self.sampling_offsets = Linear(d, self.n_heads * self.n_levels * self.n_points * 2, **kw)
        self.attention_weights = Linear(d, self.n_heads * self.n_levels * self.n_points, **kw)
        self.value_proj = Linear(d, d, **kw)
        self.output_proj = Linear(d, d, **kw)

    def __call__(self, params, hidden, encoder_hidden, reference_points,
                 spatial_shapes, position_embeddings=None):
        if position_embeddings is not None:
            hidden = hidden + position_embeddings
        b, q, _ = hidden.shape
        s = encoder_hidden.shape[1]
        value = self.value_proj(params["value_proj"], encoder_hidden)
        value = value.reshape(b, s, self.n_heads, self.d_model // self.n_heads)
        offsets = self.sampling_offsets(params["sampling_offsets"], hidden).reshape(
            b, q, self.n_heads, self.n_levels * self.n_points, 2)
        weights = self.attention_weights(params["attention_weights"], hidden).reshape(
            b, q, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1)
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes], jnp.float32)
            # equal points per level: broadcast level-wise normalizer
            offs = offsets.reshape(b, q, self.n_heads, self.n_levels, self.n_points, 2)
            locations = (reference_points[:, :, None, :, None, :]
                         + offs / normalizer[None, None, None, :, None, :])
            locations = locations.reshape(b, q, self.n_heads, -1, 2)
        else:
            n_points_scale = jnp.asarray(
                [1.0 / n for n in self.n_points_list for _ in range(n)],
                hidden.dtype)[:, None]
            offset = (offsets * n_points_scale
                      * reference_points[:, :, None, :, 2:] * self.offset_scale)
            locations = reference_points[:, :, None, :, :2] + offset
        out = multi_scale_deformable_attention_v2(
            value, spatial_shapes, locations, weights, self.n_points_list, self.method)
        return self.output_proj(params["output_proj"], out)


class RTDetrV2DecoderLayer(RTDetrDecoderLayer):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.encoder_attn = RTDetrV2MultiscaleDeformableAttention(
            config, dtype=dtype, param_dtype=param_dtype)


class RTDetrV2Decoder(RTDetrDecoder):
    def __init__(self, config, with_heads=False, *, dtype, param_dtype):
        super().__init__(config, with_heads=with_heads, dtype=dtype,
                         param_dtype=param_dtype)
        self.layers = [RTDetrV2DecoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.decoder_layers)]


class _RTDetrV2Core(_RTDetrCore):
    def __init__(self, config, with_heads=False, *, dtype, param_dtype):
        super().__init__(config, with_heads=with_heads, dtype=dtype,
                         param_dtype=param_dtype)
        self.decoder = RTDetrV2Decoder(config, with_heads=with_heads,
                                       dtype=dtype, param_dtype=param_dtype)


class RTDetrV2PreTrainedModel(RTDetrPreTrainedModel):
    config_class = RTDetrV2Config
    _keys_to_ignore_on_load_unexpected = (
        r"num_batches_tracked$", r"n_points_scale$")


class RTDetrV2Model(RTDetrModel, RTDetrV2PreTrainedModel):
    config_class = RTDetrV2Config

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        RTDetrV2PreTrainedModel.__init__(self, config, dtype=dtype,
                                         param_dtype=param_dtype)
        core = _RTDetrV2Core(config, with_heads=False, dtype=self.dtype,
                             param_dtype=self.param_dtype)
        for name, child in core.children.items():
            setattr(self, name, child)
        object.__setattr__(self, "_core", core)


class RTDetrV2ForObjectDetection(RTDetrForObjectDetection):
    config_class = RTDetrV2Config
    _keys_to_ignore_on_load_unexpected = (
        r"num_batches_tracked$", r"n_points_scale$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        RTDetrV2PreTrainedModel.__init__(self, config, dtype=dtype,
                                         param_dtype=param_dtype)
        self.model = _RTDetrV2Core(config, with_heads=True, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
