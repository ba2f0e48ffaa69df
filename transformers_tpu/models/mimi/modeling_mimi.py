"""Mimi neural audio codec, TPU-native (reference
src/transformers/models/mimi/modeling_mimi.py).

Moshi's streaming codec: SEANet causal-conv encoder → 8-layer causal
transformer (rope + sliding window + LayerScale) → stride-2 downsample to
12.5 Hz → split residual VQ (1 semantic + N acoustic codebooks) → mirrored
decode path.  Non-streaming inference (the reference's
use_streaming=False): causal left-padding on every conv; codebooks are
derived as embed_sum / cluster_usage (EMA k-means state in the checkpoint).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import causal_mask_bool, to_additive
from ...ops.rope import compute_cos_sin
from ...utils.generic import ModelOutput
from ..llama.modeling_llama import LlamaAttention
from .configuration_mimi import MimiConfig


@dataclass
class MimiEncoderOutput(ModelOutput):
    audio_codes: Any = None


@dataclass
class MimiDecoderOutput(ModelOutput):
    audio_values: Any = None


@dataclass
class MimiOutput(ModelOutput):
    audio_codes: Any = None
    audio_values: Any = None


class MimiConv1d(Module):
    """Causal conv with EnCodec-style ideal-length extra padding
    (reference MimiConv1d, non-streaming path)."""

    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, dilation=1,
                 groups=1, bias=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.causal = config.use_causal_conv
        self.pad_mode = config.pad_mode
        self.conv = Conv(in_ch, out_ch, kernel_size, stride=stride, padding=0,
                         use_bias=bias, groups=groups, dilation=dilation, ndim=1,
                         dtype=dtype, param_dtype=param_dtype)
        self.kernel_eff = (kernel_size - 1) * dilation + 1
        self.stride_v = stride
        self.padding_total = self.kernel_eff - stride
        self.padding_right = self.padding_total // 2
        self.padding_left = self.padding_total - self.padding_right

    def _extra_padding(self, length):
        n_frames = (length - self.kernel_eff + self.padding_total) / self.stride_v + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride_v \
            + self.kernel_eff - self.padding_total
        return ideal - length

    def __call__(self, params, x):  # [b, c, t]
        extra = self._extra_padding(x.shape[-1])
        mode = {"reflect": "reflect", "replicate": "edge",
                "edge": "edge"}.get(self.pad_mode, "constant")
        if self.causal:
            pads = (self.padding_total, extra)
        else:
            pads = (self.padding_left, self.padding_right + extra)
        x = jnp.pad(x, ((0, 0), (0, 0), pads), mode=mode)
        return self.conv(params["conv"], x)


class MimiConvTranspose1d(Module):
    """(reference MimiConvTranspose1d) — causal trim-right."""

    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, groups=1,
                 bias=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k, self.stride_v, self.groups = kernel_size, stride, groups
        self.use_bias = bias
        padding_total = kernel_size - stride
        if config.use_causal_conv:
            self.padding_right = math.ceil(padding_total * config.trim_right_ratio)
        else:
            self.padding_right = padding_total // 2
        self.padding_left = padding_total - self.padding_right

    def init(self, rng):
        kw, kb = jax.random.split(rng)
        fan_in = (self.in_ch // self.groups) * self.k
        bound = 1.0 / math.sqrt(fan_in)
        p = {"weight": jax.random.uniform(
            kw, (self.in_ch, self.out_ch // self.groups, self.k),
            self.param_dtype, -bound, bound)}
        if self.use_bias:
            p["bias"] = jax.random.uniform(kb, (self.out_ch,), self.param_dtype,
                                           -bound, bound)
        return {"conv": p}

    def __call__(self, params, x):  # [b, c, t]
        w = params["conv"]["weight"].astype(self.dtype)
        if self.groups > 1:
            # grouped transpose conv: block-diagonal over channel groups
            outs = []
            gi, go = self.in_ch // self.groups, self.out_ch // self.groups
            for g in range(self.groups):
                outs.append(jax.lax.conv_transpose(
                    x[:, g * gi:(g + 1) * gi].astype(self.dtype),
                    w[g * gi:(g + 1) * gi], strides=(self.stride_v,),
                    padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"),
                    transpose_kernel=True))
            y = jnp.concatenate(outs, axis=1)
        else:
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), w, strides=(self.stride_v,), padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"), transpose_kernel=True)
        if self.use_bias:
            y = y + params["conv"]["bias"].astype(self.dtype)[None, :, None]
        end = y.shape[-1] - self.padding_right
        return y[..., self.padding_left:end]


class MimiResnetBlock(Module):
    def __init__(self, config, dim, dilations, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = dim // config.compress
        kernel_sizes = (config.residual_kernel_size, 1)
        convs = {}
        for i, (k, d) in enumerate(zip(kernel_sizes, dilations)):
            in_chs = dim if i == 0 else hidden
            out_chs = dim if i == len(kernel_sizes) - 1 else hidden
            convs[str(2 * i + 1)] = MimiConv1d(config, in_chs, out_chs, k,
                                               dilation=d, **kw)
        self._conv_idx = sorted(convs)
        for name, mod in convs.items():
            setattr(self, "block_" + name, mod)
        self.use_shortcut = config.use_conv_shortcut
        if self.use_shortcut:
            self.shortcut = MimiConv1d(config, dim, dim, 1, **kw)

    def init(self, rng):
        keys = jax.random.split(rng, len(self._conv_idx) + 1)
        block = {idx: getattr(self, "block_" + idx).init(keys[i])
                 for i, idx in enumerate(self._conv_idx)}
        p = {"block": block}
        if self.use_shortcut:
            p["shortcut"] = self.shortcut.init(keys[-1])
        return p

    def param_load_transform(self, name, arr):
        return arr

    def __call__(self, params, x):
        residual = x
        h = x
        for idx in self._conv_idx:
            h = jax.nn.elu(h)
            h = getattr(self, "block_" + idx)(params["block"][idx], h)
        if self.use_shortcut:
            residual = self.shortcut(params["shortcut"], residual)
        return residual + h


class MimiEncoder(Module):
    def __init__(self, config: MimiConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        layers = [MimiConv1d(config, config.audio_channels, config.num_filters,
                             config.kernel_size, **kw)]
        elu = [False]
        scaling = 1
        for ratio in reversed(config.upsampling_ratios):
            current = scaling * config.num_filters
            for j in range(config.num_residual_layers):
                layers.append(MimiResnetBlock(config, current,
                                              [config.dilation_growth_rate**j, 1], **kw))
                elu.append(False)
            layers.append(None)  # ELU slot
            elu.append(True)
            layers.append(MimiConv1d(config, current, current * 2, ratio * 2,
                                     stride=ratio, **kw))
            elu.append(False)
            scaling *= 2
        layers.append(None)
        elu.append(True)
        layers.append(MimiConv1d(config, scaling * config.num_filters,
                                 config.hidden_size, config.last_kernel_size, **kw))
        elu.append(False)
        self.layers = [m for m in layers if m is not None]
        # real module indices in the torch ModuleList (ELUs occupy slots)
        self._torch_idx = [i for i, m in enumerate(layers) if m is not None]
        self._elu_before = []
        prev_elu = False
        for i, m in enumerate(layers):
            if m is None:
                prev_elu = True
            else:
                self._elu_before.append(prev_elu)
                prev_elu = False

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers))
        return {"layers": {str(ti): m.init(k) for ti, m, k in
                           zip(self._torch_idx, self.layers, keys)}}

    def __call__(self, params, x):
        for ti, m, elu in zip(self._torch_idx, self.layers, self._elu_before):
            if elu:
                x = jax.nn.elu(x)
            x = m(params["layers"][str(ti)], x)
        return x


class MimiDecoder(Module):
    def __init__(self, config: MimiConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        scaling = int(2 ** len(config.upsampling_ratios))
        layers = [MimiConv1d(config, config.hidden_size,
                             scaling * config.num_filters, config.kernel_size, **kw)]
        for ratio in config.upsampling_ratios:
            current = scaling * config.num_filters
            layers.append(None)
            layers.append(MimiConvTranspose1d(config, current, current // 2,
                                              ratio * 2, stride=ratio, **kw))
            for j in range(config.num_residual_layers):
                layers.append(MimiResnetBlock(config, current // 2,
                                              (config.dilation_growth_rate**j, 1), **kw))
            scaling //= 2
        layers.append(None)
        layers.append(MimiConv1d(config, config.num_filters,
                                 config.audio_channels, config.last_kernel_size, **kw))
        self.layers = [m for m in layers if m is not None]
        self._torch_idx = [i for i, m in enumerate(layers) if m is not None]
        self._elu_before = []
        prev = False
        for m in layers:
            if m is None:
                prev = True
            else:
                self._elu_before.append(prev)
                prev = False

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers))
        return {"layers": {str(ti): m.init(k) for ti, m, k in
                           zip(self._torch_idx, self.layers, keys)}}

    def __call__(self, params, x):
        for ti, m, elu in zip(self._torch_idx, self.layers, self._elu_before):
            if elu:
                x = jax.nn.elu(x)
            x = m(params["layers"][str(ti)], x)
        return x


class MimiTransformerLayer(Module):
    def __init__(self, config: MimiConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = LlamaAttention(config, layer_idx, **kw)
        self.input_layernorm = LayerNorm(config.hidden_size, config.norm_eps, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size,
                                                  config.norm_eps, **kw)
        self.mlp = _MimiMLP(config, **kw)
        self.scale_init = config.layer_scale_initial_scale
        self.hidden = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        params["self_attn_layer_scale"] = {
            "scale": jnp.full((self.hidden,), self.scale_init, self.param_dtype)}
        params["mlp_layer_scale"] = {
            "scale": jnp.full((self.hidden,), self.scale_init, self.param_dtype)}
        return params

    def __call__(self, params, hidden, cos, sin, attn_args):
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                              None, 0)
        hidden = hidden + h * params["self_attn_layer_scale"]["scale"].astype(h.dtype)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return hidden + h * params["mlp_layer_scale"]["scale"].astype(h.dtype)


class _MimiMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        lk = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, False, **lk)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, False, **lk)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class MimiTransformerModel(Module):
    def __init__(self, config: MimiConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [MimiTransformerLayer(config, i, dtype=dtype,
                                            param_dtype=param_dtype)
                       for i in range(config.num_hidden_layers)]
        import numpy as np

        dim = config.head_dim
        self.inv_freq = 1.0 / (config.rope_theta
                               ** (np.arange(0, dim, 2, dtype=np.float64) / dim))

    def __call__(self, params, hidden):  # [b, t, d]
        b, s, _ = hidden.shape
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        cos, sin = compute_cos_sin(positions, self.inv_freq, 1.0, dtype=self.dtype)
        attn_args = {"q_positions": positions,
                     "kv_valid": jnp.ones((b, s), jnp.int32), "is_causal": True}
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, cos, sin, attn_args)
        return hidden


class MimiVectorQuantization(Module):
    """One euclidean codebook (reference MimiEuclideanCodebook): the
    effective codebook is embed_sum / clamp(cluster_usage, eps)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.codebook_size = config.codebook_size
        self.dim = config.codebook_dim

    def init(self, rng):
        return {"codebook": {
            "initialized": jnp.ones((1,), jnp.float32),
            "cluster_usage": jnp.ones((self.codebook_size,), self.param_dtype),
            "embed_sum": jnp.zeros((self.codebook_size, self.dim), self.param_dtype),
        }}

    def embed(self, params):
        cb = params["codebook"]
        usage = jnp.clip(cb["cluster_usage"].astype(jnp.float32), 1e-5, None)
        return cb["embed_sum"].astype(jnp.float32) / usage[:, None]

    def encode(self, params, x):  # x [b, d, t] -> [b, t]
        e = self.embed(params)
        xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
        d2 = (jnp.sum(xt**2, -1, keepdims=True)
              - 2 * xt @ e.T + jnp.sum(e**2, -1)[None, None])
        return jnp.argmin(d2, axis=-1)

    def decode(self, params, ind):  # [b, t] -> [b, d, t]
        e = self.embed(params).astype(self.dtype)
        return jnp.swapaxes(jnp.take(e, ind, axis=0), 1, 2)


class MimiResidualVectorQuantizer(Module):
    def __init__(self, config, num_quantizers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [MimiVectorQuantization(config, **kw)
                       for _ in range(num_quantizers)]
        self.has_proj = (config.vector_quantization_hidden_dimension
                         != config.hidden_size)
        if self.has_proj:
            self.input_proj = Conv(config.hidden_size,
                                   config.vector_quantization_hidden_dimension,
                                   1, use_bias=False, ndim=1, **kw)
            self.output_proj = Conv(config.vector_quantization_hidden_dimension,
                                    config.hidden_size, 1, use_bias=False,
                                    ndim=1, **kw)

    def encode(self, params, emb, num_quantizers=None):
        if self.has_proj:
            emb = self.input_proj(params["input_proj"], emb)
        n = num_quantizers if num_quantizers is not None else len(self.layers)
        residual = emb
        indices = []
        for i in range(n):
            layer = self.layers[i]
            ind = layer.encode(params["layers"][str(i)], residual)
            residual = residual - layer.decode(params["layers"][str(i)], ind)
            indices.append(ind)
        return jnp.stack(indices)  # [K, b, t]

    def decode(self, params, codes):  # codes [b, K, t]
        out = 0.0
        for i in range(codes.shape[1]):
            out = out + self.layers[i].decode(params["layers"][str(i)], codes[:, i])
        if self.has_proj:
            out = self.output_proj(params["output_proj"], out)
        return out


class MimiSplitResidualVectorQuantizer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_semantic = config.num_semantic_quantizers
        self.max_num = config.num_quantizers
        self.semantic_residual_vector_quantizer = MimiResidualVectorQuantizer(
            config, self.num_semantic, **kw)
        self.acoustic_residual_vector_quantizer = MimiResidualVectorQuantizer(
            config, config.num_quantizers - self.num_semantic, **kw)

    def encode(self, params, emb, num_quantizers=None):
        n = self.max_num if num_quantizers is None else num_quantizers
        codes = self.semantic_residual_vector_quantizer.encode(
            params["semantic_residual_vector_quantizer"], emb)
        if n > self.num_semantic:
            acoustic = self.acoustic_residual_vector_quantizer.encode(
                params["acoustic_residual_vector_quantizer"], emb,
                num_quantizers=n - self.num_semantic)
            codes = jnp.concatenate([codes, acoustic], axis=0)
        return codes

    def decode(self, params, codes):  # [b, K, t]
        out = self.semantic_residual_vector_quantizer.decode(
            params["semantic_residual_vector_quantizer"],
            codes[:, :self.num_semantic])
        if codes.shape[1] > self.num_semantic:
            out = out + self.acoustic_residual_vector_quantizer.decode(
                params["acoustic_residual_vector_quantizer"],
                codes[:, self.num_semantic:])
        return out


class MimiModel(PreTrainedModel):
    """reference MimiModel — encode/decode/forward (non-streaming)."""

    config_class = MimiConfig
    base_model_prefix = ""
    main_input_name = "input_values"
    _keys_to_ignore_on_load_unexpected = (r"\.initialized$",)

    def __init__(self, config: MimiConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = MimiEncoder(config, **kw)
        self.encoder_transformer = MimiTransformerModel(config, **kw)
        self.has_resample = config.frame_rate != config.encodec_frame_rate
        if self.has_resample:
            k = 2 * int(config.encodec_frame_rate / config.frame_rate)
            stride = int(config.encodec_frame_rate / config.frame_rate)
            self.downsample = MimiConv1d(config, config.hidden_size,
                                         config.hidden_size, k, stride=stride,
                                         bias=False, **kw)
            # reference forces pad_mode="replicate" on the downsample conv —
            # jnp "edge" is the same scheme
            self.downsample.pad_mode = "replicate"
            self.upsample = MimiConvTranspose1d(config, config.hidden_size,
                                                config.hidden_size, k,
                                                stride=stride, bias=False,
                                                groups=config.upsample_groups, **kw)
        self.decoder_transformer = MimiTransformerModel(config, **kw)
        self.decoder = MimiDecoder(config, **kw)
        self.quantizer = MimiSplitResidualVectorQuantizer(config, **kw)

    def encode(self, params=None, input_values=None, num_quantizers=None,
               **kwargs) -> MimiEncoderOutput:
        params = params if params is not None else self.params
        emb = self.encoder(params["encoder"], jnp.asarray(input_values, self.dtype))
        emb = self.encoder_transformer(params["encoder_transformer"],
                                       jnp.swapaxes(emb, 1, 2))
        emb = jnp.swapaxes(emb, 1, 2)
        if self.has_resample:
            emb = self.downsample(params["downsample"], emb)
        codes = self.quantizer.encode(params["quantizer"], emb, num_quantizers)
        return MimiEncoderOutput(audio_codes=jnp.swapaxes(codes, 0, 1))

    def decode(self, params=None, audio_codes=None, **kwargs) -> MimiDecoderOutput:
        params = params if params is not None else self.params
        emb = self.quantizer.decode(params["quantizer"], audio_codes)
        if self.has_resample:
            emb = self.upsample(params["upsample"], emb)
        emb = self.decoder_transformer(params["decoder_transformer"],
                                       jnp.swapaxes(emb, 1, 2))
        emb = jnp.swapaxes(emb, 1, 2)
        return MimiDecoderOutput(audio_values=self.decoder(params["decoder"], emb))

    def __call__(self, params=None, input_values=None, num_quantizers=None,
                 **kwargs) -> MimiOutput:
        params = params if params is not None else self.params
        codes = self.encode(params, input_values, num_quantizers).audio_codes
        values = self.decode(params, codes).audio_values
        return MimiOutput(audio_codes=codes, audio_values=values)

