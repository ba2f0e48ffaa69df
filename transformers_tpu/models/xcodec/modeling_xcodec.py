"""Xcodec — semantic+acoustic neural audio codec, TPU-native (reference
src/transformers/models/xcodec/modeling_xcodec.py).

A HuBERT semantic tower (mean of all hidden states) and a DAC acoustic tower
encode in parallel; their channel-concat is fused by a linear layer and
quantized by a plain Euclidean RVQ (EnCodec-style codebooks, reference
XcodecEuclideanCodebook :221). Decode projects the quantized embedding back
to the acoustic width and runs the DAC decoder with Xcodec's two tweaks:
ConvTranspose output_padding = stride % 2 and no final tanh (reference
_adjust_dac_decoder :466)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, ConvTranspose, Linear, Module
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..dac.modeling_dac import DacDecoder, DacEncoder
from ..hubert.modeling_hubert import HubertModel
from .configuration_xcodec import XcodecConfig


@dataclass
class XcodecOutput(ModelOutput):
    audio_codes: Optional[jnp.ndarray] = None
    audio_values: Optional[jnp.ndarray] = None


@dataclass
class XcodecEncoderOutput(ModelOutput):
    audio_codes: Optional[jnp.ndarray] = None


@dataclass
class XcodecDecoderOutput(ModelOutput):
    audio_values: Optional[jnp.ndarray] = None


class XcodecResidualUnit(Module):
    """ELU-conv residual block (reference XcodecResidualUnit :74)."""

    def __init__(self, config, in_channels, out_channels, dilation, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(ndim=1, use_bias=False, dtype=dtype, param_dtype=param_dtype)
        pad = ((config.unit_kernel_size - 1) // 2) * dilation
        self.conv1 = Conv(in_channels, out_channels, config.unit_kernel_size,
                          padding=pad, dilation=dilation, **kw)
        self.conv2 = Conv(out_channels, out_channels, 1, **kw)

    def __call__(self, params, x):
        y = self.conv1(params["conv1"], jax.nn.elu(x))
        y = self.conv2(params["conv2"], jax.nn.elu(y))
        return x + y


class XcodecSemanticEncoderBlock(Module):
    def __init__(self, config, in_channels, out_channels, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.res_units = [XcodecResidualUnit(config, in_channels, in_channels, d, **kw)
                          for d in config.block_dilations]
        # stride==1 keeps kernel 3, not 2*stride (reference :109)
        kernel = 3 if stride == 1 else 2 * stride
        self.conv = Conv(in_channels, out_channels, kernel, stride=stride,
                         padding=(kernel - 1) // 2, ndim=1, **kw)

    def __call__(self, params, x):
        for i, unit in enumerate(self.res_units):
            x = unit(params["res_units"][str(i)], x)
        return self.conv(params["conv"], x)


class XcodecSemanticEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.semantic_hidden_size
        self.conv = Conv(h, h, config.kernel_size, padding=config.kernel_size // 2,
                         use_bias=False, ndim=1, **kw)
        blocks, in_channels = [], h
        for ratio, stride in zip(config.channel_ratios, config.strides):
            out_channels = int(h * ratio)
            blocks.append(XcodecSemanticEncoderBlock(config, in_channels, out_channels,
                                                     stride, **kw))
            in_channels = out_channels
        self.conv_blocks = blocks

    def __call__(self, params, x):
        x = self.conv(params["conv"], x)
        for i, blk in enumerate(self.conv_blocks):
            x = blk(params["conv_blocks"][str(i)], x)
        return x


class XcodecSemanticDecoderBlock(Module):
    def __init__(self, config, in_channels, out_channels, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if stride == 1:
            self.conv = Conv(in_channels, out_channels, 3, padding=1, ndim=1, **kw)
        else:
            self.conv = ConvTranspose(in_channels, out_channels, 2 * stride,
                                      stride=stride, padding=(stride + 1) // 2,
                                      output_padding=stride % 2, use_bias=False,
                                      ndim=1, **kw)
        self.res_units = [XcodecResidualUnit(config, out_channels, out_channels, d, **kw)
                          for d in config.block_dilations]

    def __call__(self, params, x):
        x = self.conv(params["conv"], x)
        for i, unit in enumerate(self.res_units):
            x = unit(params["res_units"][str(i)], x)
        return x


class XcodecSemanticDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.semantic_hidden_size
        self.conv1 = Conv(h, int(h * config.channel_ratios[0]), config.kernel_size,
                          padding=config.kernel_size // 2, use_bias=False, ndim=1, **kw)
        blocks = []
        n = len(config.channel_ratios)
        for i, stride in enumerate(config.strides):
            in_channels = int(h * config.channel_ratios[i])
            out_channels = int(h * config.channel_ratios[i + 1]) if i < n - 1 else h
            blocks.append(XcodecSemanticDecoderBlock(config, in_channels, out_channels,
                                                     stride, **kw))
        self.conv_blocks = blocks
        self.conv2 = Conv(h, h, config.kernel_size, padding=config.kernel_size // 2,
                          use_bias=False, ndim=1, **kw)

    def __call__(self, params, x):
        x = self.conv1(params["conv1"], x)
        for i, blk in enumerate(self.conv_blocks):
            x = blk(params["conv_blocks"][str(i)], x)
        return self.conv2(params["conv2"], x)


class XcodecResidualVectorQuantizer(Module):
    """Plain Euclidean RVQ over EnCodec-style EMA codebooks (reference
    XcodecResidualVectorQuantization :275; codebook buffers inited /
    cluster_size / embed / embed_avg are hub-checkpoint state)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_quantizers = config.num_quantizers

    def init(self, rng):
        cfg = self.config
        quantizers = {}
        for i in range(self.num_quantizers):
            quantizers[str(i)] = {"codebook": {
                "inited": jnp.ones((1,), self.param_dtype),
                "cluster_size": jnp.zeros((cfg.codebook_size,), self.param_dtype),
                "embed": jnp.zeros((cfg.codebook_size, cfg.codebook_dim), self.param_dtype),
                "embed_avg": jnp.zeros((cfg.codebook_size, cfg.codebook_dim),
                                       self.param_dtype)}}
        return {"quantizers": quantizers}

    def num_for_bandwidth(self, bandwidth=None):
        bw_per_q = math.log2(self.config.codebook_size) * self.config.frame_rate / 1000
        if bandwidth is not None and bandwidth > 0.0:
            return int(max(1, math.floor(bandwidth / bw_per_q)))
        return self.num_quantizers

    def encode(self, params, embeddings, bandwidth=None):
        """[B, D, T] -> codes [B, nq, T]."""
        nq = self.num_for_bandwidth(bandwidth)
        residual = jnp.swapaxes(embeddings, 1, 2).astype(jnp.float32)  # [B, T, D]
        codes = []
        for i in range(nq):
            embed = params["quantizers"][str(i)]["codebook"]["embed"].astype(jnp.float32)
            dist = (jnp.sum(residual**2, -1, keepdims=True)
                    - 2 * residual @ embed.T
                    + jnp.sum(embed**2, -1)[None, None, :])
            idx = jnp.argmin(dist, axis=-1)
            codes.append(idx)
            residual = residual - jnp.take(embed, idx, axis=0)
        return jnp.stack(codes, axis=1)

    def decode(self, params, codes):
        """[B, nq, T] -> [B, D, T]."""
        out = 0.0
        for i in range(codes.shape[1]):
            embed = params["quantizers"][str(i)]["codebook"]["embed"].astype(jnp.float32)
            out = out + jnp.take(embed, codes[:, i], axis=0)
        return jnp.swapaxes(out, 1, 2).astype(self.dtype)


def _conv1d_length(length, kernel, stride, padding, dilation=1):
    return (length + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def _dac_encoder_output_length(cfg, length):
    """Walk every Conv1d of the DAC encoder in module order (reference
    _get_conv1d_output_lengths :429)."""
    specs = [(7, 1, 3, 1)]
    for s in cfg.downsampling_ratios:
        for d in (1, 3, 9):
            specs += [(7, 1, ((7 - 1) * d) // 2, d), (1, 1, 0, 1)]
        specs.append((2 * s, s, math.ceil(s / 2), 1))
    specs.append((3, 1, 1, 1))
    for k, s, p, d in specs:
        length = _conv1d_length(length, k, s, p, d)
    return length


class XcodecPreTrainedModel(PreTrainedModel):
    config_class = XcodecConfig
    base_model_prefix = "xcodec"
    main_input_name = "input_values"


class XcodecModel(XcodecPreTrainedModel):
    def __init__(self, config: XcodecConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.pad = config.hop_length // 2
        acoustic = config.acoustic_model_config
        self.acoustic_encoder = DacEncoder(acoustic, **kw)
        # Xcodec's DAC decoder variant: output_padding=stride%2, no tanh
        self.acoustic_decoder = DacDecoder(acoustic, odd_stride_output_padding=True,
                                           final_tanh=False, **kw)
        self.encoder_semantic = XcodecSemanticEncoder(config, **kw)
        self.decoder_semantic = XcodecSemanticDecoder(config, **kw)
        self.semantic_model = HubertModel(config.semantic_model_config, **kw)
        self.fc = Linear(config.hidden_size, config.hidden_size, **kw)
        self.fc1 = Linear(config.hidden_size, config.semantic_model_config.hidden_size, **kw)
        self.fc2 = Linear(config.hidden_size, config.acoustic_model_config.hidden_size, **kw)
        self.quantizer = XcodecResidualVectorQuantizer(config, **kw)

    def _extract_semantic_features(self, params, input_values):
        x = input_values[:, 0, :]
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad)))
        out = self.semantic_model(params["semantic_model"], x, output_hidden_states=True)
        stacked = jnp.stack(out.hidden_states, axis=1)  # [B, L+1, T, H]
        return jnp.mean(stacked, axis=1)

    def encode(self, params, input_values, bandwidth=None):
        if input_values.shape[1] != 1:
            raise ValueError(f"Audio must be mono, but got {input_values.shape[1]}")
        if bandwidth is None:
            bandwidth = self.config.target_bandwidths[-1]
        elif bandwidth not in self.config.target_bandwidths:
            raise ValueError(
                f"This model doesn't support the bandwidth {bandwidth}. "
                f"Select one of {self.config.target_bandwidths}.")

        e_semantic_input = self._extract_semantic_features(params, input_values)
        e_semantic = self.encoder_semantic(params["encoder_semantic"],
                                           jnp.swapaxes(e_semantic_input, 1, 2))
        # pad the acoustic input when its conv stack would land on a shorter
        # frame count than the (hop//2-padded) semantic tower (reference :526)
        acoustic_len = _dac_encoder_output_length(self.config.acoustic_model_config,
                                                  input_values.shape[2])
        if acoustic_len != e_semantic.shape[2]:
            acoustic_in = jnp.pad(input_values, ((0, 0), (0, 0), (self.pad, self.pad)))
        else:
            acoustic_in = input_values
        e_acoustic = self.acoustic_encoder(params["acoustic_encoder"], acoustic_in)

        embeddings = jnp.concatenate([e_acoustic, e_semantic], axis=1)
        embeddings = jnp.swapaxes(
            self.fc(params["fc"], jnp.swapaxes(embeddings, 1, 2)), 1, 2)
        return XcodecEncoderOutput(
            audio_codes=self.quantizer.encode(params["quantizer"], embeddings, bandwidth))

    def decode(self, params, audio_codes):
        quantized = self.quantizer.decode(params["quantizer"], audio_codes)
        quantized_acoustic = jnp.swapaxes(
            self.fc2(params["fc2"], jnp.swapaxes(quantized.astype(self.dtype), 1, 2)), 1, 2)
        audio = self.acoustic_decoder(params["acoustic_decoder"], quantized_acoustic)
        return XcodecDecoderOutput(audio_values=audio)

    def __call__(self, params, input_values, audio_codes=None, bandwidth=None):
        length = input_values.shape[-1]
        if audio_codes is None:
            audio_codes = self.encode(params, input_values, bandwidth).audio_codes
        audio_values = self.decode(params, audio_codes).audio_values[..., :length]
        return XcodecOutput(audio_codes=audio_codes, audio_values=audio_values)
