"""DAC — Descript Audio Codec, TPU-native (reference
src/transformers/models/dac/modeling_dac.py).

Snake-activated dilated-conv encoder/decoder around a residual vector
quantizer with factorized, L2-normalized codebook lookups (ViT-VQGAN
tricks, reference DacVectorQuantize :103). Hub checkpoints store PLAIN conv
weights (weight_norm exists only in the conversion script), so the stack is
ordinary Conv/ConvTranspose modules."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ...core.module import Conv, ConvTranspose, Embedding, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from .configuration_dac import DacConfig


@dataclass
class DacEncoderOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    quantized_representation: Optional[jnp.ndarray] = None
    audio_codes: Optional[jnp.ndarray] = None
    projected_latents: Optional[jnp.ndarray] = None


@dataclass
class DacDecoderOutput(ModelOutput):
    audio_values: Optional[jnp.ndarray] = None


@dataclass
class DacOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    audio_values: Optional[jnp.ndarray] = None
    quantized_representation: Optional[jnp.ndarray] = None
    audio_codes: Optional[jnp.ndarray] = None
    projected_latents: Optional[jnp.ndarray] = None


class Snake1d(Module):
    """x + (1/alpha) sin^2(alpha x), per-channel alpha (reference :86)."""

    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim

    def init(self, rng):
        return {"alpha": jnp.ones((1, self.dim, 1), self.param_dtype)}

    def __call__(self, params, x):
        a = params["alpha"].astype(jnp.float32)
        h = x.astype(jnp.float32)
        h = h + jnp.reciprocal(a + 1e-9) * jnp.square(jnp.sin(a * h))
        return h.astype(x.dtype)


class DacVectorQuantize(Module):
    """Factorized, L2-normalized VQ (reference :103)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(ndim=1, dtype=dtype, param_dtype=param_dtype)
        self.in_proj = Conv(config.hidden_size, config.codebook_dim, 1, **kw)
        self.out_proj = Conv(config.codebook_dim, config.hidden_size, 1, **kw)
        self.codebook = Embedding(config.codebook_size, config.codebook_dim,
                                  dtype=dtype, param_dtype=param_dtype,
                                  embedding_init=normal_init(0.02))

    def decode_latents(self, params, latents):
        # latents [B, D, T] -> nearest L2-normalized codebook entry
        b, d, t = latents.shape
        enc = jnp.swapaxes(latents, 1, 2).reshape(b * t, d).astype(jnp.float32)
        cb = params["codebook"]["weight"].astype(jnp.float32)
        enc_n = enc / jnp.maximum(jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12)
        cb_n = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12)
        # dist = -(||e||^2 - 2 e·c) + ||c||^2 (reference :170); argmax picks
        # the nearest code since all normalized codes have ||c|| = 1
        dist = (-(jnp.sum(enc_n**2, -1, keepdims=True) - 2 * enc_n @ cb_n.T)
                + jnp.sum(cb_n**2, -1)[None, :])
        idx = jnp.argmax(dist, axis=-1).reshape(b, t)
        q = jnp.swapaxes(self.codebook(params["codebook"], idx), 1, 2)
        return q.astype(latents.dtype), idx

    def __call__(self, params, hidden):
        z = self.in_proj(params["in_proj"], hidden)
        q, codes = self.decode_latents(params, z)
        commitment = jnp.mean(jnp.square(z - q))
        codebook_loss = commitment  # identical value at inference (no grads)
        out = self.out_proj(params["out_proj"], q)
        return out, commitment, codebook_loss, codes, z


class DacResidualUnit(Module):
    def __init__(self, dim, dilation, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        pad = ((7 - 1) * dilation) // 2
        kw = dict(ndim=1, dtype=dtype, param_dtype=param_dtype)
        self.snake1 = Snake1d(dim, dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(dim, dim, 7, dilation=dilation, padding=pad, **kw)
        self.snake2 = Snake1d(dim, dtype=dtype, param_dtype=param_dtype)
        self.conv2 = Conv(dim, dim, 1, **kw)

    def __call__(self, params, x):
        y = self.conv1(params["conv1"], self.snake1(params["snake1"], x))
        y = self.conv2(params["conv2"], self.snake2(params["snake2"], y))
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class DacEncoderBlock(Module):
    def __init__(self, config, stride, stride_index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        dim = config.encoder_hidden_size * 2**stride_index
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.res_unit1 = DacResidualUnit(dim // 2, 1, **kw)
        self.res_unit2 = DacResidualUnit(dim // 2, 3, **kw)
        self.res_unit3 = DacResidualUnit(dim // 2, 9, **kw)
        self.snake1 = Snake1d(dim // 2, **kw)
        self.conv1 = Conv(dim // 2, dim, 2 * stride, stride=stride,
                          padding=math.ceil(stride / 2), ndim=1, **kw)

    def __call__(self, params, x):
        x = self.res_unit1(params["res_unit1"], x)
        x = self.res_unit2(params["res_unit2"], x)
        x = self.snake1(params["snake1"], self.res_unit3(params["res_unit3"], x))
        return self.conv1(params["conv1"], x)


class DacDecoderBlock(Module):
    def __init__(self, config, stride, stride_index, *, odd_stride_output_padding=False,
                 dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_dim = config.decoder_hidden_size // 2**stride_index
        out_dim = config.decoder_hidden_size // 2 ** (stride_index + 1)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.snake1 = Snake1d(in_dim, **kw)
        # Xcodec's DAC variant sets output_padding = stride % 2
        op = (stride % 2) if odd_stride_output_padding else 0
        self.conv_t1 = ConvTranspose(in_dim, out_dim, 2 * stride, stride=stride,
                                     padding=math.ceil(stride / 2),
                                     output_padding=op, ndim=1, **kw)
        self.res_unit1 = DacResidualUnit(out_dim, 1, **kw)
        self.res_unit2 = DacResidualUnit(out_dim, 3, **kw)
        self.res_unit3 = DacResidualUnit(out_dim, 9, **kw)

    def __call__(self, params, x):
        x = self.conv_t1(params["conv_t1"], self.snake1(params["snake1"], x))
        x = self.res_unit1(params["res_unit1"], x)
        x = self.res_unit2(params["res_unit2"], x)
        return self.res_unit3(params["res_unit3"], x)


class DacResidualVectorQuantizer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.n_codebooks = config.n_codebooks
        self.quantizers = [DacVectorQuantize(config, dtype=dtype, param_dtype=param_dtype)
                           for _ in range(config.n_codebooks)]

    def __call__(self, params, hidden, n_quantizers: Optional[int] = None):
        n_quantizers = n_quantizers or self.n_codebooks
        quantized = 0
        residual = hidden
        commitment = 0.0
        codebook_loss = 0.0
        codes, latents = [], []
        for i in range(n_quantizers):
            q_i, c_i, cb_i, idx_i, z_i = self.quantizers[i](
                params["quantizers"][str(i)], residual)
            quantized = quantized + q_i
            residual = residual - q_i
            commitment = commitment + c_i
            codebook_loss = codebook_loss + cb_i
            codes.append(idx_i)
            latents.append(z_i)
        return (quantized, jnp.stack(codes, 1), jnp.concatenate(latents, 1),
                commitment, codebook_loss)

    def from_codes(self, params, audio_codes):
        quantized = 0.0
        latents = []
        for i in range(audio_codes.shape[1]):
            q = self.quantizers[i]
            z_i = jnp.swapaxes(
                q.codebook(params["quantizers"][str(i)]["codebook"],
                           audio_codes[:, i, :]), 1, 2)
            latents.append(z_i)
            quantized = quantized + q.out_proj(
                params["quantizers"][str(i)]["out_proj"], z_i.astype(self.dtype))
        return quantized, jnp.concatenate(latents, 1), audio_codes


class DacEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(1, config.encoder_hidden_size, 7, padding=3, ndim=1, **kw)
        self.block = [DacEncoderBlock(config, s, i + 1, **kw)
                      for i, s in enumerate(config.downsampling_ratios)]
        d_model = config.encoder_hidden_size * 2 ** len(config.downsampling_ratios)
        self.snake1 = Snake1d(d_model, **kw)
        self.conv2 = Conv(d_model, config.hidden_size, 3, padding=1, ndim=1, **kw)

    def __call__(self, params, x):
        x = self.conv1(params["conv1"], x)
        for i, blk in enumerate(self.block):
            x = blk(params["block"][str(i)], x)
        x = self.snake1(params["snake1"], x)
        return self.conv2(params["conv2"], x)


class DacDecoder(Module):
    def __init__(self, config, *, odd_stride_output_padding=False, final_tanh=True,
                 dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.final_tanh = final_tanh
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv1 = Conv(config.hidden_size, config.decoder_hidden_size, 7,
                          padding=3, ndim=1, **kw)
        self.block = [DacDecoderBlock(
            config, s, i, odd_stride_output_padding=odd_stride_output_padding, **kw)
            for i, s in enumerate(config.upsampling_ratios)]
        out_dim = config.decoder_hidden_size // 2 ** len(config.upsampling_ratios)
        self.snake1 = Snake1d(out_dim, **kw)
        self.conv2 = Conv(out_dim, 1, 7, padding=3, ndim=1, **kw)

    def __call__(self, params, x):
        x = self.conv1(params["conv1"], x)
        for i, blk in enumerate(self.block):
            x = blk(params["block"][str(i)], x)
        x = self.snake1(params["snake1"], x)
        x = self.conv2(params["conv2"], x)
        return jnp.tanh(x) if self.final_tanh else x


class DacPreTrainedModel(PreTrainedModel):
    config_class = DacConfig
    base_model_prefix = "dac"
    main_input_name = "input_values"


class DacModel(DacPreTrainedModel):
    def __init__(self, config: DacConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = DacEncoder(config, **kw)
        self.decoder = DacDecoder(config, **kw)
        self.quantizer = DacResidualVectorQuantizer(config, **kw)

    def encode(self, params, input_values, n_quantizers: Optional[int] = None):
        h = self.encoder(params["encoder"], input_values)
        quantized, codes, latents, commitment, codebook_loss = self.quantizer(
            params["quantizer"], h, n_quantizers)
        loss = (self.config.commitment_loss_weight * commitment
                + self.config.codebook_loss_weight * codebook_loss)
        return DacEncoderOutput(loss=loss, quantized_representation=quantized,
                                audio_codes=codes, projected_latents=latents)

    def decode(self, params, quantized_representation=None, audio_codes=None):
        if quantized_representation is None and audio_codes is None:
            raise ValueError("Either quantized_representation or audio_codes required")
        if audio_codes is not None:
            quantized_representation = self.quantizer.from_codes(
                params["quantizer"], audio_codes)[0]
        audio = self.decoder(params["decoder"], quantized_representation)[:, 0]
        return DacDecoderOutput(audio_values=audio)

    def __call__(self, params, input_values, n_quantizers: Optional[int] = None):
        length = input_values.shape[-1]
        enc = self.encode(params, input_values, n_quantizers)
        audio = self.decode(
            params, quantized_representation=enc.quantized_representation
        ).audio_values[..., :length]
        return DacOutput(loss=enc.loss, audio_values=audio,
                         quantized_representation=enc.quantized_representation,
                         audio_codes=enc.audio_codes,
                         projected_latents=enc.projected_latents)
