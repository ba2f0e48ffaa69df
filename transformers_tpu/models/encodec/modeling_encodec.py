"""EnCodec neural audio codec (reference
src/transformers/models/encodec/modeling_encodec.py).

SEANet encoder (weight-normed causal convs + dilated residual blocks + LSTM)
→ residual vector quantizer (nearest-neighbour per codebook, residual
subtracted per stage) → mirrored transposed-conv decoder. All convs keep the
torch weight-norm (g, v) parametrization; the LSTM is a `lax.scan` (gate
order i,f,g,o). Non-chunked path (24 kHz checkpoints); chunked 48 kHz
streaming is a follow-up."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Module
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from .configuration_encodec import EncodecConfig


@dataclass
class EncodecOutput(ModelOutput):
    audio_codes: Any = None
    audio_values: Any = None


class EncodecConv1d(Module):
    """Weight-normed conv with EnCodec's asymmetric/causal auto-padding."""

    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, dilation=1,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.causal = config.use_causal_conv
        self.pad_mode = config.pad_mode
        self.in_ch, self.out_ch = in_ch, out_ch
        self.k, self.stride, self.dilation = kernel_size, stride, dilation
        self.eff_k = (kernel_size - 1) * dilation + 1
        self.padding_total = self.eff_k - stride

    def init(self, rng):
        fan_in = self.in_ch * self.k
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(rng)
        v = jax.random.uniform(kw, (self.out_ch, self.in_ch, self.k),
                               self.param_dtype, -bound, bound)
        g = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True))
        return {"conv": {
            "bias": jax.random.uniform(kb, (self.out_ch,), self.param_dtype, -bound, bound),
            "parametrizations": {"weight": {"original0": g.astype(self.param_dtype),
                                            "original1": v}}}}

    def _weight(self, params):
        p = params["conv"]["parametrizations"]["weight"]
        g = p["original0"].astype(jnp.float32)
        v = p["original1"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
        return (g * v / norm).astype(self.dtype)

    def _pad(self, x, left, right):
        if self.pad_mode == "reflect":
            max_pad = max(left, right)
            if x.shape[-1] <= max_pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, max_pad - x.shape[-1] + 1)))
            return jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="reflect")
        return jnp.pad(x, ((0, 0), (0, 0), (left, right)))

    def __call__(self, params, x):  # [B, C, T]
        length = x.shape[-1]
        n_frames = (length - self.eff_k + self.padding_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (self.eff_k - self.padding_total)
        extra = ideal - length
        if self.causal:
            x = self._pad(x, self.padding_total, extra)
        else:
            right = self.padding_total // 2
            x = self._pad(x, self.padding_total - right, right + extra)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), self._weight(params), window_strides=(self.stride,),
            padding=[(0, 0)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NCW", "OIW", "NCW"))
        return y + params["conv"]["bias"].astype(self.dtype)[None, :, None]


class EncodecConvTranspose1d(Module):
    def __init__(self, config, in_ch, out_ch, kernel_size, stride=1, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.causal = config.use_causal_conv
        self.trim_right_ratio = config.trim_right_ratio
        self.in_ch, self.out_ch, self.k, self.stride = in_ch, out_ch, kernel_size, stride

    def init(self, rng):
        bound = 1.0 / math.sqrt(self.in_ch * self.k)
        kw, kb = jax.random.split(rng)
        v = jax.random.uniform(kw, (self.in_ch, self.out_ch, self.k),
                               self.param_dtype, -bound, bound)
        # torch weight_norm dim=0 keeps per-dim0 norms — for ConvTranspose
        # weights [in, out, k] that's per-IN-channel: g [in, 1, 1]
        g = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True))
        return {"conv": {
            "bias": jax.random.uniform(kb, (self.out_ch,), self.param_dtype, -bound, bound),
            "parametrizations": {"weight": {"original0": g.astype(self.param_dtype),
                                            "original1": v}}}}

    def __call__(self, params, x):
        p = params["conv"]["parametrizations"]["weight"]
        g = p["original0"].astype(jnp.float32)
        v = p["original1"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
        w = (g * v / norm).astype(self.dtype)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), w, strides=(self.stride,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), transpose_kernel=True)
        y = y + params["conv"]["bias"].astype(self.dtype)[None, :, None]
        padding_total = self.k - self.stride
        if self.causal:
            right = math.ceil(padding_total * self.trim_right_ratio)
        else:
            right = padding_total // 2
        left = padding_total - right
        end = y.shape[-1] - right
        return y[..., left:end]


class EncodecLSTM(Module):
    """Stacked torch LSTM over time + residual (gate order i,f,g,o)."""

    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim
        self.num_layers = config.num_lstm_layers

    def init(self, rng):
        params = {"lstm": {}}
        bound = 1.0 / math.sqrt(self.dim)
        for l in range(self.num_layers):
            for name, shape in [(f"weight_ih_l{l}", (4 * self.dim, self.dim)),
                                (f"weight_hh_l{l}", (4 * self.dim, self.dim)),
                                (f"bias_ih_l{l}", (4 * self.dim,)),
                                (f"bias_hh_l{l}", (4 * self.dim,))]:
                rng, k = jax.random.split(rng)
                params["lstm"][name] = jax.random.uniform(k, shape, self.param_dtype,
                                                          -bound, bound)
        return params

    def __call__(self, params, x):  # [B, C, T]
        h = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # [B, T, C]
        out = h
        for l in range(self.num_layers):
            w_ih = params["lstm"][f"weight_ih_l{l}"].astype(jnp.float32)
            w_hh = params["lstm"][f"weight_hh_l{l}"].astype(jnp.float32)
            b = (params["lstm"][f"bias_ih_l{l}"]
                 + params["lstm"][f"bias_hh_l{l}"]).astype(jnp.float32)
            xproj = jnp.einsum("btc,gc->btg", out, w_ih) + b  # [B, T, 4H]

            def step(carry, xt):
                hprev, cprev = carry
                gates = xt + jnp.dot(hprev, w_hh.T)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
                hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (hnew, c), hnew

            bsz = out.shape[0]
            init = (jnp.zeros((bsz, self.dim)), jnp.zeros((bsz, self.dim)))
            _, seq = jax.lax.scan(step, init, jnp.swapaxes(xproj, 0, 1))
            out = jnp.swapaxes(seq, 0, 1)
        return jnp.swapaxes((out + h).astype(x.dtype), 1, 2)


class EncodecResnetBlock(Module):
    def __init__(self, config, dim, dilations, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hidden = dim // config.compress
        kernel_sizes = (config.residual_kernel_size, 1)
        blocks = []
        for i, (k, dil) in enumerate(zip(kernel_sizes, dilations)):
            in_chs = dim if i == 0 else hidden
            out_chs = dim if i == len(kernel_sizes) - 1 else hidden
            blocks.append(EncodecConv1d(config, in_chs, out_chs, k, dilation=dil, **kw))
        self.block = blocks
        if config.use_conv_shortcut:
            self.shortcut = EncodecConv1d(config, dim, dim, 1, **kw)
        else:
            self.shortcut = None

    def init(self, rng):
        # torch ModuleList interleaves ELUs: convs sit at indices 1, 3, ...
        params = {"block": {}}
        for i, conv in enumerate(self.block):
            rng, k = jax.random.split(rng)
            params["block"][str(2 * i + 1)] = conv.init(k)
        if self.shortcut is not None:
            rng, k = jax.random.split(rng)
            params["shortcut"] = self.shortcut.init(k)
        return params

    def __call__(self, params, x):
        residual = x
        h = x
        for i, conv in enumerate(self.block):
            h = jax.nn.elu(h)
            # checkpoint indexes interleave ELUs: conv i sits at list slot 2i+1
            h = conv(params["block"][str(2 * i + 1)], h)
        if self.shortcut is not None:
            residual = self.shortcut(params["shortcut"], residual)
        return residual + h


class _SeanetStack(Module):
    """Shared encoder/decoder layer-list container with torch list indices."""

    def __init__(self, modules_with_index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.items = modules_with_index  # list of (index, module_or_"elu")

    def init(self, rng):
        params = {"layers": {}}
        for idx, mod in self.items:
            if mod == "elu":
                continue
            rng, k = jax.random.split(rng)
            params["layers"][str(idx)] = mod.init(k)
        return params

    def __call__(self, params, x):
        for idx, mod in self.items:
            if mod == "elu":
                x = jax.nn.elu(x)
            else:
                x = mod(params["layers"][str(idx)], x)
        return x


def build_encoder(config, *, dtype, param_dtype):
    kw = dict(dtype=dtype, param_dtype=param_dtype)
    items = [(0, EncodecConv1d(config, config.audio_channels, config.num_filters,
                               config.kernel_size, **kw))]
    idx = 1
    scaling = 1
    for ratio in reversed(config.upsampling_ratios):
        cur = scaling * config.num_filters
        for j in range(config.num_residual_layers):
            items.append((idx, EncodecResnetBlock(
                config, cur, [config.dilation_growth_rate**j, 1], **kw)))
            idx += 1
        items.append((idx, "elu")); idx += 1
        items.append((idx, EncodecConv1d(config, cur, cur * 2, ratio * 2,
                                         stride=ratio, **kw)))
        idx += 1
        scaling *= 2
    items.append((idx, EncodecLSTM(config, scaling * config.num_filters, **kw))); idx += 1
    items.append((idx, "elu")); idx += 1
    items.append((idx, EncodecConv1d(config, scaling * config.num_filters,
                                     config.hidden_size, config.last_kernel_size, **kw)))
    return _SeanetStack(items, **kw)


def build_decoder(config, *, dtype, param_dtype):
    kw = dict(dtype=dtype, param_dtype=param_dtype)
    scaling = int(2 ** len(config.upsampling_ratios))
    items = [(0, EncodecConv1d(config, config.hidden_size,
                               scaling * config.num_filters, config.kernel_size, **kw))]
    idx = 1
    items.append((idx, EncodecLSTM(config, scaling * config.num_filters, **kw))); idx += 1
    for ratio in config.upsampling_ratios:
        cur = scaling * config.num_filters
        items.append((idx, "elu")); idx += 1
        items.append((idx, EncodecConvTranspose1d(config, cur, cur // 2,
                                                  ratio * 2, stride=ratio, **kw)))
        idx += 1
        for j in range(config.num_residual_layers):
            items.append((idx, EncodecResnetBlock(
                config, cur // 2, [config.dilation_growth_rate**j, 1], **kw)))
            idx += 1
        scaling //= 2
    items.append((idx, "elu")); idx += 1
    items.append((idx, EncodecConv1d(config, config.num_filters,
                                     config.audio_channels, config.last_kernel_size, **kw)))
    return _SeanetStack(items, **kw)


class EncodecQuantizer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_quantizers = config.num_quantizers

    def init(self, rng):
        layers = {}
        for i in range(self.num_quantizers):
            layers[str(i)] = {"codebook": {
                "inited": jnp.ones((1,), self.param_dtype),
                "cluster_size": jnp.zeros((self.config.codebook_size,), self.param_dtype),
                "embed": jnp.zeros((self.config.codebook_size, self.config.codebook_dim),
                                   self.param_dtype),
                "embed_avg": jnp.zeros((self.config.codebook_size,
                                        self.config.codebook_dim), self.param_dtype)}}
        return {"layers": layers}

    def num_for_bandwidth(self, bandwidth):
        if bandwidth is None:
            return self.num_quantizers
        return int(max(1, math.floor(bandwidth * 1000
                                     / (self.config.frame_rate
                                        * self.config.bits_per_codebook))))

    def encode(self, params, embeddings, bandwidth=None):
        """[B, D, T] -> codes [B, nq, T]."""
        nq = self.num_for_bandwidth(bandwidth)
        residual = jnp.swapaxes(embeddings, 1, 2).astype(jnp.float32)  # [B, T, D]
        codes = []
        for i in range(nq):
            embed = params["layers"][str(i)]["codebook"]["embed"].astype(jnp.float32)
            dist = (jnp.sum(residual**2, -1, keepdims=True)
                    - 2 * residual @ embed.T
                    + jnp.sum(embed**2, -1)[None, None, :])
            idx = jnp.argmin(dist, axis=-1)
            codes.append(idx)
            residual = residual - jnp.take(embed, idx, axis=0)
        return jnp.stack(codes, axis=1)  # [B, nq, T]

    def decode(self, params, codes):
        """[B, nq, T] -> [B, D, T]."""
        out = 0.0
        for i in range(codes.shape[1]):
            embed = params["layers"][str(i)]["codebook"]["embed"].astype(jnp.float32)
            out = out + jnp.take(embed, codes[:, i], axis=0)
        return jnp.swapaxes(out, 1, 2).astype(self.dtype)


class EncodecPreTrainedModel(PreTrainedModel):
    config_class = EncodecConfig
    base_model_prefix = "encodec"


class EncodecModel(EncodecPreTrainedModel):
    def __init__(self, config: EncodecConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        if config.chunk_length_s is not None:
            raise NotImplementedError("chunked (48 kHz streaming) EnCodec is a follow-up")
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = build_encoder(config, **kw)
        self.decoder = build_decoder(config, **kw)
        self.quantizer = EncodecQuantizer(config, **kw)

    def encode(self, params, input_values, bandwidth=None):
        if bandwidth is None:
            bandwidth = self.config.target_bandwidths[0]
        emb = self.encoder(params["encoder"], jnp.asarray(input_values, self.dtype))
        codes = self.quantizer.encode(params["quantizer"], emb, bandwidth)
        return codes[None]  # [1(frames), B, nq, T]

    def decode(self, params, audio_codes):
        codes = audio_codes[0] if audio_codes.ndim == 4 else audio_codes
        emb = self.quantizer.decode(params["quantizer"], codes)
        return self.decoder(params["decoder"], emb)

    def __call__(self, params, input_values=None, padding_mask=None, bandwidth=None,
                 **kwargs) -> EncodecOutput:
        codes = self.encode(params, input_values, bandwidth)
        audio = self.decode(params, codes)
        audio = audio[..., : jnp.asarray(input_values).shape[-1]]
        return EncodecOutput(audio_codes=codes, audio_values=audio)
