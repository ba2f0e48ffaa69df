"""VITS / MMS-TTS text-to-speech, TPU-native.

Semantics match reference src/transformers/models/vits/modeling_vits.py:
- text encoder with windowed RELATIVE positional attention (:844-998 —
  the pad/reshape relative->absolute trick is reproduced with static
  shapes) and masked conv FFN (:1000-1040);
- stochastic duration predictor run in reverse (:707-806): dilated
  depth-separable conv stacks, elementwise-affine + rational-quadratic
  spline conv flows (:93-304, vectorized with `where` instead of boolean
  indexing — no data-dependent shapes);
- residual-coupling prior flow in reverse over a WaveNet (:305-383,
  weight-norm parametrizations kept as g/v leaves like the checkpoints);
- HiFi-GAN decoder (:404-552) with transposed convs lowered to
  lhs-dilated convolutions.

Inference is deterministic when ``noise_scale == noise_scale_duration == 0``
(the reference draws torch.randn scaled by these). The duration->frame
expansion produces a data-dependent length; this implementation computes the
total on host (eager path) — serving should bucket ``max_output_length``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_vits import VitsConfig


@dataclass
class VitsModelOutput(ModelOutput):
    waveform: jnp.ndarray = None
    sequence_lengths: jnp.ndarray = None
    spectrogram: jnp.ndarray = None


@dataclass
class VitsTextEncoderOutput(ModelOutput):
    last_hidden_state: jnp.ndarray = None
    prior_means: jnp.ndarray = None
    prior_log_variances: jnp.ndarray = None


# ---------------------------------------------------------------- conv utils
class Conv1dWeightNorm(Module):
    """Conv1d with torch weight-norm parametrization leaves (dim=0)."""

    def __init__(self, in_ch, out_ch, kernel, dilation=1, padding=0, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_ch, self.out_ch, self.kernel = in_ch, out_ch, kernel
        self.dilation, self.padding = dilation, padding

    def init(self, rng):
        v = normal_init(0.02)(rng, (self.out_ch, self.in_ch, self.kernel), self.param_dtype)
        g = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True))
        return {"bias": jnp.zeros((self.out_ch,), self.param_dtype),
                "parametrizations": {"weight": {"original0": g.astype(self.param_dtype),
                                                "original1": v}}}

    def __call__(self, params, x):  # [B, C, T]
        p = params["parametrizations"]["weight"]
        g = p["original0"].astype(jnp.float32)
        v = p["original1"].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
        w = (g * v / norm).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(1,),
            padding=[(self.padding, self.padding)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NCW", "OIW", "NCW"))
        return y + params["bias"].astype(self.dtype)[None, :, None]


class ConvTranspose1d(Module):
    """torch ConvTranspose1d lowered to an lhs-dilated conv (verified
    numerically: flip kernel, swap I/O, pad k-1-p)."""

    def __init__(self, in_ch, out_ch, kernel, stride, padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_ch, self.out_ch = in_ch, out_ch
        self.kernel, self.stride, self.padding = kernel, stride, padding

    def init(self, rng):
        k = 1.0 / math.sqrt(self.in_ch * self.kernel)
        kw, kb = jax.random.split(rng)
        return {"weight": jax.random.uniform(kw, (self.in_ch, self.out_ch, self.kernel),
                                             self.param_dtype, -k, k),
                "bias": jax.random.uniform(kb, (self.out_ch,), self.param_dtype, -k, k)}

    def __call__(self, params, x):
        w = params["weight"].astype(self.dtype)
        wf = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
        pad = self.kernel - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wf, window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(self.stride,), dimension_numbers=("NCW", "OIW", "NCW"))
        return y + params["bias"].astype(self.dtype)[None, :, None]


def conv1d(in_ch, out_ch, kernel, *, dilation=1, padding=0, groups=1, bias=True, dtype,
           param_dtype):
    return Conv(in_ch, out_ch, kernel, stride=1, padding=padding, use_bias=bias,
                groups=groups, ndim=1, dtype=dtype, param_dtype=param_dtype,
                dilation=dilation)


# ---------------------------------------------------------------- spline
def _rational_quadratic_spline(inputs, uw, uh, ud, reverse, tail_bound,
                               min_bin_width=1e-3, min_bin_height=1e-3,
                               min_derivative=1e-3):
    """Vectorized reference _rational_quadratic_spline (:167-304); operates on
    full [.., T] tensors with bin dims [.., T, bins]."""
    num_bins = uw.shape[-1]
    upper, lower = tail_bound, -tail_bound

    widths = jax.nn.softmax(uw, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (upper - lower) * cumwidths + lower
    cumwidths = cumwidths.at[..., 0].set(lower).at[..., -1].set(upper)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(ud)

    heights = jax.nn.softmax(uh, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (upper - lower) * cumheights + lower
    cumheights = cumheights.at[..., 0].set(lower).at[..., -1].set(upper)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_locations = cumheights if reverse else cumwidths
    bin_locations = bin_locations.at[..., -1].add(1e-6)
    bin_idx = jnp.sum((inputs[..., None] >= bin_locations).astype(jnp.int32), axis=-1) - 1
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    take = lambda t: jnp.take_along_axis(t, bin_idx, axis=-1)[..., 0]
    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_plus_one = take(derivatives[..., 1:])
    input_heights = take(heights)

    inter1 = input_derivatives + input_derivatives_plus_one - 2 * input_delta
    if not reverse:
        theta = (inputs - input_cumwidths) / input_bin_widths
        tomt = theta * (1 - theta)
        numerator = input_heights * (input_delta * theta**2 + input_derivatives * tomt)
        denominator = input_delta + inter1 * tomt
        outputs = input_cumheights + numerator / denominator
        dnum = input_delta**2 * (input_derivatives_plus_one * theta**2
                                 + 2 * input_delta * tomt
                                 + input_derivatives * (1 - theta) ** 2)
        log_abs_det = jnp.log(dnum) - 2 * jnp.log(denominator)
        return outputs, log_abs_det
    inter2 = inputs - input_cumheights
    inter3 = inter2 * inter1
    a = input_heights * (input_delta - input_derivatives) + inter3
    b = input_heights * input_derivatives - inter3
    c = -input_delta * inter2
    disc = b**2 - 4 * a * c
    root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
    outputs = root * input_bin_widths + input_cumwidths
    tomt = root * (1 - root)
    denominator = input_delta + inter1 * tomt
    dnum = input_delta**2 * (input_derivatives_plus_one * root**2
                             + 2 * input_delta * tomt
                             + input_derivatives * (1 - root) ** 2)
    return outputs, -(jnp.log(dnum) - 2 * jnp.log(denominator))


def unconstrained_rational_quadratic_spline(inputs, uw, uh, ud, reverse, tail_bound):
    """reference :93-166 — identity outside the tail bound."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    constant = float(np.log(np.exp(1 - 1e-3) - 1))
    ud = jnp.pad(ud, [(0, 0)] * (ud.ndim - 1) + [(1, 1)], constant_values=constant)
    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    out, log_det = _rational_quadratic_spline(safe_inputs, uw, uh, ud, reverse, tail_bound)
    return jnp.where(inside, out, inputs), jnp.where(inside, log_det, 0.0)


# ---------------------------------------------------------------- wavenet
class VitsWaveNet(Module):
    def __init__(self, config, num_layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden_size = config.hidden_size
        self.num_layers = num_layers
        in_layers, res_skip = [], []
        for i in range(num_layers):
            dilation = config.wavenet_dilation_rate**i
            padding = (config.wavenet_kernel_size * dilation - dilation) // 2
            in_layers.append(Conv1dWeightNorm(config.hidden_size, 2 * config.hidden_size,
                                              config.wavenet_kernel_size, dilation=dilation,
                                              padding=padding, **kw))
            res_ch = 2 * config.hidden_size if i < num_layers - 1 else config.hidden_size
            res_skip.append(Conv1dWeightNorm(config.hidden_size, res_ch, 1, **kw))
        self.in_layers = in_layers
        self.res_skip_layers = res_skip

    def __call__(self, params, inputs, padding_mask):
        outputs = jnp.zeros_like(inputs)
        h = self.hidden_size
        for i in range(self.num_layers):
            hs = self.in_layers[i](params["in_layers"][str(i)], inputs)
            acts = jnp.tanh(hs[:, :h]) * jax.nn.sigmoid(hs[:, h:])
            rs = self.res_skip_layers[i](params["res_skip_layers"][str(i)], acts)
            if i < self.num_layers - 1:
                inputs = (inputs + rs[:, :h]) * padding_mask
                outputs = outputs + rs[:, h:]
            else:
                outputs = outputs + rs
        return outputs * padding_mask


class VitsResidualCouplingLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.half = config.flow_size // 2
        self.conv_pre = conv1d(self.half, config.hidden_size, 1, **kw)
        self.wavenet = VitsWaveNet(config, config.prior_encoder_num_wavenet_layers, **kw)
        self.conv_post = conv1d(config.hidden_size, self.half, 1, **kw)

    def __call__(self, params, inputs, padding_mask, reverse=False):
        first, second = inputs[:, :self.half], inputs[:, self.half:]
        h = self.conv_pre(params["conv_pre"], first) * padding_mask
        h = self.wavenet(params["wavenet"], h, padding_mask)
        mean = self.conv_post(params["conv_post"], h) * padding_mask
        if not reverse:
            second = (mean + second) * padding_mask
        else:
            second = (second - mean) * padding_mask
        return jnp.concatenate([first, second], axis=1)


class VitsResidualCouplingBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.flows = [VitsResidualCouplingLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.prior_encoder_num_flows)]

    def __call__(self, params, inputs, padding_mask, reverse=False):
        if not reverse:
            for i, flow in enumerate(self.flows):
                inputs = flow(params["flows"][str(i)], inputs, padding_mask)
                inputs = jnp.flip(inputs, axis=1)
        else:
            for i in reversed(range(len(self.flows))):
                inputs = jnp.flip(inputs, axis=1)
                inputs = self.flows[i](params["flows"][str(i)], inputs, padding_mask,
                                       reverse=True)
        return inputs


# ---------------------------------------------------------------- hifigan
class HifiGanResidualBlock(Module):
    def __init__(self, channels, kernel_size, dilations, slope, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        pad = lambda d: (kernel_size * d - d) // 2
        self.convs1 = [conv1d(channels, channels, kernel_size, dilation=d, padding=pad(d), **kw)
                       for d in dilations]
        self.convs2 = [conv1d(channels, channels, kernel_size, dilation=1, padding=pad(1), **kw)
                       for _ in dilations]
        self.slope = slope

    def __call__(self, params, x):
        for i in range(len(self.convs1)):
            residual = x
            x = jax.nn.leaky_relu(x, self.slope)
            x = self.convs1[i](params["convs1"][str(i)], x)
            x = jax.nn.leaky_relu(x, self.slope)
            x = self.convs2[i](params["convs2"][str(i)], x)
            x = x + residual
        return x


class VitsHifiGan(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_kernels = len(config.resblock_kernel_sizes)
        self.num_upsamples = len(config.upsample_rates)
        self.conv_pre = conv1d(config.flow_size, config.upsample_initial_channel, 7,
                               padding=3, **kw)
        self.upsampler = [
            ConvTranspose1d(config.upsample_initial_channel // (2**i),
                            config.upsample_initial_channel // (2 ** (i + 1)),
                            k, s, (k - s) // 2, **kw)
            for i, (s, k) in enumerate(zip(config.upsample_rates, config.upsample_kernel_sizes))
        ]
        resblocks = []
        for i in range(len(self.upsampler)):
            ch = config.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes):
                resblocks.append(HifiGanResidualBlock(ch, k, d, config.leaky_relu_slope, **kw))
        self.resblocks = resblocks
        self.conv_post = conv1d(ch, 1, 7, padding=3, bias=False, **kw)

    def __call__(self, params, spectrogram):
        x = self.conv_pre(params["conv_pre"], spectrogram)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, self.config.leaky_relu_slope)
            x = self.upsampler[i](params["upsampler"][str(i)], x)
            res = self.resblocks[i * self.num_kernels](
                params["resblocks"][str(i * self.num_kernels)], x)
            for j in range(1, self.num_kernels):
                res = res + self.resblocks[i * self.num_kernels + j](
                    params["resblocks"][str(i * self.num_kernels + j)], x)
            x = res / self.num_kernels
        x = jax.nn.leaky_relu(x, 0.01)
        x = self.conv_post(params["conv_post"], x)
        return jnp.tanh(x)


# ------------------------------------------------------- duration predictors
class VitsDilatedDepthSeparableConv(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        k = config.duration_predictor_kernel_size
        ch = config.hidden_size
        self.num_layers = config.depth_separable_num_layers
        convs_dilated, convs_pointwise, norms_1, norms_2 = [], [], [], []
        for i in range(self.num_layers):
            dilation = k**i
            padding = (k * dilation - dilation) // 2
            convs_dilated.append(conv1d(ch, ch, k, dilation=dilation, padding=padding,
                                        groups=ch, **kw))
            convs_pointwise.append(conv1d(ch, ch, 1, **kw))
            norms_1.append(LayerNorm(ch, **kw))
            norms_2.append(LayerNorm(ch, **kw))
        # assign AFTER building: list-of-module registration happens at
        # attribute-assignment time
        self.convs_dilated = convs_dilated
        self.convs_pointwise = convs_pointwise
        self.norms_1 = norms_1
        self.norms_2 = norms_2

    def __call__(self, params, inputs, padding_mask, global_conditioning=None):
        if global_conditioning is not None:
            inputs = inputs + global_conditioning
        for i in range(self.num_layers):
            h = self.convs_dilated[i](params["convs_dilated"][str(i)], inputs * padding_mask)
            h = jnp.swapaxes(self.norms_1[i](params["norms_1"][str(i)], jnp.swapaxes(h, 1, 2)), 1, 2)
            h = jax.nn.gelu(h, approximate=False)
            h = self.convs_pointwise[i](params["convs_pointwise"][str(i)], h)
            h = jnp.swapaxes(self.norms_2[i](params["norms_2"][str(i)], jnp.swapaxes(h, 1, 2)), 1, 2)
            h = jax.nn.gelu(h, approximate=False)
            inputs = inputs + h
        return inputs * padding_mask


class VitsConvFlow(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.filter_channels = config.hidden_size
        self.half = config.depth_separable_channels // 2
        self.num_bins = config.duration_predictor_flow_bins
        self.tail_bound = config.duration_predictor_tail_bound
        self.conv_pre = conv1d(self.half, self.filter_channels, 1, **kw)
        self.conv_dds = VitsDilatedDepthSeparableConv(config, **kw)
        self.conv_proj = conv1d(self.filter_channels, self.half * (self.num_bins * 3 - 1), 1, **kw)

    def __call__(self, params, inputs, padding_mask, global_conditioning=None, reverse=False):
        first, second = inputs[:, :self.half], inputs[:, self.half:]
        h = self.conv_pre(params["conv_pre"], first)
        h = self.conv_dds(params["conv_dds"], h, padding_mask, global_conditioning)
        h = self.conv_proj(params["conv_proj"], h) * padding_mask
        b, c, t = first.shape
        h = h.reshape(b, c, -1, t).transpose(0, 1, 3, 2)  # [B, half, T, 3*bins-1]
        scale = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins : 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins :]
        second, _ = unconstrained_rational_quadratic_spline(
            second, uw, uh, ud, reverse=reverse, tail_bound=self.tail_bound)
        return jnp.concatenate([first, second], axis=1) * padding_mask


class VitsElementwiseAffine(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.channels = config.depth_separable_channels

    def init(self, rng):
        return {"translate": jnp.zeros((self.channels, 1), self.param_dtype),
                "log_scale": jnp.zeros((self.channels, 1), self.param_dtype)}

    def __call__(self, params, inputs, padding_mask, global_conditioning=None, reverse=False):
        t = params["translate"].astype(inputs.dtype)
        s = params["log_scale"].astype(inputs.dtype)
        if not reverse:
            return (t + jnp.exp(s) * inputs) * padding_mask
        return (inputs - t) * jnp.exp(-s) * padding_mask


class VitsStochasticDurationPredictor(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        fc = config.hidden_size
        self.conv_pre = conv1d(fc, fc, 1, **kw)
        self.conv_proj = conv1d(fc, fc, 1, **kw)
        self.conv_dds = VitsDilatedDepthSeparableConv(config, **kw)
        self.flows = [VitsElementwiseAffine(config, **kw)] + [
            VitsConvFlow(config, **kw) for _ in range(config.duration_predictor_num_flows)]

    def __call__(self, params, inputs, padding_mask, noise_scale=1.0, latents=None):
        """Reverse (inference) mode only: log durations from noise
        (reference :792-806). ``latents`` lets tests inject the randoms."""
        inputs = self.conv_pre(params["conv_pre"], inputs)
        inputs = self.conv_dds(params["conv_dds"], inputs, padding_mask)
        inputs = self.conv_proj(params["conv_proj"], inputs) * padding_mask

        b, _, t = inputs.shape
        if latents is None:
            latents = jnp.zeros((b, 2, t), inputs.dtype)
        latents = latents * noise_scale

        order = list(reversed(range(len(self.flows))))
        order = order[:-2] + [order[-1]]  # drop the unused flow (reference :793)
        for i in order:
            latents = jnp.flip(latents, axis=1)
            latents = self.flows[i](params["flows"][str(i)], latents, padding_mask,
                                    global_conditioning=inputs, reverse=True)
        return latents[:, 0:1]


class VitsDurationPredictor(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        k = config.duration_predictor_kernel_size
        fc = config.duration_predictor_filter_channels
        self.conv_1 = conv1d(config.hidden_size, fc, k, padding=k // 2, **kw)
        self.norm_1 = LayerNorm(fc, config.layer_norm_eps, **kw)
        self.conv_2 = conv1d(fc, fc, k, padding=k // 2, **kw)
        self.norm_2 = LayerNorm(fc, config.layer_norm_eps, **kw)
        self.proj = conv1d(fc, 1, 1, **kw)

    def __call__(self, params, inputs, padding_mask, noise_scale=None, latents=None):
        h = jax.nn.relu(self.conv_1(params["conv_1"], inputs * padding_mask))
        h = jnp.swapaxes(self.norm_1(params["norm_1"], jnp.swapaxes(h, 1, 2)), 1, 2)
        h = jax.nn.relu(self.conv_2(params["conv_2"], h * padding_mask))
        h = jnp.swapaxes(self.norm_2(params["norm_2"], jnp.swapaxes(h, 1, 2)), 1, 2)
        return self.proj(params["proj"], h * padding_mask) * padding_mask


# ---------------------------------------------------------------- encoder
class VitsAttention(Module):
    """Self-attention with windowed relative position bias (:844-998)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        e = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = e // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        self.window_size = config.window_size
        self.q_proj = Linear(e, e, config.use_bias, **kw)
        self.k_proj = Linear(e, e, config.use_bias, **kw)
        self.v_proj = Linear(e, e, config.use_bias, **kw)
        self.out_proj = Linear(e, e, config.use_bias, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.window_size:
            k1, k2 = jax.random.split(rng)
            params["emb_rel_k"] = (jax.random.normal(
                k1, (1, 2 * self.window_size + 1, self.head_dim), self.param_dtype) * self.scale)
            params["emb_rel_v"] = (jax.random.normal(
                k2, (1, 2 * self.window_size + 1, self.head_dim), self.param_dtype) * self.scale)
        return params

    def _rel_embeddings(self, table, length):
        """reference _get_relative_embeddings (:960-968)."""
        pad = max(length - (self.window_size + 1), 0)
        if pad > 0:
            table = jnp.pad(table, ((0, 0), (pad, pad), (0, 0)))
        start = max((self.window_size + 1) - length, 0)
        return table[:, start : start + 2 * length - 1]

    @staticmethod
    def _rel_to_abs(x):
        """[BH, L, 2L-1] -> [BH, L, L] (reference :970-983)."""
        bh, length, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
        x = x.reshape(bh, length * 2 * length)
        x = jnp.pad(x, ((0, 0), (0, length - 1)))
        x = x.reshape(bh, length + 1, 2 * length - 1)
        return x[:, :length, length - 1:]

    @staticmethod
    def _abs_to_rel(x):
        """[BH, L, L] -> [BH, L, 2L-1] (reference :985-996)."""
        bh, length, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
        x = x.reshape(bh, length * (2 * length - 1))
        x = jnp.pad(x, ((0, 0), (length, 0)))
        return x.reshape(bh, length, 2 * length)[:, :, 1:]

    def __call__(self, params, hidden, mask_bias):
        b, t, e = hidden.shape
        h, d = self.num_heads, self.head_dim
        q = (self.q_proj(params["q_proj"], hidden) * self.scale).reshape(b, t, h, d)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, t, h, d)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, t, h, d)
        q = q.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        k = k.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        v = v.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        weights = jnp.einsum("btd,bsd->bts", q, k, preferred_element_type=jnp.float32)
        if self.window_size:
            rel_k = self._rel_embeddings(params["emb_rel_k"].astype(jnp.float32), t)
            rel_logits = jnp.einsum("btd,xrd->btr", q.astype(jnp.float32), rel_k)
            weights = weights + self._rel_to_abs(rel_logits)
        if mask_bias is not None:
            weights = weights.reshape(b, h, t, t) + mask_bias
            weights = weights.reshape(b * h, t, t)
        probs = jax.nn.softmax(weights, axis=-1)
        out = jnp.einsum("bts,bsd->btd", probs.astype(v.dtype), v)
        if self.window_size:
            rel_v = self._rel_embeddings(params["emb_rel_v"].astype(jnp.float32), t)
            rel_w = self._abs_to_rel(probs)
            out = out + jnp.einsum("btr,xrd->btd", rel_w, rel_v).astype(out.dtype)
        out = out.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(b, t, e)
        return self.out_proj(params["out_proj"], out)


class VitsFeedForward(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv_1 = conv1d(config.hidden_size, config.ffn_dim, config.ffn_kernel_size, **kw)
        self.conv_2 = conv1d(config.ffn_dim, config.hidden_size, config.ffn_kernel_size, **kw)
        self.act = get_activation(config.hidden_act)
        k = config.ffn_kernel_size
        self.pad = (( (k - 1) // 2, k // 2) if k > 1 else None)

    def __call__(self, params, hidden, padding_mask):
        h = jnp.swapaxes(hidden, 1, 2)
        mask = jnp.swapaxes(padding_mask, 1, 2)
        h = h * mask
        if self.pad:
            h = jnp.pad(h, ((0, 0), (0, 0), self.pad))
        h = self.act(self.conv_1(params["conv_1"], h))
        h = h * mask
        if self.pad:
            h = jnp.pad(h, ((0, 0), (0, 0), self.pad))
        h = self.conv_2(params["conv_2"], h)
        return jnp.swapaxes(h * mask, 1, 2)


class VitsEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = VitsAttention(config, **kw)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.feed_forward = VitsFeedForward(config, **kw)
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, padding_mask, mask_bias):
        h = self.attention(params["attention"], hidden, mask_bias)
        hidden = self.layer_norm(params["layer_norm"], hidden + h)
        h = self.feed_forward(params["feed_forward"], hidden, padding_mask)
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class VitsTextEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.encoder = _VitsEncoder(config, **kw)
        self.project = conv1d(config.hidden_size, config.flow_size * 2, 1, **kw)

    def __call__(self, params, input_ids, padding_mask, attention_mask=None):
        h = self.embed_tokens(params["embed_tokens"], input_ids) * math.sqrt(self.config.hidden_size)
        h = self.encoder(params["encoder"], h, padding_mask, attention_mask)
        stats = self.project(params["project"], jnp.swapaxes(h, 1, 2))
        stats = jnp.swapaxes(stats, 1, 2) * padding_mask
        means = stats[..., : self.config.flow_size]
        log_var = stats[..., self.config.flow_size :]
        return VitsTextEncoderOutput(last_hidden_state=h, prior_means=means,
                                     prior_log_variances=log_var)


class _VitsEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [VitsEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, padding_mask, attention_mask=None):
        mask_bias = None
        if attention_mask is not None:
            mask_bias = jnp.where(attention_mask.astype(bool), 0.0, -1e9)[:, None, None, :]
        hidden = hidden * padding_mask
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, padding_mask, mask_bias)
        return hidden * padding_mask


# ---------------------------------------------------------------- model
class VitsPreTrainedModel(PreTrainedModel):
    config_class = VitsConfig
    base_model_prefix = "vits"
    main_input_name = "input_ids"
    _keys_to_ignore_on_load_unexpected = (r"^posterior_encoder\.",)


class VitsModel(VitsPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.config = config
        self.text_encoder = VitsTextEncoder(config, **kw)
        self.flow = VitsResidualCouplingBlock(config, **kw)
        self.decoder = VitsHifiGan(config, **kw)
        if config.use_stochastic_duration_prediction:
            self.duration_predictor = VitsStochasticDurationPredictor(config, **kw)
        else:
            self.duration_predictor = VitsDurationPredictor(config, **kw)
        self.speaking_rate = config.speaking_rate
        self.noise_scale = config.noise_scale
        self.noise_scale_duration = config.noise_scale_duration

    def __call__(self, params, input_ids=None, attention_mask=None, speaking_rate=None,
                 prng_key=None, **kwargs) -> VitsModelOutput:
        if attention_mask is not None:
            padding = attention_mask[..., None].astype(jnp.float32)
        else:
            padding = jnp.ones((*input_ids.shape, 1), jnp.float32)

        enc = self.text_encoder(params["text_encoder"], input_ids, padding, attention_mask)
        hidden = jnp.swapaxes(enc.last_hidden_state, 1, 2)  # [B, C, T]
        padding_t = jnp.swapaxes(padding, 1, 2)             # [B, 1, T]

        dur_latents = None
        if prng_key is not None and self.config.use_stochastic_duration_prediction:
            b, _, t = hidden.shape
            dur_latents = jax.random.normal(prng_key, (b, 2, t), jnp.float32)
        log_duration = self.duration_predictor(
            params["duration_predictor"], hidden, padding_t,
            noise_scale=self.noise_scale_duration, latents=dur_latents)

        rate = speaking_rate if speaking_rate is not None else self.speaking_rate
        duration = jnp.ceil(jnp.exp(log_duration) * padding_t / rate)
        predicted_lengths = jnp.maximum(jnp.sum(duration, axis=(1, 2)), 1).astype(jnp.int32)
        # Dynamic output length -> host sync (eager path). Serving should pass
        # bucketed shapes through `max_output_length` instead.
        out_len = int(np.max(np.asarray(predicted_lengths)))

        indices = jnp.arange(out_len)
        output_padding = (indices[None, :] < predicted_lengths[:, None]).astype(jnp.float32)
        output_padding = output_padding[:, None, :]  # [B, 1, out]

        # duration -> monotonic alignment (reference :1360-1372)
        b, _, t_in = duration.shape
        attn_mask = padding_t[:, 0, :, None] * output_padding[:, 0, None, :]  # [B, T_in, T_out]
        cum_duration = jnp.cumsum(duration[:, 0], axis=-1)  # [B, T_in]
        valid = (indices[None, None, :] < cum_duration[..., None]).astype(jnp.float32)
        shifted = jnp.pad(valid, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        attn = (valid - shifted) * attn_mask  # [B, T_in, T_out]

        prior_means = jnp.einsum("bio,bic->boc", attn, enc.prior_means)
        prior_log_var = jnp.einsum("bio,bic->boc", attn, enc.prior_log_variances)
        prior_means = jnp.swapaxes(prior_means, 1, 2)      # [B, C, out]
        prior_log_var = jnp.swapaxes(prior_log_var, 1, 2)

        if prng_key is not None and self.noise_scale:
            prng_key, sub = jax.random.split(prng_key)
            noise = jax.random.normal(sub, prior_means.shape, jnp.float32)
        else:
            noise = jnp.zeros_like(prior_means)
        prior_latents = prior_means + noise * jnp.exp(prior_log_var) * self.noise_scale
        latents = self.flow(params["flow"], prior_latents, output_padding, reverse=True)
        spectrogram = latents * output_padding
        waveform = self.decoder(params["decoder"], spectrogram)[:, 0]
        seq_lengths = predicted_lengths * int(np.prod(self.config.upsample_rates))
        return VitsModelOutput(waveform=waveform, sequence_lengths=seq_lengths,
                               spectrogram=spectrogram)
