"""UnivNet vocoder (reference models/univnet/modeling_univnet.py): noise +
log-mel conditioned waveform generation via location-variable convolutions —
a kernel-predictor resnet maps the spectrogram to per-hop-window conv
kernels/biases (:98); each LVC residual block applies its window's kernel to
the corresponding hop of the upsampled noise stream with a gated activation
(:218). The unfold/einsum of the reference (:269-330) becomes one gather
into [B, C, KL, hop, k] windows + a single einsum here."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, ConvTranspose, Module, ModuleList
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel


class UnivNetConfig(PretrainedConfig):
    model_type = "univnet"

    def __init__(self, model_in_channels=64, model_hidden_channels=32,
                 num_mel_bins=100, resblock_kernel_sizes=(3, 3, 3),
                 resblock_stride_sizes=(8, 8, 4),
                 resblock_dilation_sizes=((1, 3, 9, 27),) * 3,
                 kernel_predictor_num_blocks=3,
                 kernel_predictor_hidden_channels=64,
                 kernel_predictor_conv_size=3, kernel_predictor_dropout=0.0,
                 initializer_range=0.01, leaky_relu_slope=0.2, **kwargs):
        self.model_in_channels = model_in_channels
        self.model_hidden_channels = model_hidden_channels
        self.num_mel_bins = num_mel_bins
        self.resblock_kernel_sizes = list(resblock_kernel_sizes)
        self.resblock_stride_sizes = list(resblock_stride_sizes)
        self.resblock_dilation_sizes = [list(d) for d in resblock_dilation_sizes]
        self.kernel_predictor_num_blocks = kernel_predictor_num_blocks
        self.kernel_predictor_hidden_channels = kernel_predictor_hidden_channels
        self.kernel_predictor_conv_size = kernel_predictor_conv_size
        self.kernel_predictor_dropout = kernel_predictor_dropout
        self.initializer_range = initializer_range
        self.leaky_relu_slope = leaky_relu_slope
        super().__init__(**kwargs)


@dataclass
class UnivNetModelOutput(ModelOutput):
    waveforms: Any = None
    waveform_lengths: Any = None


def _lrelu(x, slope):
    return jax.nn.leaky_relu(x, slope)


class UnivNetKernelPredictorResidualBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ch = config.kernel_predictor_hidden_channels
        k = config.kernel_predictor_conv_size
        self.conv1 = Conv(ch, ch, k, padding=(k - 1) // 2, ndim=1, **kw)
        self.conv2 = Conv(ch, ch, k, padding=(k - 1) // 2, ndim=1, **kw)
        self.slope = config.leaky_relu_slope

    def __call__(self, params, x):
        h = _lrelu(self.conv1(params["conv1"], x), self.slope)
        h = _lrelu(self.conv2(params["conv2"], h), self.slope)
        return h + x


class UnivNetKernelPredictor(Module):
    def __init__(self, config, conv_kernel_size, conv_layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.cin = config.model_hidden_channels
        self.cout = 2 * config.model_hidden_channels
        self.k = conv_kernel_size
        self.layers = conv_layers
        kc = self.cin * self.cout * self.k * conv_layers
        bc = self.cout * conv_layers
        hid = config.kernel_predictor_hidden_channels
        rk = config.kernel_predictor_conv_size
        self.input_conv = Conv(config.num_mel_bins, hid, 5, padding=2, ndim=1, **kw)
        self.resblocks = [UnivNetKernelPredictorResidualBlock(config, **kw)
                          for _ in range(config.kernel_predictor_num_blocks)]
        self.kernel_conv = Conv(hid, kc, rk, padding=(rk - 1) // 2, ndim=1, **kw)
        self.bias_conv = Conv(hid, bc, rk, padding=(rk - 1) // 2, ndim=1, **kw)
        self.slope = config.leaky_relu_slope

    def __call__(self, params, spectrogram):  # [B, mel, T]
        b, _, t = spectrogram.shape
        h = _lrelu(self.input_conv(params["input_conv"], spectrogram), self.slope)
        for i, rb in enumerate(self.resblocks):
            h = rb(params["resblocks"][str(i)], h)
        kernels = self.kernel_conv(params["kernel_conv"], h).reshape(
            b, self.layers, self.cin, self.cout, self.k, t)
        biases = self.bias_conv(params["bias_conv"], h).reshape(
            b, self.layers, self.cout, t)
        return kernels, biases


def location_variable_convolution(x, kernel, bias, hop_size):
    """x [B, Cin, KL*hop]; kernel [B, Cin, Cout, k, KL]; bias [B, Cout, KL].
    dilation is always 1 on this path (reference calls with the default)."""
    b, cin, L = x.shape
    _, _, cout, k, kl = kernel.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    idx = (np.arange(kl)[:, None, None] * hop_size
           + np.arange(hop_size)[None, :, None]
           + np.arange(k)[None, None, :])  # [KL, hop, k]
    xw = xp[:, :, jnp.asarray(idx)]  # [B, Cin, KL, hop, k]
    out = jnp.einsum("bilsk,biokl->bols", xw, kernel)
    out = out + bias[:, :, :, None]
    return out.reshape(b, cout, kl * hop_size)


class UnivNetLvcResidualBlock(Module):
    def __init__(self, config, kernel_size, dilation, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        ch = config.model_hidden_channels
        self.hidden_channels = ch
        self.conv = Conv(ch, ch, kernel_size,
                         padding=dilation * (kernel_size - 1) // 2,
                         dilation=dilation, ndim=1,
                         dtype=dtype, param_dtype=param_dtype)
        self.slope = config.leaky_relu_slope

    def __call__(self, params, x, kernel, bias, hop_size):
        residual = x
        h = _lrelu(x, self.slope)
        h = _lrelu(self.conv(params["conv"], h), self.slope)
        h = location_variable_convolution(h, kernel, bias, hop_size)
        h = jax.nn.sigmoid(h[:, : self.hidden_channels]) * \
            jnp.tanh(h[:, self.hidden_channels:])
        return residual + h


class UnivNetLvcBlock(Module):
    def __init__(self, config, layer_id, lvc_hop_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ch = config.model_hidden_channels
        kernel_size = config.resblock_kernel_sizes[layer_id]
        stride = config.resblock_stride_sizes[layer_id]
        dilations = config.resblock_dilation_sizes[layer_id]
        self.cond_hop_length = lvc_hop_size
        self.slope = config.leaky_relu_slope
        self.convt_pre = ConvTranspose(
            ch, ch, 2 * stride, stride=stride,
            padding=stride // 2 + stride % 2, output_padding=stride % 2,
            ndim=1, **kw)
        self.kernel_predictor = UnivNetKernelPredictor(
            config, kernel_size, len(dilations), **kw)
        self.resblocks = [UnivNetLvcResidualBlock(config, kernel_size, d, **kw)
                          for d in dilations]

    def __call__(self, params, x, spectrogram):
        h = _lrelu(x, self.slope)
        h = self.convt_pre(params["convt_pre"], h)
        kernels, biases = self.kernel_predictor(params["kernel_predictor"],
                                                spectrogram)
        for i, rb in enumerate(self.resblocks):
            h = rb(params["resblocks"][str(i)], h, kernels[:, i], biases[:, i],
                   self.cond_hop_length)
        return h


class UnivNetModel(PreTrainedModel):
    config_class = UnivNetConfig
    base_model_prefix = ""
    main_input_name = "input_features"

    def __init__(self, config: UnivNetConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ch = config.model_hidden_channels
        self.slope = config.leaky_relu_slope
        self.conv_pre = Conv(config.model_in_channels, ch, 7, padding=0,
                             ndim=1, **kw)
        hop = 1
        hops = []
        for s in config.resblock_stride_sizes:
            hop *= s
            hops.append(hop)
        self.resblocks = [UnivNetLvcBlock(config, i, hops[i], **kw)
                          for i in range(len(config.resblock_stride_sizes))]
        self.conv_post = Conv(ch, 1, 7, padding=0, ndim=1, **kw)

    def __call__(self, params, input_features=None, noise_sequence=None,
                 padding_mask=None, **kwargs) -> UnivNetModelOutput:
        feats = jnp.asarray(input_features)
        if feats.ndim == 2:
            feats = feats[None]
        b, t, _ = feats.shape
        if noise_sequence is None:
            noise_sequence = jax.random.normal(
                jax.random.key(0), (b, t, self.config.model_in_channels))
        noise = jnp.asarray(noise_sequence)
        if noise.ndim == 2:
            noise = noise[None]
        if noise.shape[0] == 1 and b > 1:
            noise = jnp.broadcast_to(noise, (b,) + noise.shape[1:])
        h = noise.transpose(0, 2, 1)
        spec = feats.transpose(0, 2, 1)
        # reflect-padded 7-tap pre/post convs (torch padding_mode="reflect")
        h = jnp.pad(h, ((0, 0), (0, 0), (3, 3)), mode="reflect")
        h = self.conv_pre(params["conv_pre"], h)
        for i, rb in enumerate(self.resblocks):
            h = rb(params["resblocks"][str(i)], h, spec)
        h = _lrelu(h, self.slope)
        h = jnp.pad(h, ((0, 0), (0, 0), (3, 3)), mode="reflect")
        h = jnp.tanh(self.conv_post(params["conv_post"], h))
        waveform = h[:, 0]
        lengths = None
        if padding_mask is not None:
            lengths = jnp.sum(jnp.asarray(padding_mask), axis=1)
        return UnivNetModelOutput(waveforms=waveform, waveform_lengths=lengths)
