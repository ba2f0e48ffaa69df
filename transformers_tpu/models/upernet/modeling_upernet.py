"""UperNet semantic segmentation (reference
models/upernet/modeling_upernet.py): multi-scale backbone features through a
PSP pyramid-pooling bottleneck + FPN lateral fusion, bilinear-upsampled
logits; optional FCN auxiliary head."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import BatchNorm, Conv, Module, ModuleList
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..convnext.modeling_convnext import (
    ConvNextChannelsFirstLayerNorm,
    ConvNextEmbeddings,
    ConvNextEncoder,
)
from ..luke.modeling_luke import _Container
from .configuration_upernet import UperNetConfig


@dataclass
class SemanticSegmenterOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


def _axis_weights(in_size, out_size):
    """torch F.interpolate(bilinear, align_corners=False) gather plan —
    torch never anti-aliases, unlike jax.image.resize on downsample."""
    src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = np.clip(src - np.floor(src), 0.0, 1.0)
    frac = np.where(src < 0, 0.0, frac)
    return lo, hi, frac.astype(np.float32)


def _bilinear(x, size):
    h_out, w_out = int(size[0]), int(size[1])
    b, c, h, w = x.shape
    if (h, w) == (h_out, w_out):
        return x
    xf = x.astype(jnp.float32)
    ylo, yhi, yf = _axis_weights(h, h_out)
    top, bot = xf[:, :, ylo], xf[:, :, yhi]
    xf = top + (bot - top) * jnp.asarray(yf)[None, None, :, None]
    xlo, xhi, xfr = _axis_weights(w, w_out)
    left, right = xf[:, :, :, xlo], xf[:, :, :, xhi]
    out = left + (right - left) * jnp.asarray(xfr)[None, None, None, :]
    return out.astype(x.dtype)


def _adaptive_avg_pool(x, out_size):
    """torch AdaptiveAvgPool2d semantics (floor/ceil bin edges)."""
    b, c, h, w = x.shape
    rows = []
    for i in range(out_size):
        h0, h1 = (i * h) // out_size, -(-((i + 1) * h) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * w) // out_size, -(-((j + 1) * w) // out_size)
            cols.append(x[:, :, h0:h1, w0:w1].mean(axis=(2, 3)))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)  # [B, C, out, out]


class UperNetConvModule(Module):
    def __init__(self, in_ch, out_ch, kernel_size, padding=0, dilation=1,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv = Conv(in_ch, out_ch, kernel_size, padding=padding,
                         dilation=dilation, use_bias=False, ndim=2, **kw)
        self.batch_norm = BatchNorm(out_ch, 1e-5, **kw)

    def __call__(self, params, x):
        return jax.nn.relu(self.batch_norm(params["batch_norm"],
                                           self.conv(params["conv"], x)))


class UperNetHead(Module):
    def __init__(self, config, in_channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ch = config.hidden_size
        self.config = config
        self.in_channels = in_channels
        self.pool_scales = config.pool_scales
        self.classifier = Conv(ch, config.num_labels, 1, ndim=2, **kw)
        # psp blocks: each = [AdaptiveAvgPool (no params), ConvModule] named 0/1
        psp = {}
        for i in range(len(config.pool_scales)):
            psp[str(i)] = _Container(
                {"1": UperNetConvModule(in_channels[-1], ch, 1, **kw)}, **kw)
        self.psp_modules = _Container(psp, **kw)
        self.bottleneck = UperNetConvModule(
            in_channels[-1] + len(config.pool_scales) * ch, ch, 3, padding=1, **kw)
        self.lateral_convs = [UperNetConvModule(c, ch, 1, **kw)
                              for c in in_channels[:-1]]
        self.fpn_convs = [UperNetConvModule(ch, ch, 3, padding=1, **kw)
                          for _ in in_channels[:-1]]
        self.fpn_bottleneck = UperNetConvModule(
            len(in_channels) * ch, ch, 3, padding=1, **kw)

    def _psp(self, params, x):
        outs = [x]
        for i, scale in enumerate(self.pool_scales):
            pooled = _adaptive_avg_pool(x, scale)
            block = self.psp_modules._children[str(i)]._children["1"]
            h = block(params["psp_modules"][str(i)]["1"], pooled)
            outs.append(_bilinear(h, x.shape[2:]))
        return self.bottleneck(params["bottleneck"],
                               jnp.concatenate(outs, axis=1))

    def __call__(self, params, features):
        laterals = [conv(params["lateral_convs"][str(i)], features[i])
                    for i, conv in enumerate(self.lateral_convs)]
        laterals.append(self._psp(params, features[-1]))
        n = len(laterals)
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _bilinear(
                laterals[i], laterals[i - 1].shape[2:])
        fpn_outs = [self.fpn_convs[i](params["fpn_convs"][str(i)], laterals[i])
                    for i in range(n - 1)]
        fpn_outs.append(laterals[-1])
        for i in range(n - 1, 0, -1):
            fpn_outs[i] = _bilinear(fpn_outs[i], fpn_outs[0].shape[2:])
        out = self.fpn_bottleneck(params["fpn_bottleneck"],
                                  jnp.concatenate(fpn_outs, axis=1))
        return self.classifier(params["classifier"], out)


class UperNetFCNHead(Module):
    def __init__(self, config, in_channels, in_index=2, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.in_index = in_index
        self.concat_input = config.auxiliary_concat_input
        src = (in_channels[in_index] if config.auxiliary_in_channels is None
               else config.auxiliary_in_channels)
        ch = config.auxiliary_channels
        convs = [UperNetConvModule(src, ch, 3, padding=1, **kw)]
        for _ in range(config.auxiliary_num_convs - 1):
            convs.append(UperNetConvModule(ch, ch, 3, padding=1, **kw))
        self.convs = convs
        if self.concat_input:
            self.conv_cat = UperNetConvModule(src + ch, ch, 3, padding=1, **kw)
        self.classifier = Conv(ch, config.num_labels, 1, ndim=2, **kw)

    def __call__(self, params, features):
        x = features[self.in_index]
        h = x
        for i, conv in enumerate(self.convs):
            h = conv(params["convs"][str(i)], h)
        if self.concat_input:
            h = self.conv_cat(params["conv_cat"],
                              jnp.concatenate([x, h], axis=1))
        return self.classifier(params["classifier"], h)


class _ConvNextBackbone(Module):
    """ConvNextBackbone analog: stem + stages, per-out-feature
    channels-first LayerNorms (reference ConvNextBackbone)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = ConvNextEmbeddings(config, **kw)
        self.encoder = ConvNextEncoder(config, **kw)
        self.stage_names = ["stem"] + [f"stage{i}" for i in
                                       range(1, len(config.depths) + 1)]
        self.out_features = config.out_features
        sizes = [config.hidden_sizes[0]] + list(config.hidden_sizes)
        norms = {}
        self.channels = []
        for name, size in zip(self.stage_names, sizes):
            if name in self.out_features:
                norms[name] = ConvNextChannelsFirstLayerNorm(size, 1e-6, **kw)
                self.channels.append(size)
        self.hidden_states_norms = _Container(norms, **kw)

    def __call__(self, params, pixel_values):
        x = self.embeddings(params["embeddings"], pixel_values)
        _, hidden_states = self.encoder(params["encoder"], x)
        feats = []
        for name, h in zip(self.stage_names, hidden_states):
            if name in self.out_features:
                norm = self.hidden_states_norms._children[name]
                feats.append(norm(params["hidden_states_norms"][name], h))
        return feats


class UperNetPreTrainedModel(PreTrainedModel):
    config_class = UperNetConfig
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)


class UperNetForSemanticSegmentation(UperNetPreTrainedModel):
    def __init__(self, config: UperNetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if config.backbone_config.model_type not in ("convnext", "convnextv2", ""):
            raise NotImplementedError(
                f"UperNet backbone {config.backbone_config.model_type!r} not "
                "wired yet (convnext supported)")
        self.backbone = _ConvNextBackbone(config.backbone_config, **kw)
        self.decode_head = UperNetHead(config, self.backbone.channels, **kw)
        self.auxiliary_head = (UperNetFCNHead(config, self.backbone.channels, **kw)
                               if config.use_auxiliary_head else None)

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> SemanticSegmenterOutput:
        px = jnp.asarray(pixel_values, self.dtype)
        feats = self.backbone(params["backbone"], px)
        logits = self.decode_head(params["decode_head"], feats)
        logits = _bilinear(logits, px.shape[2:])
        loss = None
        if labels is not None:
            aux = None
            if self.auxiliary_head is not None:
                aux = _bilinear(self.auxiliary_head(params["auxiliary_head"],
                                                    feats), px.shape[2:])
            valid = labels != self.config.loss_ignore_index
            safe = jnp.where(valid, labels, 0)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
            loss = jnp.sum(jnp.where(valid, nll, 0)) / jnp.maximum(valid.sum(), 1)
            if aux is not None:
                logp_a = jax.nn.log_softmax(aux.astype(jnp.float32), axis=1)
                nll_a = -jnp.take_along_axis(logp_a, safe[:, None], axis=1)[:, 0]
                loss = loss + self.config.auxiliary_loss_weight * (
                    jnp.sum(jnp.where(valid, nll_a, 0))
                    / jnp.maximum(valid.sum(), 1))
        return SemanticSegmenterOutput(loss=loss, logits=logits)
