"""DPT — Dense Prediction Transformer (reference
src/transformers/models/dpt/modeling_dpt.py).

ViT backbone (our ViT blocks, ``dpt.*`` prefix) → reassemble stage (readout
projection of the CLS token, per-stage 1x1 conv + transpose/strided-conv
resample by [4, 2, 1, 0.5]) → 3x3 convs into ``fusion_hidden_size`` →
top-down feature fusion (pre-act residual blocks, x2 bilinear
align_corners=True upsampling) → monocular depth head."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ..glpn.modeling_glpn import DepthEstimatorOutput
from ...ops.activations import get_activation
from ..vit.modeling_vit import ViTEmbeddings, ViTEncoder
from .configuration_dpt import DPTConfig


def resize_bilinear(x, out_hw, align_corners):
    """[B, C, H, W] bilinear resize matching torch interpolate semantics."""
    b, c, h, w = x.shape
    oh, ow = out_hw
    if not align_corners:
        return jax.image.resize(x, (b, c, oh, ow), method="bilinear")
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, None, :, None]
    wx = (xs - x0)[None, None, None, :]
    g00 = x[:, :, y0][:, :, :, x0]
    g01 = x[:, :, y0][:, :, :, x1]
    g10 = x[:, :, y1][:, :, :, x0]
    g11 = x[:, :, y1][:, :, :, x1]
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


class _ConvTranspose(Module):
    """torch ConvTranspose2d ([in, out, k, k] weights)."""

    def __init__(self, channels, factor, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.channels = channels
        self.factor = factor

    def init(self, rng):
        k = self.factor
        fan_in = self.channels * k * k
        bound = 1.0 / (fan_in**0.5)
        kw, kb = jax.random.split(rng)
        return {"weight": jax.random.uniform(kw, (self.channels, self.channels, k, k),
                                             self.param_dtype, -bound, bound),
                "bias": jax.random.uniform(kb, (self.channels,), self.param_dtype,
                                           -bound, bound)}

    def __call__(self, params, x):
        w = params["weight"].astype(self.dtype)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), w, strides=(self.factor, self.factor),
            padding="VALID", dimension_numbers=("NCHW", "IOHW", "NCHW"),
            transpose_kernel=True)
        return y + params["bias"].astype(self.dtype)[None, :, None, None]


class DPTReassembleLayer(Module):
    def __init__(self, config, channels, factor, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(config.hidden_size, channels, 1, **kw)
        self.factor = factor
        if factor > 1:
            self.resize = _ConvTranspose(channels, int(factor), **kw)
        elif factor < 1:
            self.resize = Conv(channels, channels, 3, stride=int(1 / factor), padding=1, **kw)
        else:
            self.resize = None

    def __call__(self, params, x):
        x = self.projection(params["projection"], x)
        if self.resize is not None:
            x = self.resize(params["resize"], x)
        return x


class DPTReassembleStage(Module):
    def __init__(self, config: DPTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [DPTReassembleLayer(config, ch, f, **kw)
                       for ch, f in zip(config.neck_hidden_sizes,
                                        config.reassemble_factors)]
        if config.readout_type == "project":
            self.readout_projects = [
                _ReadoutProject(config, **kw) for _ in config.neck_hidden_sizes]

    def __call__(self, params, hidden_states):
        out = []
        for i, hs in enumerate(hidden_states):
            cls_tok, hs = hs[:, 0], hs[:, 1:]
            b, n, c = hs.shape
            size = int(round(n**0.5))
            fmap = hs.reshape(b, size, size, c)
            if self.config.readout_type == "project":
                readout = jnp.broadcast_to(cls_tok[:, None, None, :], fmap.shape)
                fmap = self.readout_projects[i](
                    params["readout_projects"][str(i)],
                    jnp.concatenate([fmap, readout], axis=-1))
            elif self.config.readout_type == "add":
                fmap = fmap + cls_tok[:, None, None, :]
            fmap = fmap.transpose(0, 3, 1, 2)  # NCHW
            out.append(self.layers[i](params["layers"][str(i)], fmap))
        return out


class _ReadoutProject(Module):
    """Sequential(Linear, GELU) — checkpoint index "0" for the Linear."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", Linear(2 * config.hidden_size, config.hidden_size, True,
                                  dtype=dtype, param_dtype=param_dtype,
                                  kernel_init=normal_init(config.initializer_range)))
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(getattr(self, "0")(params["0"], x))


class DPTPreActResidualLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        bias = (not config.use_batch_norm_in_fusion_residual
                if config.use_bias_in_fusion_residual is None
                else config.use_bias_in_fusion_residual)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        f = config.fusion_hidden_size
        self.convolution1 = Conv(f, f, 3, padding=1, use_bias=bias, **kw)
        self.convolution2 = Conv(f, f, 3, padding=1, use_bias=bias, **kw)

    def __call__(self, params, x):
        h = jax.nn.relu(x)
        h = self.convolution1(params["convolution1"], h)
        h = jax.nn.relu(h)
        h = self.convolution2(params["convolution2"], h)
        return h + x


class DPTFeatureFusionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        f = config.fusion_hidden_size
        self.projection = Conv(f, f, 1, use_bias=True, **kw)
        self.residual_layer1 = DPTPreActResidualLayer(config, **kw)
        self.residual_layer2 = DPTPreActResidualLayer(config, **kw)

    def __call__(self, params, x, residual=None):
        if residual is not None:
            if x.shape != residual.shape:
                residual = resize_bilinear(residual, x.shape[2:], align_corners=False)
            x = x + self.residual_layer1(params["residual_layer1"], residual)
        x = self.residual_layer2(params["residual_layer2"], x)
        x = resize_bilinear(x, (x.shape[2] * 2, x.shape[3] * 2), align_corners=True)
        return self.projection(params["projection"], x)


class DPTFeatureFusionStage(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [DPTFeatureFusionLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in config.neck_hidden_sizes]

    def __call__(self, params, hidden_states):
        hidden_states = hidden_states[::-1]
        fused = None
        outs = []
        for i, hs in enumerate(hidden_states):
            p = params["layers"][str(i)]
            fused = (self.layers[i](p, hs) if fused is None
                     else self.layers[i](p, fused, hs))
            outs.append(fused)
        return outs


class DPTNeck(Module):
    def __init__(self, config: DPTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reassemble_stage = DPTReassembleStage(config, **kw)
        self.convs = [Conv(ch, config.fusion_hidden_size, 3, padding=1, use_bias=False, **kw)
                      for ch in config.neck_hidden_sizes]
        self.fusion_stage = DPTFeatureFusionStage(config, **kw)

    def __call__(self, params, hidden_states):
        feats = self.reassemble_stage(params["reassemble_stage"], hidden_states)
        feats = [conv(params["convs"][str(i)], f) for i, (conv, f) in
                 enumerate(zip(self.convs, feats))]
        return self.fusion_stage(params["fusion_stage"], feats)


class DPTDepthEstimationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        f = config.fusion_hidden_size
        self.conv1 = Conv(f, f // 2, 3, padding=1, **kw)
        self.conv2 = Conv(f // 2, 32, 3, padding=1, **kw)
        self.conv3 = Conv(32, 1, 1, **kw)
        self.head_in_index = config.head_in_index

    def init(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        # Sequential indices 0/2/4 in the checkpoint
        return {"head": {"0": self.conv1.init(k1), "2": self.conv2.init(k2),
                         "4": self.conv3.init(k3)}}

    def __call__(self, params, hidden_states):
        x = hidden_states[self.head_in_index]
        x = self.conv1(params["head"]["0"], x)
        x = resize_bilinear(x, (x.shape[2] * 2, x.shape[3] * 2), align_corners=True)
        x = jax.nn.relu(self.conv2(params["head"]["2"], x))
        x = jax.nn.relu(self.conv3(params["head"]["4"], x))
        return x[:, 0]


class DPTViT(Module):
    """ViT backbone under the ``dpt`` prefix."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ViTEmbeddings(config, **kw)
        self.encoder = ViTEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden,
                                          output_hidden_states=True)
        return hidden, all_hidden


class DPTPreTrainedModel(PreTrainedModel):
    config_class = DPTConfig
    base_model_prefix = "dpt"


class DPTForDepthEstimation(DPTPreTrainedModel):
    def __init__(self, config: DPTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.dpt = DPTViT(config, **kw)
        self.neck = DPTNeck(config, **kw)
        self.head = DPTDepthEstimationHead(config, **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        _, all_hidden = self.dpt(params["dpt"], pixel_values)
        feats = [all_hidden[i + 1] for i in self.config.backbone_out_indices]
        fused = self.neck(params["neck"], feats)
        depth = self.head(params["head"], fused)
        return DepthEstimatorOutput(predicted_depth=depth)
