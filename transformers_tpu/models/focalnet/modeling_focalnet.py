"""FocalNet (reference models/focalnet/modeling_focalnet.py): attention-free
hierarchical backbone — each block replaces self-attention with focal
modulation (stacked depthwise convs of growing kernel + gated aggregation +
global context), with Swin-style patch-merging downsamples between stages."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_focalnet import FocalNetConfig


@dataclass
class FocalNetModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


@dataclass
class FocalNetImageClassifierOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


class FocalNetPatchEmbeddings(Module):
    def __init__(self, config, patch_size, num_channels, embed_dim,
                 add_norm=False, is_stem=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.patch_size = (patch_size if isinstance(patch_size, (tuple, list))
                           else (patch_size, patch_size))
        if config.use_conv_embed:
            k, p, s = (7, 2, 4) if is_stem else (3, 1, 2)
            self.projection = Conv(num_channels, embed_dim, k, stride=s,
                                   padding=p, ndim=2, **kw)
        else:
            self.projection = Conv(num_channels, embed_dim, self.patch_size,
                                   stride=self.patch_size, ndim=2, **kw)
        self.norm = (LayerNorm(embed_dim, config.layer_norm_eps, **kw)
                     if add_norm else None)

    def __call__(self, params, pixel_values):
        ph, pw = self.patch_size
        pad_h = (ph - pixel_values.shape[2] % ph) % ph
        pad_w = (pw - pixel_values.shape[3] % pw) % pw
        if pad_h or pad_w:
            pixel_values = jnp.pad(pixel_values,
                                   [(0, 0), (0, 0), (0, pad_h), (0, pad_w)])
        h = self.projection(params["projection"], pixel_values)
        hh, ww = h.shape[2], h.shape[3]
        h = h.reshape(h.shape[0], h.shape[1], -1).transpose(0, 2, 1)
        if self.norm is not None:
            h = self.norm(params["norm"], h)
        return h, (hh, ww)


class FocalNetModulation(Module):
    def __init__(self, config, index, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dim = dim
        self.focal_level = config.focal_levels[index]
        self.use_post_ln = config.use_post_layernorm_in_modulation
        self.normalize_modulator = config.normalize_modulator
        self.projection_in = Linear(dim, 2 * dim + self.focal_level + 1, True, **lkw)
        self.projection_context = Conv(dim, dim, 1, ndim=2, **kw)
        self.projection_out = Linear(dim, dim, True, **lkw)
        focal_window = config.focal_windows[index]
        layers = []
        for k in range(self.focal_level):
            ks = 2 * k + focal_window
            layers.append(_Container({"0": Conv(dim, dim, ks, padding=ks // 2,
                                                groups=dim, use_bias=False,
                                                ndim=2, **kw)}, **kw))
        self.focal_layers = layers
        if self.use_post_ln:
            self.layernorm = LayerNorm(dim, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden):  # [B, H, W, C]
        c = hidden.shape[-1]
        x = self.projection_in(params["projection_in"], hidden)
        x = x.transpose(0, 3, 1, 2)
        q, ctx, gates = x[:, :c], x[:, c:2 * c], x[:, 2 * c:]
        ctx_all = 0.0
        for level, layer in enumerate(self.focal_layers):
            conv = layer._children["0"]
            ctx = jax.nn.gelu(conv(params["focal_layers"][str(level)]["0"], ctx),
                              approximate=False)
            ctx_all = ctx_all + ctx * gates[:, level:level + 1]
        ctx_global = jax.nn.gelu(ctx.mean(axis=(2, 3), keepdims=True),
                                 approximate=False)
        ctx_all = ctx_all + ctx_global * gates[:, self.focal_level:]
        if self.normalize_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)
        modulator = self.projection_context(params["projection_context"], ctx_all)
        out = (q * modulator).transpose(0, 2, 3, 1)
        if self.use_post_ln:
            out = self.layernorm(params["layernorm"], out)
        return self.projection_out(params["projection_out"], out)


class FocalNetLayer(Module):
    def __init__(self, config, index, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.dim = dim
        self.use_post_layernorm = config.use_post_layernorm
        self.use_layerscale = config.use_layerscale
        self.layerscale_value = config.layerscale_value
        self.norm1 = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.modulation = FocalNetModulation(config, index, dim, **kw)
        self.norm2 = LayerNorm(dim, config.layer_norm_eps, **kw)
        inter = int(dim * config.mlp_ratio)
        self.mlp = _Container({"fc1": Linear(dim, inter, True, **lkw),
                               "fc2": Linear(inter, dim, True, **lkw)}, **kw)
        self.act = get_activation(config.hidden_act)

    def init(self, rng):
        params = super().init(rng)
        if self.use_layerscale:
            params["gamma_1"] = jnp.full((self.dim,), self.layerscale_value,
                                         self.param_dtype)
            params["gamma_2"] = jnp.full((self.dim,), self.layerscale_value,
                                         self.param_dtype)
        return params

    def _mlp(self, params, x):
        mods = self.mlp._children
        return mods["fc2"](params["fc2"],
                           self.act(mods["fc1"](params["fc1"], x)))

    def __call__(self, params, hidden, hw):
        h, w = hw
        b, _, c = hidden.shape
        shortcut = hidden
        x = hidden if self.use_post_layernorm else self.norm1(params["norm1"], hidden)
        x = x.reshape(b, h, w, c)
        x = self.modulation(params["modulation"], x).reshape(b, h * w, c)
        if self.use_post_layernorm:
            x = self.norm1(params["norm1"], x)
        g1 = params.get("gamma_1", 1.0)
        g2 = params.get("gamma_2", 1.0)
        hidden = shortcut + g1 * x
        if self.use_post_layernorm:
            m = self.norm2(params["norm2"], self._mlp(params["mlp"], hidden))
        else:
            m = self._mlp(params["mlp"], self.norm2(params["norm2"], hidden))
        return hidden + g2 * m


class FocalNetStage(Module):
    def __init__(self, config, index, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        n = len(config.depths)
        dims = [config.embed_dim * (2 ** i) for i in range(n)]
        dim = dims[index]
        self.layers = [FocalNetLayer(config, index, dim, **kw)
                       for _ in range(config.depths[index])]
        if index < n - 1:
            self.downsample = FocalNetPatchEmbeddings(
                config, 2, dim, dims[index + 1], add_norm=True, **kw)
        else:
            self.downsample = None

    def __call__(self, params, hidden, hw):
        h, w = hw
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, hw)
        before = hidden
        if self.downsample is not None:
            b = hidden.shape[0]
            fmap = hidden.transpose(0, 2, 1).reshape(b, -1, h, w)
            hidden, (nh, nw) = self.downsample(params["downsample"], fmap)
            return hidden, before, (nh, nw)
        return hidden, before, hw


class FocalNetEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.stages = [FocalNetStage(config, i, dtype=dtype, param_dtype=param_dtype)
                       for i in range(len(config.depths))]

    def __call__(self, params, hidden, hw):
        all_hidden = [hidden]
        for i, stage in enumerate(self.stages):
            hidden, before, hw = stage(params["stages"][str(i)], hidden, hw)
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class FocalNetPreTrainedModel(PreTrainedModel):
    config_class = FocalNetConfig
    base_model_prefix = "focalnet"
    main_input_name = "pixel_values"


class _FocalNetCore(Module):
    def __init__(self, config, use_mask_token=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.use_mask_token = use_mask_token
        num_stages = len(config.depths)
        self.num_features = int(config.embed_dim * 2 ** (num_stages - 1))
        self.embeddings = _FocalNetEmbeddings(config, use_mask_token, **kw)
        self.encoder = FocalNetEncoder(config, **kw)
        self.layernorm = LayerNorm(self.num_features, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        emb, hw = self.embeddings(params["embeddings"], pixel_values,
                                  bool_masked_pos)
        hidden, all_hidden = self.encoder(params["encoder"], emb, hw)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = hidden.mean(axis=1)
        return hidden, pooled, all_hidden


class _FocalNetEmbeddings(Module):
    def __init__(self, config, use_mask_token, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.use_mask_token = use_mask_token
        self.patch_embeddings = FocalNetPatchEmbeddings(
            config, config.patch_size, config.num_channels, config.embed_dim,
            is_stem=True, **kw)
        self.norm = LayerNorm(config.embed_dim, config.layer_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_mask_token:
            params["mask_token"] = jnp.zeros((1, 1, self.config.embed_dim),
                                             self.param_dtype)
        return params

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        emb, hw = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        emb = self.norm(params["norm"], emb)
        if bool_masked_pos is not None:
            mask = jnp.asarray(bool_masked_pos)[..., None].astype(emb.dtype)
            emb = emb * (1.0 - mask) + params["mask_token"].astype(emb.dtype) * mask
        return emb, hw


class FocalNetModel(FocalNetPreTrainedModel):
    def __init__(self, config: FocalNetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        core = _FocalNetCore(config, **kw)
        self.embeddings = core._children["embeddings"]
        self.encoder = core._children["encoder"]
        self.layernorm = core._children["layernorm"]
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, pixel_values=None, bool_masked_pos=None,
                 **kwargs) -> FocalNetModelOutput:
        hidden, pooled, all_hidden = self._core(
            params, jnp.asarray(pixel_values, self.dtype), bool_masked_pos)
        return FocalNetModelOutput(last_hidden_state=hidden,
                                   pooler_output=pooled,
                                   hidden_states=all_hidden)


class FocalNetForImageClassification(FocalNetPreTrainedModel):
    def __init__(self, config: FocalNetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.focalnet = _FocalNetCore(config, **kw)
        self.classifier = Linear(self.focalnet.num_features, config.num_labels,
                                 True, kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> FocalNetImageClassifierOutput:
        _, pooled, all_hidden = self.focalnet(
            params["focalnet"], jnp.asarray(pixel_values, self.dtype))
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, jnp.asarray(labels)[:, None], axis=-1)
            loss = nll.mean()
        return FocalNetImageClassifierOutput(loss=loss, logits=logits,
                                             hidden_states=all_hidden)
