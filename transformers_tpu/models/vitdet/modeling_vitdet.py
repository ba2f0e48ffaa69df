"""VitDet backbone (reference models/vitdet/modeling_vitdet.py): plain-ViT
detection backbone — conv patch embed with interpolated absolute positions,
per-layer optional window partitioning + decomposed rel-pos attention (the
SAM/MViTv2 form), optional conv bottleneck residual blocks, channels-first
feature-map output."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_vitdet import VitDetConfig


@dataclass
class VitDetModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    feature_maps: Optional[tuple] = None


class _ChannelsFirstLN(Module):
    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim

    def init(self, rng):
        return {"weight": jnp.ones((self.dim,), self.param_dtype),
                "bias": jnp.zeros((self.dim,), self.param_dtype)}

    def __call__(self, params, x):  # [B, C, H, W]
        h = x.astype(jnp.float32)
        mean = h.mean(axis=1, keepdims=True)
        var = ((h - mean) ** 2).mean(axis=1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-6)
        h = h * params["weight"].astype(jnp.float32)[None, :, None, None]
        h = h + params["bias"].astype(jnp.float32)[None, :, None, None]
        return h.astype(x.dtype)


class VitDetAttention(Module):
    """qkv + decomposed rel-pos (reference VitDetAttention; SAM form)."""

    def __init__(self, config, input_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.input_size = input_size
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim ** -0.5
        self.use_rel_pos = config.use_relative_position_embeddings
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, 3 * config.hidden_size,
                          config.qkv_bias, **kw)
        self.proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_rel_pos:
            h, w = self.input_size
            params["rel_pos_h"] = jnp.zeros((2 * h - 1, self.head_dim), self.param_dtype)
            params["rel_pos_w"] = jnp.zeros((2 * w - 1, self.head_dim), self.param_dtype)
        return params

    @staticmethod
    def _rel_index(size):
        coords = np.arange(size)
        return (coords[:, None] - coords[None, :]) + size - 1

    def __call__(self, params, hidden):  # [B, H, W, C]
        b, h, w, c = hidden.shape
        qkv = self.qkv(params["qkv"], hidden.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        if self.use_rel_pos:
            rel_h = jnp.take(params["rel_pos_h"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(h)), axis=0)
            rel_w = jnp.take(params["rel_pos_w"].astype(jnp.float32),
                             jnp.asarray(self._rel_index(w)), axis=0)
            qr = q.astype(jnp.float32).reshape(b, h, w, self.num_heads, self.head_dim)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qr, rel_h)
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qr, rel_w)
            bias = bias_h[..., :, None] + bias_w[..., None, :]
            scores = scores + bias.reshape(b, self.num_heads, h * w, h * w)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, h, w, c)
        return self.proj(params["proj"], out)


class VitDetResBottleneckBlock(Module):
    def __init__(self, config, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        mid = dim // 2
        self.conv1 = Conv(dim, mid, 1, use_bias=False, ndim=2, **kw)
        self.norm1 = _ChannelsFirstLN(mid, **kw)
        self.conv2 = Conv(mid, mid, 3, padding=1, use_bias=False, ndim=2, **kw)
        self.norm2 = _ChannelsFirstLN(mid, **kw)
        self.conv3 = Conv(mid, dim, 1, use_bias=False, ndim=2, **kw)
        self.norm3 = _ChannelsFirstLN(dim, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):  # [B, C, H, W]
        out = self.act(self.norm1(params["norm1"], self.conv1(params["conv1"], x)))
        out = self.act(self.norm2(params["norm2"], self.conv2(params["conv2"], out)))
        out = self.norm3(params["norm3"], self.conv3(params["conv3"], out))
        return x + out


class VitDetLayer(Module):
    def __init__(self, config, window_size, use_residual_block, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        dim = config.hidden_size
        grid = config.image_size // config.patch_size
        size = (grid, grid) if window_size == 0 else (window_size, window_size)
        self.norm1 = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.attention = VitDetAttention(config, size, **kw)
        self.norm2 = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.mlp = _Mlp(dim, int(dim * config.mlp_ratio), config.hidden_act, **kw)
        self.window_size = window_size
        self.use_residual_block = use_residual_block
        if use_residual_block:
            self.residual = VitDetResBottleneckBlock(config, dim, **kw)

    def __call__(self, params, x):  # [B, C, H, W]
        h = x.transpose(0, 2, 3, 1)  # [B, H, W, C]
        shortcut = h
        h = self.norm1(params["norm1"], h)
        if self.window_size > 0:
            b, hh, ww, c = h.shape
            ws = self.window_size
            pad_h = (ws - hh % ws) % ws
            pad_w = (ws - ww % ws) % ws
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            ph, pw = hh + pad_h, ww + pad_w
            h = h.reshape(b, ph // ws, ws, pw // ws, ws, c)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
        h = self.attention(params["attention"], h)
        if self.window_size > 0:
            ws = self.window_size
            h = h.reshape(b, ph // ws, pw // ws, ws, ws, c)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
            h = h[:, :hh, :ww]
        h = shortcut + h
        h = h + self.mlp(params["mlp"], self.norm2(params["norm2"], h))
        h = h.transpose(0, 3, 1, 2)  # [B, C, H, W]
        if self.use_residual_block:
            h = self.residual(params["residual"], h)
        return h


class _Mlp(Module):
    def __init__(self, dim, inter, act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.fc1 = Linear(dim, inter, True, **kw)
        self.fc2 = Linear(inter, dim, True, **kw)
        self.act = get_activation(act)

    def __call__(self, params, h):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))


class VitDetPreTrainedModel(PreTrainedModel):
    config_class = VitDetConfig
    base_model_prefix = "vitdet"
    main_input_name = "pixel_values"


class VitDetModel(VitDetPreTrainedModel):
    def __init__(self, config: VitDetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.config = config
        from ..luke.modeling_luke import _Container
        from ...core.module import ModuleList

        self._proj = Conv(config.num_channels, config.hidden_size,
                          config.patch_size, stride=config.patch_size, ndim=2, **kw)
        self._children.pop("_proj", None)
        self.embeddings = _Container({"projection": self._proj}, **kw)
        self._layers = [VitDetLayer(
            config, config.window_size if i in config.window_block_indices else 0,
            i in config.residual_block_indices, **kw)
            for i in range(config.num_hidden_layers)]
        self._children.pop("_layers", None)
        self.encoder = _Container({"layer": ModuleList(self._layers)}, **kw)
        self._pretrain_grid = config.pretrain_image_size // config.patch_size

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_absolute_position_embeddings:
            n = self._pretrain_grid ** 2 + 1
            params["embeddings"]["position_embeddings"] = jnp.zeros(
                (1, n, self.config.hidden_size), self.param_dtype)
        return params

    def _abs_pos(self, params, h, w):
        pe = params["embeddings"]["position_embeddings"].astype(jnp.float32)
        pe = pe[:, 1:]  # drop cls slot
        size = int(math.sqrt(pe.shape[1]))
        pe = pe.reshape(1, size, size, -1)
        if size != h or size != w:
            pe = jax.image.resize(pe, (1, h, w, pe.shape[-1]), method="bicubic")
        return pe

    def __call__(self, params, pixel_values=None, **kwargs) -> VitDetModelOutput:
        x = self._proj(params["embeddings"]["projection"],
                       jnp.asarray(pixel_values, self.dtype))  # [B, C, H, W]
        if self.config.use_absolute_position_embeddings:
            b, c, h, w = x.shape
            pe = self._abs_pos(params, h, w).astype(x.dtype)
            x = x + pe.transpose(0, 3, 1, 2)
        feature_maps = []
        for i, layer in enumerate(self._layers):
            x = layer(params["encoder"]["layer"][str(i)], x)
            feature_maps.append(x)
        return VitDetModelOutput(last_hidden_state=x,
                                 feature_maps=tuple(feature_maps))


class VitDetBackbone(VitDetModel):
    pass
