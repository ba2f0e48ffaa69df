"""Hiera hierarchical ViT (reference models/hiera/modeling_hiera.py):
overlapping conv patch embed, token "unroll" so query-pool windows are
contiguous, mask-unit windowed attention with in-attention max-pool query
striding, stages that double width while pooling tokens."""

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
from .configuration_hiera import HieraConfig


@dataclass
class HieraModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None


@dataclass
class HieraForImageClassificationOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


def unroll(h, image_shape, patch_stride, schedule):
    """Reorder tokens so pooling windows are contiguous (reference unroll):
    each stride pair moves into the (virtual) batch dimension, so sequential
    max-pools and mask-unit windows are contiguous slices."""
    b, _, d = h.shape
    size = [i // s for i, s in zip(image_shape, patch_stride)]
    cur = list(size)
    h = h.reshape(b, *cur, d)
    vb = b
    for strides in schedule:
        cur = [i // s for i, s in zip(cur, strides)]
        new_shape = [vb] + [x for pair in zip(cur, strides) for x in pair] + [d]
        h = h.reshape(new_shape)
        n = len(new_shape)
        perm = [0] + list(range(2, n - 1, 2)) + list(range(1, n - 1, 2)) + [n - 1]
        h = h.transpose(perm)
        # flatten the stride dims into the batch dim
        h = h.reshape(vb * math.prod(strides), *cur, d)
        vb *= math.prod(strides)
    return h.reshape(b, -1, d)


class HieraMaskUnitAttention(Module):
    def __init__(self, hidden_size, hidden_size_output, num_heads,
                 query_stride=1, window_size=0, use_mask_unit_attn=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.query_stride = query_stride
        self.hidden_size_output = hidden_size_output
        self.head_dim = hidden_size_output // num_heads
        self.scale = self.head_dim ** -0.5
        self.window_size = window_size
        self.use_mask_unit_attn = use_mask_unit_attn
        self.qkv = Linear(hidden_size, 3 * hidden_size_output, True, **kw)
        self.proj = Linear(hidden_size_output, hidden_size_output, True, **kw)

    def __call__(self, params, h):
        b, s, _ = h.shape
        num_windows = 1
        if self.use_mask_unit_attn:
            num_windows = s // (self.query_stride * self.window_size)
        qkv = self.qkv(params["qkv"], h)
        qkv = qkv.reshape(b, -1, num_windows, 3, self.num_heads, self.head_dim)
        qkv = qkv.transpose(3, 0, 4, 2, 1, 5)  # [3, B, H, W, S', D]
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.query_stride > 1:
            q = q.reshape(b, self.num_heads, num_windows, self.query_stride,
                          -1, self.head_dim).max(axis=3)
        attn = jnp.einsum("bhwqd,bhwkd->bhwqk", q * self.scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwqk,bhwkd->bhwqd", attn, v)
        # torch: transpose(1, 3) then reshape -> [B, S'*W, D_out]
        out = out.transpose(0, 3, 2, 1, 4).reshape(b, -1, self.hidden_size_output)
        return self.proj(params["proj"], out)


class HieraLayer(Module):
    def __init__(self, config, hidden_size, hidden_size_output, num_heads,
                 query_stride=1, window_size=0, use_mask_unit_attn=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden_size = hidden_size
        self.hidden_size_output = hidden_size_output
        self.query_stride = query_stride
        self.layernorm_before = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.attn = HieraMaskUnitAttention(
            hidden_size, hidden_size_output, num_heads, query_stride,
            window_size, use_mask_unit_attn, **kw)
        self.layernorm_after = LayerNorm(hidden_size_output, config.layer_norm_eps, **kw)
        inter = int(hidden_size_output * config.mlp_ratio)
        self.mlp = _Mlp(hidden_size_output, inter, config.hidden_act, **kw)
        if hidden_size != hidden_size_output:
            self.proj = Linear(hidden_size, hidden_size_output, True, **kw)

    def __call__(self, params, h):
        b, s, _ = h.shape
        h_norm = self.layernorm_before(params["layernorm_before"], h)
        if self.hidden_size != self.hidden_size_output:
            h = self.proj(params["proj"], h_norm)
            h = h.reshape(b, self.query_stride, -1,
                          self.hidden_size_output).max(axis=1)
        attn_out = self.attn(params["attn"], h_norm)
        h = h + attn_out
        residual = h
        h = self.layernorm_after(params["layernorm_after"], h)
        return residual + self.mlp(params["mlp"], h)


class _Mlp(Module):
    def __init__(self, dim, inter, act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(dim, inter, True, **kw)
        self.fc2 = Linear(inter, dim, True, **kw)
        self.act = get_activation(act)

    def __call__(self, params, h):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))


class HieraStage(Module):
    def __init__(self, config, depth, hidden_size, hidden_size_output,
                 num_heads, query_stride, window_size, use_mask_unit_attn,
                 stage_num=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        prev_mask = False
        if stage_num is not None:
            prev_mask = config.masked_unit_attention[
                stage_num - 1 if stage_num > 0 else 0]
        self.layers = [HieraLayer(
            config, hidden_size if i == 0 else hidden_size_output,
            hidden_size_output, num_heads, query_stride[i], window_size,
            use_mask_unit_attn or (prev_mask and i == 0),
            dtype=dtype, param_dtype=param_dtype) for i in range(depth)]

    def __call__(self, params, h):
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h)
        return h


class HieraPreTrainedModel(PreTrainedModel):
    config_class = HieraConfig
    base_model_prefix = "hiera"
    main_input_name = "pixel_values"


class HieraModel(HieraPreTrainedModel):
    def __init__(self, config: HieraConfig, *, dtype=jnp.float32,
                 param_dtype=None, add_pooling_layer: bool = True):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.config = config
        self.num_features = int(config.embed_dim
                                * config.embed_dim_multiplier ** (len(config.depths) - 1))
        self._patch_conv = Conv(config.num_channels, config.embed_dim,
                                tuple(config.patch_size),
                                stride=tuple(config.patch_stride),
                                padding=tuple(config.patch_padding), ndim=2, **kw)
        tokens_shape = [i // s for i, s in zip(config.image_size, config.patch_stride)]
        self.num_tokens = math.prod(tokens_shape)
        from ..luke.modeling_luke import _Container

        self.embeddings = _Container(
            {"patch_embeddings": _Container({"projection": self._patch_conv}, **kw)},
            **kw)

        total = sum(config.depths)
        cum = np.cumsum(config.depths).tolist()
        pool_layers = cum[: config.num_query_pool]
        query_strides = [math.prod(config.query_stride) if i in pool_layers else 1
                         for i in range(total)]
        stage_ends = [0] + cum
        mu_area = math.prod(config.masked_unit_size)
        qs_area = math.prod(config.query_stride)
        stages = []
        hidden = config.embed_dim
        for si, depth in enumerate(config.depths):
            out = int(config.embed_dim * config.embed_dim_multiplier ** si)
            stages.append(HieraStage(
                config, depth, hidden, out, config.num_heads[si],
                query_strides[stage_ends[si]:stage_ends[si + 1]],
                int(mu_area * qs_area ** -si),
                config.masked_unit_attention[si], stage_num=si, **kw))
            hidden = out
        from ...core.module import ModuleList

        self.encoder = _Container({"stages": ModuleList(stages)}, **kw)
        self._stages = stages
        # drop the helper-attribute registrations; only the checkpoint-tree
        # containers own the params
        for name in ("_patch_conv", "_stages"):
            self._children.pop(name, None)
        self.unroll_schedule = [config.query_stride] * len(config.depths[:-1])
        self.pooler_norm = (LayerNorm(self.num_features, config.layer_norm_eps, **kw)
                            if add_pooling_layer else None)
        self._children.pop("pooler_norm", None)
        if self.pooler_norm is not None:
            self._children["pooler"] = _Container(
                {"layernorm": self.pooler_norm}, **kw)

    def init(self, rng):
        params = super().init(rng)
        k = jax.random.fold_in(rng, 7)
        params["embeddings"]["position_embeddings"] = jnp.zeros(
            (1, self.num_tokens, self.config.embed_dim), self.param_dtype)
        return params

    def __call__(self, params, pixel_values=None, **kwargs) -> HieraModelOutput:
        x = pixel_values.astype(self.dtype)
        h = self._patch_conv(
            params["embeddings"]["patch_embeddings"]["projection"], x)
        b, d = h.shape[0], h.shape[1]
        h = h.reshape(b, d, -1).transpose(0, 2, 1)  # [B, S, D]
        h = h + params["embeddings"]["position_embeddings"].astype(h.dtype)
        image_shape = (x.shape[-2], x.shape[-1])
        h = unroll(h, image_shape, self.config.patch_stride, self.unroll_schedule)
        for i, stage in enumerate(self._stages):
            h = stage(params["encoder"]["stages"][str(i)], h)
        pooled = None
        if self.pooler_norm is not None:
            pooled = self.pooler_norm(params["pooler"]["layernorm"],
                                      h.mean(axis=1))
        return HieraModelOutput(last_hidden_state=h, pooler_output=pooled)


class HieraForImageClassification(HieraPreTrainedModel):
    def __init__(self, config: HieraConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.hiera = HieraModel(config, dtype=self.dtype,
                                param_dtype=self.param_dtype)
        n = getattr(config, "num_labels", 2)
        self.classifier = (Linear(self.hiera.num_features, n, True, **kw)
                           if n > 0 else None)

    def __call__(self, params, pixel_values=None, labels=None,
                 **kwargs) -> HieraForImageClassificationOutput:
        out = self.hiera(params["hiera"], pixel_values=pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return HieraForImageClassificationOutput(loss=loss, logits=logits)
