"""PVT (Pyramid Vision Transformer v1), TPU-native (reference
src/transformers/models/pvt/modeling_pvt.py).

Four-stage pyramid: per-stage conv patch embeddings with learned absolute
positions (bilinearly resized to the actual grid), spatial-reduction
attention (keys/values computed on a conv-downsampled grid), pre-LN blocks,
and a CLS token only in the final stage.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..dpt.modeling_dpt import resize_bilinear
from .configuration_pvt import PvtConfig


@dataclass
class PvtModelOutput(ModelOutput):
    last_hidden_state: Any = None
    hidden_states: Any = None


class PvtPatchEmbeddings(Module):
    def __init__(self, config, image_size, patch_size, stride, num_channels,
                 hidden_size, cls_token, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (image_size // patch_size) ** 2
        self.grid = image_size // patch_size
        self.has_cls = cls_token
        self.hidden_size = hidden_size
        self.projection = Conv(num_channels, hidden_size, stride,
                               stride=patch_size, ndim=2, **kw)
        self.layer_norm = LayerNorm(hidden_size, config.layer_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        n = self.num_patches + (1 if self.has_cls else 0)
        params["position_embeddings"] = jax.random.normal(
            rng, (1, n, self.hidden_size)).astype(self.param_dtype)
        if self.has_cls:
            params["cls_token"] = jnp.zeros((1, 1, self.hidden_size),
                                            self.param_dtype)
        return params

    def _interp(self, pos, h, w):
        if (h, w) == (self.grid, self.grid):
            return pos
        grid = pos.reshape(1, self.grid, self.grid, -1).transpose(0, 3, 1, 2)
        grid = resize_bilinear(grid, (h, w), align_corners=False)
        return grid.reshape(1, -1, h * w).transpose(0, 2, 1)

    def __call__(self, params, x):
        b = x.shape[0]
        patch = self.projection(params["projection"], x)
        h, w = patch.shape[2], patch.shape[3]
        patch = patch.reshape(b, self.hidden_size, h * w).transpose(0, 2, 1)
        emb = self.layer_norm(params["layer_norm"], patch)
        pos = params["position_embeddings"].astype(emb.dtype)
        if self.has_cls:
            cls = jnp.broadcast_to(params["cls_token"].astype(emb.dtype),
                                   (b, 1, self.hidden_size))
            emb = jnp.concatenate([cls, emb], axis=1)
            pos = jnp.concatenate([pos[:, :1], self._interp(pos[:, 1:], h, w)],
                                  axis=1)
        else:
            pos = self._interp(pos, h, w)
        return emb + pos, h, w


class PvtEfficientSelfAttention(Module):
    def __init__(self, config, hidden_size, num_heads, sr_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.hidden_size = hidden_size
        self.sr = sr_ratio
        self.query = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)
        self.key = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)
        self.value = Linear(hidden_size, hidden_size, config.qkv_bias, **kw)
        if sr_ratio > 1:
            self.sequence_reduction = Conv(hidden_size, hidden_size, sr_ratio,
                                           stride=sr_ratio, ndim=2, dtype=dtype,
                                           param_dtype=param_dtype)
            self.layer_norm = LayerNorm(hidden_size, config.layer_norm_eps,
                                        dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, h, w):
        b, s, c = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads,
                                                        self.head_dim)
        kv_in = hidden
        if self.sr > 1:
            # CLS-free stages only use sr>1, so s == h*w
            grid = hidden.transpose(0, 2, 1).reshape(b, c, h, w)
            grid = self.sequence_reduction(params["sequence_reduction"], grid)
            kv_in = grid.reshape(b, c, -1).transpose(0, 2, 1)
            kv_in = self.layer_norm(params["layer_norm"], kv_in)
        skv = kv_in.shape[1]
        k = self.key(params["key"], kv_in).reshape(b, skv, self.num_heads, self.head_dim)
        v = self.value(params["value"], kv_in).reshape(b, skv, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(b, s, c)


class PvtLayer(Module):
    def __init__(self, config, hidden_size, num_heads, sr_ratio, mlp_ratio,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm_1 = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.attention = _Attn(config, hidden_size, num_heads, sr_ratio, **kw)
        self.layer_norm_2 = LayerNorm(hidden_size, config.layer_norm_eps, **kw)
        self.mlp = _FFN(config, hidden_size, int(hidden_size * mlp_ratio), **kw)

    def __call__(self, params, hidden, h, w):
        attn = self.attention(params["attention"],
                              self.layer_norm_1(params["layer_norm_1"], hidden),
                              h, w)
        hidden = hidden + attn
        mlp = self.mlp(params["mlp"], self.layer_norm_2(params["layer_norm_2"], hidden))
        return hidden + mlp


class _Attn(Module):
    def __init__(self, config, hidden_size, num_heads, sr_ratio, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", PvtEfficientSelfAttention(config, hidden_size,
                                                        num_heads, sr_ratio, **kw))
        self.output = _SelfOutput(config, hidden_size, **kw)

    def __call__(self, params, hidden, h, w):
        ctx = getattr(self, "self")(params["self"], hidden, h, w)
        return self.output(params["output"], ctx)


class _SelfOutput(Module):
    def __init__(self, config, hidden_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(hidden_size, hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class _FFN(Module):
    def __init__(self, config, din, dhidden, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense1 = Linear(din, dhidden, True, **kw)
        self.dense2 = Linear(dhidden, din, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.dense2(params["dense2"],
                           self.act(self.dense1(params["dense1"], x)))


class PvtEncoder(Module):
    def __init__(self, config: PvtConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        embeddings = []
        blocks = []
        for i in range(config.num_encoder_blocks):
            embeddings.append(PvtPatchEmbeddings(
                config,
                config.image_size if i == 0 else config.image_size // (2 ** (i + 1)),
                config.patch_sizes[i], config.strides[i],
                config.num_channels if i == 0 else config.hidden_sizes[i - 1],
                config.hidden_sizes[i],
                cls_token=(i == config.num_encoder_blocks - 1), **kw))
            blocks.append(_Stage([PvtLayer(config, config.hidden_sizes[i],
                                           config.num_attention_heads[i],
                                           config.sequence_reduction_ratios[i],
                                           config.mlp_ratios[i], **kw)
                                  for _ in range(config.depths[i])], **kw))
        self.patch_embeddings = embeddings
        self.block = blocks
        self.layer_norm = LayerNorm(config.hidden_sizes[-1],
                                    config.layer_norm_eps, **kw)

    def __call__(self, params, x, output_hidden_states=False):
        b = x.shape[0]
        all_hidden = [] if output_hidden_states else None
        n = len(self.block)
        for i, (emb, stage) in enumerate(zip(self.patch_embeddings, self.block)):
            x, h, w = emb(params["patch_embeddings"][str(i)], x)
            for j, layer in enumerate(stage.layers):
                x = layer(params["block"][str(i)][str(j)], x, h, w)
                if output_hidden_states:
                    all_hidden.append(x)
            if i != n - 1:
                x = x.reshape(b, h, w, -1).transpose(0, 3, 1, 2)
        x = self.layer_norm(params["layer_norm"], x)
        if output_hidden_states:
            all_hidden.append(x)
        return x, all_hidden


class _Stage(Module):
    """Layers registered under bare numeric names (torch ModuleList of
    ModuleLists: block.<stage>.<layer>...)."""

    def __init__(self, layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = layers
        for i, m in enumerate(layers):
            self._children[str(i)] = m
        self._children.pop("layers", None)

    def init(self, rng):
        keys = jax.random.split(rng, len(self.layers))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.layers, keys))}


class PvtModel(Module):
    def __init__(self, config: PvtConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = PvtEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        x, all_hidden = self.encoder(params["encoder"],
                                     jnp.asarray(pixel_values, self.dtype),
                                     output_hidden_states)
        return PvtModelOutput(last_hidden_state=x,
                              hidden_states=tuple(all_hidden)
                              if all_hidden is not None else None)


class PvtPreTrainedModel(PreTrainedModel):
    config_class = PvtConfig
    base_model_prefix = "pvt"
    main_input_name = "pixel_values"


class PvtModelStandalone(PvtPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.pvt = PvtModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.pvt(params["pvt"], pixel_values, **kwargs)


class PvtForImageClassification(PvtPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.pvt = PvtModel(config, **kw)
        self.classifier = Linear(config.hidden_sizes[-1], config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.pvt(params["pvt"], pixel_values)
        logits = self.classifier(params["classifier"],
                                 out.last_hidden_state[:, 0])
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
