"""VideoMAE video encoder, TPU-native.

Semantics match the hub checkpoint layout (torch
models/videomae/modeling_videomae.py): tubelet Conv3d patch embeddings with a
FIXED (non-learned, recomputed) sinusoid position table (:80-125), ViT-style
pre-norm blocks where q/v carry separate learned biases and k has none
(legacy ``attention.attention.{q,v}_bias``), optional final layernorm, and the
mean-pool + fc_norm + classifier video head (:688-689).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, ImageClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import eager_attention
from .configuration_videomae import VideoMAEConfig


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sin/cos table (reference :80-91) — a buffer, never in checkpoints."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


class VideoMAEPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        t, p = config.tubelet_size, config.patch_size
        self.projection = Conv(config.num_channels, config.hidden_size, (t, p, p),
                               stride=(t, p, p), padding=0, use_bias=True, ndim=3,
                               dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):  # [B, T, C, H, W]
        x = jnp.transpose(pixel_values, (0, 2, 1, 3, 4))  # [B, C, T, H, W]
        x = self.projection(params["projection"], x.astype(self.dtype))
        b, c = x.shape[:2]
        return x.reshape(b, c, -1).transpose(0, 2, 1)  # [B, N, C]


class VideoMAEEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.patch_embeddings = VideoMAEPatchEmbeddings(config, dtype=dtype, param_dtype=param_dtype)
        n = ((config.image_size // config.patch_size) ** 2
             * (config.num_frames // config.tubelet_size))
        self.pos_table = sinusoid_table(n, config.hidden_size)

    def __call__(self, params, pixel_values):
        x = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        return x + jnp.asarray(self.pos_table, x.dtype)


class VideoMAESelfAttention(Module):
    """Legacy layout: bias-free q/k/v Linears + learned q_bias/v_bias, k
    bias-free (hub checkpoints)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.qkv_bias = config.qkv_bias
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.qkv_bias:
            params["q_bias"] = jnp.zeros((self.config.hidden_size,), self.param_dtype)
            params["v_bias"] = jnp.zeros((self.config.hidden_size,), self.param_dtype)
        return params

    def __call__(self, params, x):
        b, n, c = x.shape
        q = self.query(params["query"], x)
        k = self.key(params["key"], x)
        v = self.value(params["value"], x)
        if self.qkv_bias:
            q = q + params["q_bias"].astype(q.dtype)
            v = v + params["v_bias"].astype(v.dtype)
        shape = (b, n, self.num_heads, self.head_dim)
        out = eager_attention(q.reshape(shape), k.reshape(shape), v.reshape(shape),
                              scale=self.head_dim**-0.5, is_causal=False)
        return out.reshape(b, n, c)


class VideoMAELayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        attn = Module(**kw)
        attn._children["attention"] = VideoMAESelfAttention(config, **kw)
        out = Module(**kw)
        out._children["dense"] = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        attn._children["output"] = out
        self.attention = attn
        inter = Module(**kw)
        inter._children["dense"] = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
        self.intermediate = inter
        outp = Module(**kw)
        outp._children["dense"] = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
        self.output = outp
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        h = self.attention._children["attention"](
            params["attention"]["attention"], self.layernorm_before(params["layernorm_before"], x))
        h = self.attention._children["output"]._children["dense"](
            params["attention"]["output"]["dense"], h)
        x = x + h
        h = self.layernorm_after(params["layernorm_after"], x)
        h = self.intermediate._children["dense"](params["intermediate"]["dense"], h)
        h = self.output._children["dense"](params["output"]["dense"], self.act(h))
        return x + h


class VideoMAEEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [VideoMAELayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, x):
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][str(i)], x)
        return x


class VideoMAEPreTrainedModel(PreTrainedModel):
    config_class = VideoMAEConfig
    base_model_prefix = "videomae"
    main_input_name = "pixel_values"


class VideoMAEModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = VideoMAEEmbeddings(config, **kw)
        self.encoder = VideoMAEEncoder(config, **kw)
        if not config.use_mean_pooling:
            self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        else:
            self.layernorm = None

    def __call__(self, params, pixel_values, output_hidden_states=False):
        x = self.embeddings(params["embeddings"], pixel_values)
        x = self.encoder(params["encoder"], x)
        if self.layernorm is not None:
            x = self.layernorm(params["layernorm"], x)
        return BaseModelOutput(last_hidden_state=x)


class VideoMAEModelStandalone(VideoMAEPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.videomae = VideoMAEModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.videomae(params["videomae"], pixel_values, **kwargs)


class VideoMAEForVideoClassification(VideoMAEPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.videomae = VideoMAEModel(config, **kw)
        if config.use_mean_pooling:
            self.fc_norm = LayerNorm(config.hidden_size, **kw)
        else:
            self.fc_norm = None
        self.classifier = Linear(config.hidden_size, config.num_labels, True, **kw,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, pixel_values=None, labels=None, **kwargs) -> ImageClassifierOutput:
        out = self.videomae(params["videomae"], pixel_values)
        h = out.last_hidden_state
        if self.fc_norm is not None:
            pooled = self.fc_norm(params["fc_norm"], h.mean(axis=1))
        else:
            pooled = h[:, 0]
        logits = self.classifier(params["classifier"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return ImageClassifierOutput(loss=loss, logits=logits)
