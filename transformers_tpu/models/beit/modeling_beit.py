"""BEiT (reference src/transformers/models/beit/modeling_beit.py).

Pre-LN ViT with: learned CLS-aware relative position bias per layer (or one
shared table), LayerScale residual multipliers (``lambda_1/lambda_2``),
mean-pool + LayerNorm pooler, no absolute positions by default. The
relative-position index is precomputed on host at the training window size
(fixed-resolution path; MiDaS-style window interpolation is a follow-up)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_beit import BeitConfig


def relative_position_index(window):
    """CLS-aware relative position index (reference
    generate_relative_position_index)."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    idx = np.zeros((area + 1, area + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class BeitRelativePositionBias(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.window = (config.image_size // config.patch_size,
                       config.image_size // config.patch_size)
        self.num_heads = config.num_attention_heads
        self.num_rel = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) + 3
        self.index = relative_position_index(self.window)

    def init(self, rng):
        return {"relative_position_bias_table": jnp.zeros(
            (self.num_rel, self.num_heads), self.param_dtype)}

    def __call__(self, params):
        table = params["relative_position_bias_table"].astype(jnp.float32)
        bias = jnp.take(table, jnp.asarray(self.index.reshape(-1)), axis=0)
        n = self.index.shape[0]
        return bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)[None]  # [1,H,N,N]


class BeitSelfAttention(Module):
    def __init__(self, config, has_bias, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        # BEiT: query/value biased, key UNbiased
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)
        if has_bias:
            self.relative_position_bias = BeitRelativePositionBias(config, dtype=dtype,
                                                                   param_dtype=param_dtype)
        else:
            self.relative_position_bias = None

    def __call__(self, params, hidden, shared_bias=None):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / (self.head_dim**0.5)
        if self.relative_position_bias is not None:
            scores = scores + self.relative_position_bias(params["relative_position_bias"])
        if shared_bias is not None:
            scores = scores + shared_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
        return out.reshape(b, s, e).astype(hidden.dtype)


class BeitLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.attention = _BeitAttention(config, **kw)
        self.layernorm_before = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.intermediate = _BeitDense(config.hidden_size, config.intermediate_size, **lkw)
        self.output = _BeitDense(config.intermediate_size, config.hidden_size, **lkw)
        self.act = get_activation(config.hidden_act)
        self.use_lambda = config.layer_scale_init_value > 0
        self.hidden_size = config.hidden_size
        self.init_value = config.layer_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        if self.use_lambda:
            params["lambda_1"] = jnp.full((self.hidden_size,), self.init_value,
                                          self.param_dtype)
            params["lambda_2"] = jnp.full((self.hidden_size,), self.init_value,
                                          self.param_dtype)
        return params

    def __call__(self, params, hidden, shared_bias=None):
        h = self.attention(params["attention"],
                           self.layernorm_before(params["layernorm_before"], hidden),
                           shared_bias)
        if self.use_lambda:
            h = params["lambda_1"].astype(h.dtype) * h
        hidden = hidden + h
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.output(params["output"],
                        self.act(self.intermediate(params["intermediate"], h)))
        if self.use_lambda:
            h = params["lambda_2"].astype(h.dtype) * h
        return hidden + h


class _BeitDense(Module):
    def __init__(self, din, dout, **lkw):
        dtype = lkw.pop("dtype")
        param_dtype = lkw.pop("param_dtype")
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype, **lkw)

    def __call__(self, params, x):
        return self.dense(params["dense"], x)


class _BeitAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.attention = BeitSelfAttention(config, config.use_relative_position_bias,
                                           dtype=dtype, param_dtype=param_dtype)
        self.output = _BeitSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, shared_bias=None):
        out = self.attention(params["attention"], hidden, shared_bias)
        return self.output(params["output"], out)


class _BeitSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return self.dense(params["dense"], hidden)


class BeitEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embeddings = _BeitPatchEmbeddings(config, dtype=dtype, param_dtype=param_dtype)
        self.use_abs = config.use_absolute_position_embeddings
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        params = super().init(rng)
        params["cls_token"] = jnp.zeros((1, 1, self.config.hidden_size), self.param_dtype)
        if self.config.use_mask_token:
            params["mask_token"] = jnp.zeros((1, 1, self.config.hidden_size), self.param_dtype)
        if self.use_abs:
            params["position_embeddings"] = jnp.zeros(
                (1, self.num_patches + 1, self.config.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        patches = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b = patches.shape[0]
        cls = jnp.broadcast_to(params["cls_token"].astype(patches.dtype),
                               (b, 1, patches.shape[-1]))
        emb = jnp.concatenate([cls, patches], axis=1)
        if self.use_abs:
            emb = emb + params["position_embeddings"].astype(emb.dtype)
        return emb


class _BeitPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.projection = Conv(config.num_channels, config.hidden_size, config.patch_size,
                               stride=config.patch_size, use_bias=True, ndim=2,
                               dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        x = self.projection(params["projection"], pixel_values.astype(self.dtype))
        b, d = x.shape[:2]
        return x.reshape(b, d, -1).transpose(0, 2, 1)


class BeitModel(Module):
    def __init__(self, config: BeitConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BeitEmbeddings(config, **kw)
        self.encoder = _BeitEncoder(config, **kw)
        self.layernorm = (None if config.use_mean_pooling
                          else LayerNorm(config.hidden_size, config.layer_norm_eps, **kw))
        self.pooler = _BeitPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, pixel_values, output_hidden_states=False, **kwargs):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states)
        if self.layernorm is not None:
            hidden = self.layernorm(params["layernorm"], hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _BeitPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.use_mean = config.use_mean_pooling
        if self.use_mean:
            self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                       dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        if self.use_mean:
            return self.layernorm(params["layernorm"], hidden[:, 1:].mean(axis=1))
        return hidden[:, 0]


class _BeitEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        if config.use_shared_relative_position_bias:
            self.relative_position_bias = BeitRelativePositionBias(config, **kw)
        else:
            self.relative_position_bias = None
        self.layer = [BeitLayer(config, **kw) for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, output_hidden_states=False):
        shared = None
        if self.relative_position_bias is not None:
            shared = self.relative_position_bias(params["relative_position_bias"])
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, shared)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class BeitPreTrainedModel(PreTrainedModel):
    config_class = BeitConfig
    base_model_prefix = "beit"


class BeitModelStandalone(BeitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.beit = BeitModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.beit(params["beit"], pixel_values, **kwargs)


class BeitForImageClassification(BeitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.beit = BeitModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, pixel_values=None, labels=None, **kwargs):
        out = self.beit(params["beit"], pixel_values)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
