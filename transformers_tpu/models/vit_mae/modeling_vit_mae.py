"""ViT-MAE (reference models/vit_mae/modeling_vit_mae.py): masked-autoencoder
ViT. The encoder sees only the kept (1-mask_ratio) patches after per-sample
noise-argsort shuffling (:303); the decoder re-inserts mask tokens, unshuffles
by ids_restore, and regresses pixels per patch (:536); loss is MSE over the
masked patches only (:851)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class ViTMAEConfig(PretrainedConfig):
    model_type = "vit_mae"

    def __init__(self, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.0,
                 attention_probs_dropout_prob=0.0, initializer_range=0.02,
                 layer_norm_eps=1e-12, image_size=224, patch_size=16,
                 num_channels=3, qkv_bias=True, decoder_num_attention_heads=16,
                 decoder_hidden_size=512, decoder_num_hidden_layers=8,
                 decoder_intermediate_size=2048, mask_ratio=0.75,
                 norm_pix_loss=False, **kwargs):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.qkv_bias = qkv_bias
        self.decoder_num_attention_heads = decoder_num_attention_heads
        self.decoder_hidden_size = decoder_hidden_size
        self.decoder_num_hidden_layers = decoder_num_hidden_layers
        self.decoder_intermediate_size = decoder_intermediate_size
        self.mask_ratio = mask_ratio
        self.norm_pix_loss = norm_pix_loss
        super().__init__(**kwargs)


@dataclass
class ViTMAEModelOutput(ModelOutput):
    last_hidden_state: jnp.ndarray = None
    mask: jnp.ndarray = None
    ids_restore: jnp.ndarray = None
    hidden_states: Optional[tuple] = None


@dataclass
class ViTMAEForPreTrainingOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: jnp.ndarray = None
    mask: jnp.ndarray = None
    ids_restore: jnp.ndarray = None
    hidden_states: Optional[tuple] = None


def sincos_pos_embed_2d(grid_size, dim):
    """2D sin-cos table in the pretrained (h/w-swapped) layout: reference
    :287 rotates the canonical [sin_h|cos_h|sin_w|cos_w] halves."""
    pos_dim = dim // 4
    omega = 1.0 / 10000.0 ** (np.arange(pos_dim, dtype=np.float64) / pos_dim)
    gh, gw = np.meshgrid(np.arange(grid_size, dtype=np.float64),
                         np.arange(grid_size, dtype=np.float64), indexing="ij")
    eh = gh.reshape(-1)[:, None] * omega[None]
    ew = gw.reshape(-1)[:, None] * omega[None]
    pe = np.concatenate([np.sin(eh), np.cos(eh), np.sin(ew), np.cos(ew)], axis=1)
    half = dim // 2
    pe = np.concatenate([pe[:, half:], pe[:, :half]], axis=1)
    return np.concatenate([np.zeros((1, dim)), pe], axis=0)[None]  # [1, 1+P, D]


class ViTMAESelfAttention(Module):
    """Hub-layout attention: attention.attention.{query,key,value} +
    attention.output.dense (pre-rename reference :358)."""

    def __init__(self, hidden, heads, qkv_bias, init_range, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = heads
        self.head_dim = hidden // heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(init_range))
        inner = Module(dtype=dtype, param_dtype=param_dtype)
        inner.query = Linear(hidden, hidden, qkv_bias, **kw)
        inner.key = Linear(hidden, hidden, qkv_bias, **kw)
        inner.value = Linear(hidden, hidden, qkv_bias, **kw)
        self.attention = inner
        output = Module(dtype=dtype, param_dtype=param_dtype)
        output.dense = Linear(hidden, hidden, True, **kw)
        self.output = output

    def __call__(self, params, hidden):
        b, s, e = hidden.shape
        inner = params["attention"]
        q = self.attention.query(inner["query"], hidden).reshape(b, s, self.num_heads, -1)
        k = self.attention.key(inner["key"], hidden).reshape(b, s, self.num_heads, -1)
        v = self.attention.value(inner["value"], hidden).reshape(b, s, self.num_heads, -1)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(w, axis=-1)
        c = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.output.dense(params["output"]["dense"], c)


class ViTMAELayer(Module):
    def __init__(self, hidden, heads, inter, act, eps, qkv_bias, init_range,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(init_range))
        self.attention = ViTMAESelfAttention(hidden, heads, qkv_bias, init_range, **kw)
        self.layernorm_before = LayerNorm(hidden, eps, **kw)
        self.layernorm_after = LayerNorm(hidden, eps, **kw)
        inter_m = Module(**kw)
        inter_m.dense = Linear(hidden, inter, True, **kw2)
        self.intermediate = inter_m
        out_m = Module(**kw)
        out_m.dense = Linear(inter, hidden, True, **kw2)
        self.output = out_m
        self.act = get_activation(act)

    def __call__(self, params, hidden):
        a = self.attention(params["attention"],
                           self.layernorm_before(params["layernorm_before"], hidden))
        hidden = hidden + a
        y = self.layernorm_after(params["layernorm_after"], hidden)
        y = self.output.dense(params["output"]["dense"],
                              self.act(self.intermediate.dense(
                                  params["intermediate"]["dense"], y)))
        return hidden + y


class ViTMAEEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_patches = (config.image_size // config.patch_size) ** 2

    def init(self, rng):
        c = self.config
        k1, k2 = jax.random.split(rng)
        init = normal_init(c.initializer_range)
        return {
            "cls_token": init(k1, (1, 1, c.hidden_size), self.param_dtype),
            "position_embeddings": jnp.asarray(
                sincos_pos_embed_2d(c.image_size // c.patch_size, c.hidden_size),
                self.param_dtype),
            "patch_embeddings": {"projection": {
                "weight": init(k2, (c.hidden_size, c.num_channels,
                                    c.patch_size, c.patch_size), self.param_dtype),
                "bias": jnp.zeros((c.hidden_size,), self.param_dtype)}},
        }

    def __call__(self, params, pixel_values, noise=None):
        c = self.config
        ps = c.patch_size
        b, ch, hh, ww = pixel_values.shape
        x = pixel_values.reshape(b, ch, hh // ps, ps, ww // ps, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, (hh // ps) * (ww // ps), ch * ps * ps)
        w = params["patch_embeddings"]["projection"]["weight"].astype(self.dtype)
        h = (x.astype(self.dtype) @ w.reshape(w.shape[0], -1).T
             + params["patch_embeddings"]["projection"]["bias"].astype(self.dtype))
        pos = params["position_embeddings"].astype(self.dtype)
        h = h + pos[:, 1:]
        # per-sample random masking by noise argsort (reference :303)
        seq = h.shape[1]
        len_keep = int(seq * (1 - c.mask_ratio))
        if noise is None:
            noise = jax.random.uniform(jax.random.PRNGKey(0), (b, seq))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        h = jnp.take_along_axis(h, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((b, seq), dtype=self.dtype).at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        cls = params["cls_token"].astype(self.dtype) + pos[:, :1]
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, h.shape[-1])), h], axis=1)
        return h, mask, ids_restore


class ViTMAEPreTrainedModel(PreTrainedModel):
    config_class = ViTMAEConfig
    base_model_prefix = "vit"
    main_input_name = "pixel_values"


def _layer_args(c, decoder=False):
    if decoder:
        return (c.decoder_hidden_size, c.decoder_num_attention_heads,
                c.decoder_intermediate_size, c.hidden_act, c.layer_norm_eps,
                c.qkv_bias, c.initializer_range)
    return (c.hidden_size, c.num_attention_heads, c.intermediate_size,
            c.hidden_act, c.layer_norm_eps, c.qkv_bias, c.initializer_range)


class ViTMAEModel(ViTMAEPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = ViTMAEEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [ViTMAELayer(*_layer_args(config), **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values, noise=None,
                 output_hidden_states=False, **kwargs):
        h, mask, ids_restore = self.embeddings(params["embeddings"],
                                               pixel_values, noise)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h)
        if output_hidden_states:
            all_hidden.append(h)
        h = self.layernorm(params["layernorm"], h)
        return ViTMAEModelOutput(
            last_hidden_state=h, mask=mask, ids_restore=ids_restore,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class ViTMAEDecoder(Module):
    def __init__(self, config, num_patches, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_patches = num_patches
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.decoder_embed = Linear(config.hidden_size, config.decoder_hidden_size,
                                    True, **kw2)
        self.decoder_layers = [ViTMAELayer(*_layer_args(config, decoder=True), **kw)
                               for _ in range(config.decoder_num_hidden_layers)]
        self.decoder_norm = LayerNorm(config.decoder_hidden_size,
                                      config.layer_norm_eps, **kw)
        self.decoder_pred = Linear(
            config.decoder_hidden_size,
            config.patch_size ** 2 * config.num_channels, True, **kw2)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        params["mask_token"] = normal_init(c.initializer_range)(
            rng, (1, 1, c.decoder_hidden_size), self.param_dtype)
        params["decoder_pos_embed"] = jnp.asarray(
            sincos_pos_embed_2d(int(self.num_patches ** 0.5),
                                c.decoder_hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden, ids_restore):
        h = self.decoder_embed(params["decoder_embed"], hidden)
        b, s, e = h.shape
        n_mask = ids_restore.shape[1] + 1 - s
        mask_tokens = jnp.broadcast_to(
            params["mask_token"].astype(self.dtype), (b, n_mask, e))
        tokens = jnp.concatenate([h[:, 1:], mask_tokens], axis=1)
        tokens = jnp.take_along_axis(tokens, ids_restore[:, :, None], axis=1)
        h = jnp.concatenate([h[:, :1], tokens], axis=1)
        h = h + params["decoder_pos_embed"].astype(self.dtype)
        for i, layer in enumerate(self.decoder_layers):
            h = layer(params["decoder_layers"][str(i)], h)
        h = self.decoder_norm(params["decoder_norm"], h)
        return self.decoder_pred(params["decoder_pred"], h)[:, 1:]


def patchify(pixel_values, patch_size):
    b, ch, hh, ww = pixel_values.shape
    nh, nw = hh // patch_size, ww // patch_size
    x = pixel_values.reshape(b, ch, nh, patch_size, nw, patch_size)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(b, nh * nw, patch_size ** 2 * ch)


class ViTMAEForPreTraining(ViTMAEPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vit = ViTMAEModel(config, **kw)
        self.decoder = ViTMAEDecoder(config, self.vit.embeddings.num_patches, **kw)

    def __call__(self, params, pixel_values, noise=None,
                 output_hidden_states=False, **kwargs):
        outputs = self.vit(params["vit"], pixel_values, noise,
                           output_hidden_states)
        logits = self.decoder(params["decoder"], outputs.last_hidden_state,
                              outputs.ids_restore)
        target = patchify(pixel_values.astype(self.dtype), self.config.patch_size)
        if self.config.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True, ddof=1)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean((logits - target) ** 2, axis=-1)
        loss = jnp.sum(loss * outputs.mask) / jnp.sum(outputs.mask)
        return ViTMAEForPreTrainingOutput(
            loss=loss, logits=logits, mask=outputs.mask,
            ids_restore=outputs.ids_restore,
            hidden_states=outputs.hidden_states)
