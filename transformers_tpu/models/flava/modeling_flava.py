"""FLAVA (reference models/flava/modeling_flava.py): a foundational
language-and-vision model — ViT image encoder, BERT-style text encoder, a
multimodal fusion transformer over the concatenated unimodal states, CLIP-like
contrastive projections, a DALL-E style image codebook for MIM targets, and a
pre-training head stack (MIM/MLM/MMM/ITM/global-contrastive)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.loading import WeightRule
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_flava import (
    FlavaConfig,
    FlavaImageCodebookConfig,
    FlavaImageConfig,
    FlavaMultimodalConfig,
    FlavaTextConfig,
)

LOGIT_SCALE_CLAMP_MIN = 0.0
LOGIT_SCALE_CLAMP_MAX = 4.6052


@dataclass
class FlavaModelOutput(ModelOutput):
    image_embeddings: Optional[jnp.ndarray] = None
    image_output: Optional[Any] = None
    text_embeddings: Optional[jnp.ndarray] = None
    text_output: Optional[Any] = None
    multimodal_embeddings: Optional[jnp.ndarray] = None
    multimodal_output: Optional[Any] = None


@dataclass
class FlavaLosses(ModelOutput):
    mim: Optional[jnp.ndarray] = None
    mlm: Optional[jnp.ndarray] = None
    itm: Optional[jnp.ndarray] = None
    global_contrastive: Optional[jnp.ndarray] = None
    mmm_image: Optional[jnp.ndarray] = None
    mmm_text: Optional[jnp.ndarray] = None

    def all_none(self):
        return all(v is None for v in
                   (self.mim, self.mlm, self.itm, self.global_contrastive,
                    self.mmm_image, self.mmm_text))


@dataclass
class FlavaForPreTrainingOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    loss_info: Optional[FlavaLosses] = None
    image_embeddings: Optional[jnp.ndarray] = None
    text_embeddings: Optional[jnp.ndarray] = None
    multimodal_embeddings: Optional[jnp.ndarray] = None
    image_masked_embeddings: Optional[jnp.ndarray] = None
    text_masked_embeddings: Optional[jnp.ndarray] = None
    multimodal_masked_embeddings: Optional[jnp.ndarray] = None
    mim_logits: Optional[jnp.ndarray] = None
    mlm_logits: Optional[jnp.ndarray] = None
    itm_logits: Optional[jnp.ndarray] = None
    contrastive_logits_per_image: Optional[jnp.ndarray] = None
    contrastive_logits_per_text: Optional[jnp.ndarray] = None
    mmm_image_logits: Optional[jnp.ndarray] = None
    mmm_text_logits: Optional[jnp.ndarray] = None


class FlavaPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_patches = (config.image_size // config.patch_size) ** 2
        self.projection = Conv(config.num_channels, config.hidden_size,
                               config.patch_size, stride=config.patch_size,
                               ndim=2, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        h = self.projection(params["projection"], pixel_values)
        b, c = h.shape[:2]
        return h.reshape(b, c, -1).transpose(0, 2, 1)


class FlavaImageEmbeddings(Module):
    def __init__(self, config, use_mask_token=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.use_mask_token = use_mask_token or config.mask_token
        self.patch_embeddings = FlavaPatchEmbeddings(config, dtype=dtype,
                                                     param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        params["cls_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        if self.use_mask_token:
            params["mask_token"] = jnp.zeros((1, 1, c.hidden_size), self.param_dtype)
        n = self.patch_embeddings.num_patches + 1
        params["position_embeddings"] = jnp.zeros((1, n, c.hidden_size),
                                                  self.param_dtype)
        return params

    def __call__(self, params, pixel_values, bool_masked_pos=None):
        emb = self.patch_embeddings(params["patch_embeddings"], pixel_values)
        b, s, _ = emb.shape
        if bool_masked_pos is not None:
            mask = jnp.asarray(bool_masked_pos).reshape(b, -1)[..., None]
            mask = mask.astype(emb.dtype)
            emb = emb * (1.0 - mask) + params["mask_token"].astype(emb.dtype) * mask
        cls = jnp.broadcast_to(params["cls_token"].astype(emb.dtype),
                               (b, 1, emb.shape[-1]))
        emb = jnp.concatenate([cls, emb], axis=1)
        return emb + params["position_embeddings"].astype(emb.dtype)


class FlavaTextEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.word_embeddings = Embedding(config.vocab_size, h, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, h, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, h, **kw)
        self.LayerNorm = LayerNorm(h, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None):
        b, s = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        emb = self.word_embeddings(params["word_embeddings"], input_ids)
        emb = emb + self.token_type_embeddings(params["token_type_embeddings"],
                                               token_type_ids)
        emb = emb + self.position_embeddings(params["position_embeddings"],
                                             position_ids)
        return self.LayerNorm(params["LayerNorm"], emb)


class FlavaSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // config.num_attention_heads
        self.query = Linear(h, h, config.qkv_bias, **kw)
        self.key = Linear(h, h, config.qkv_bias, **kw)
        self.value = Linear(h, h, config.qkv_bias, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        b, s, _ = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (self.head_dim ** 0.5)
        if attention_mask is not None:
            scores = scores + attention_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)


class FlavaAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = FlavaSelfAttention(config, **kw)
        self.output = _Container({"dense": Linear(
            config.hidden_size, config.hidden_size, True,
            kernel_init=normal_init(config.initializer_range), **kw)}, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        h = self.attention(params["attention"], hidden, attention_mask)
        return self.output._children["dense"](params["output"]["dense"], h)


class FlavaLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.attention = FlavaAttention(config, **kw)
        self.intermediate = _Container({"dense": Linear(
            h, config.intermediate_size, True, **lkw)}, **kw)
        self.output = _Container({"dense": Linear(
            config.intermediate_size, h, True, **lkw)}, **kw)
        self.layernorm_before = LayerNorm(h, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(h, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attention_mask=None):
        attn = self.attention(params["attention"],
                              self.layernorm_before(params["layernorm_before"], hidden),
                              attention_mask)
        hidden = attn + hidden
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.act(self.intermediate._children["dense"](
            params["intermediate"]["dense"], h))
        h = self.output._children["dense"](params["output"]["dense"], h)
        return h + hidden


class FlavaEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self._layers = [FlavaLayer(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_hidden_layers)]
        self._children.pop("_layers", None)
        self.layer = ModuleList(self._layers)

    def __call__(self, params, hidden, attention_mask=None):
        all_hidden = [hidden]
        for i, layer in enumerate(self._layers):
            hidden = layer(params["layer"][str(i)], hidden, attention_mask)
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class FlavaPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


def _extended_mask(attention_mask, dtype):
    mask = jnp.asarray(attention_mask)[:, None, None, :].astype(jnp.float32)
    return (1.0 - mask) * jnp.finfo(jnp.float32).min


class FlavaImageModelModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = FlavaImageEmbeddings(config, **kw)
        self.encoder = FlavaEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = FlavaPooler(config, **kw)

    def __call__(self, params, pixel_values, bool_masked_pos=None,
                 attention_mask=None):
        emb = self.embeddings(params["embeddings"], pixel_values, bool_masked_pos)
        mask = _extended_mask(attention_mask, emb.dtype) if attention_mask is not None else None
        hidden, all_hidden = self.encoder(params["encoder"], emb, mask)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=pooled,
                                          hidden_states=all_hidden)


class FlavaTextModelModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = FlavaTextEmbeddings(config, **kw)
        self.encoder = FlavaEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = FlavaPooler(config, **kw)

    def __call__(self, params, input_ids, attention_mask=None,
                 token_type_ids=None, position_ids=None):
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        emb = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                              position_ids)
        mask = _extended_mask(attention_mask, emb.dtype)
        hidden, all_hidden = self.encoder(params["encoder"], emb, mask)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=pooled,
                                          hidden_states=all_hidden)


class FlavaMultimodalModelModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.use_cls_token = config.use_cls_token
        self.encoder = FlavaEncoder(config, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = FlavaPooler(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        if self.use_cls_token:
            params["cls_token"] = jnp.zeros((1, 1, self.config.hidden_size),
                                            self.param_dtype)
        return params

    def __call__(self, params, hidden_states, attention_mask=None):
        b = hidden_states.shape[0]
        if self.use_cls_token:
            cls = jnp.broadcast_to(
                params["cls_token"].astype(hidden_states.dtype),
                (b, 1, hidden_states.shape[-1]))
            hidden_states = jnp.concatenate([cls, hidden_states], axis=1)
        mask = (_extended_mask(attention_mask, hidden_states.dtype)
                if attention_mask is not None else None)
        hidden, all_hidden = self.encoder(params["encoder"], hidden_states, mask)
        hidden = self.layernorm(params["layernorm"], hidden)
        pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=pooled,
                                          hidden_states=all_hidden)


class FlavaPreTrainedModel(PreTrainedModel):
    config_class = FlavaConfig
    # torch serializes the tied prediction-head bias as "X_head.bias"
    # (reference _tied_weights_keys); route it to the decoder bias we own
    _weight_rules = (
        WeightRule(pattern=r"((?:mim|mlm|mmm_image|mmm_text)_head)\.bias$",
                   rename=r"\1.decoder.bias"),
    )
    _keys_to_ignore_on_load_unexpected = (
        r"position_ids$", r"token_type_ids$")


class FlavaModel(FlavaPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: FlavaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = FlavaTextModelModule(config.text_config, **kw)
        self.image_model = FlavaImageModelModule(config.image_config, **kw)
        self.multimodal_model = FlavaMultimodalModelModule(config.multimodal_config, **kw)
        self.image_projection = Linear(config.image_config.hidden_size,
                                       config.projection_dim, True,
                                       kernel_init=normal_init(0.02), **kw)
        self.text_projection = Linear(config.text_config.hidden_size,
                                      config.projection_dim, True,
                                      kernel_init=normal_init(0.02), **kw)
        self.image_to_mm_projection = Linear(
            config.image_config.hidden_size,
            config.multimodal_config.hidden_size, True,
            kernel_init=normal_init(0.02), **kw)
        self.text_to_mm_projection = Linear(
            config.text_config.hidden_size,
            config.multimodal_config.hidden_size, True,
            kernel_init=normal_init(0.02), **kw)

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(
            self.config.logit_scale_init_value, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None,
                          token_type_ids=None, position_ids=None):
        out = self.text_model(params["text_model"], jnp.asarray(input_ids),
                              attention_mask, token_type_ids, position_ids)
        return self.text_projection(params["text_projection"],
                                    out.last_hidden_state)

    def get_image_features(self, params, pixel_values, bool_masked_pos=None,
                           attention_mask=None):
        out = self.image_model(params["image_model"],
                               jnp.asarray(pixel_values, self.dtype),
                               bool_masked_pos, attention_mask)
        return self.image_projection(params["image_projection"],
                                     out.last_hidden_state)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, token_type_ids=None, bool_masked_pos=None,
                 position_ids=None, image_attention_mask=None,
                 skip_multimodal_encoder=None, **kwargs) -> FlavaModelOutput:
        image_embeddings = image_mm = image_output = None
        if pixel_values is not None:
            image_output = self.image_model(
                params["image_model"], jnp.asarray(pixel_values, self.dtype),
                bool_masked_pos, image_attention_mask)
            image_embeddings = image_output.last_hidden_state
            image_mm = self.image_to_mm_projection(
                params["image_to_mm_projection"], image_output.hidden_states[-1])
        text_embeddings = text_mm = text_output = None
        if input_ids is not None:
            text_output = self.text_model(params["text_model"],
                                          jnp.asarray(input_ids),
                                          attention_mask, token_type_ids,
                                          position_ids)
            text_embeddings = text_output.last_hidden_state
            text_mm = self.text_to_mm_projection(
                params["text_to_mm_projection"], text_output.hidden_states[-1])
        multimodal_embeddings = multimodal_output = None
        if image_mm is not None and text_mm is not None and not skip_multimodal_encoder:
            if attention_mask is not None:
                b, s, _ = image_mm.shape
                if self.multimodal_model.use_cls_token:
                    s += 1
                ones = jnp.ones((b, s), jnp.int32)
                mm_mask = jnp.concatenate([ones, jnp.asarray(attention_mask)], axis=1)
            else:
                mm_mask = None
            multimodal_output = self.multimodal_model(
                params["multimodal_model"],
                jnp.concatenate([image_mm, text_mm], axis=1), mm_mask)
            multimodal_embeddings = multimodal_output.last_hidden_state
        return FlavaModelOutput(
            image_embeddings=image_embeddings, image_output=image_output,
            text_embeddings=text_embeddings, text_output=text_output,
            multimodal_embeddings=multimodal_embeddings,
            multimodal_output=multimodal_output)


class FlavaImageCodebookResPath(Module):
    def __init__(self, in_size, out_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        hid = out_size // 4
        self.path = _Container({
            "conv_1": Conv(in_size, hid, 3, padding=1, ndim=2, **kw),
            "conv_2": Conv(hid, hid, 3, padding=1, ndim=2, **kw),
            "conv_3": Conv(hid, hid, 3, padding=1, ndim=2, **kw),
            "conv_4": Conv(hid, out_size, 1, ndim=2, **kw),
        }, **kw)

    def __call__(self, params, x):
        mods = self.path._children
        p = params["path"]
        h = mods["conv_1"](p["conv_1"], jax.nn.relu(x))
        h = mods["conv_2"](p["conv_2"], jax.nn.relu(h))
        h = mods["conv_3"](p["conv_3"], jax.nn.relu(h))
        return mods["conv_4"](p["conv_4"], jax.nn.relu(h))


class FlavaImageCodebookBlock(Module):
    def __init__(self, in_size, out_size, num_layers, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.post_gain = 1 / (num_layers ** 2)
        self.id_path = (Conv(in_size, out_size, 1, ndim=2, **kw)
                        if in_size != out_size else None)
        self.res_path = FlavaImageCodebookResPath(in_size, out_size, **kw)

    def __call__(self, params, x):
        idp = (self.id_path(params["id_path"], x)
               if self.id_path is not None else x)
        return idp + self.post_gain * self.res_path(params["res_path"], x)


class FlavaImageCodebookLayerGroup(Module):
    def __init__(self, num_blocks, num_layers, in_size, out_size,
                 use_pool=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        blocks = {}
        for i in range(num_blocks):
            src = in_size if i == 0 else out_size
            blocks[f"block_{i + 1}"] = FlavaImageCodebookBlock(
                src, out_size, num_layers, **kw)
        self.num_blocks = num_blocks
        self.use_pool = use_pool
        self.group = _Container(blocks, **kw)

    def __call__(self, params, x):
        for i in range(self.num_blocks):
            name = f"block_{i + 1}"
            x = self.group._children[name](params["group"][name], x)
        if self.use_pool:
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return x


class FlavaImageCodebook(FlavaPreTrainedModel):
    config_class = FlavaImageCodebookConfig
    base_model_prefix = "model"
    main_input_name = "pixel_values"

    def __init__(self, config: FlavaImageCodebookConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        num_layers = config.num_groups * config.num_blocks_per_group
        hs = config.hidden_size
        nb = config.num_blocks_per_group
        self.blocks = _Container({
            "input": Conv(config.input_channels, hs, 7, padding=3, ndim=2, **kw),
            "group_1": FlavaImageCodebookLayerGroup(nb, num_layers, hs, hs, **kw),
            "group_2": FlavaImageCodebookLayerGroup(nb, num_layers, hs, 2 * hs, **kw),
            "group_3": FlavaImageCodebookLayerGroup(nb, num_layers, 2 * hs, 4 * hs, **kw),
            "group_4": FlavaImageCodebookLayerGroup(nb, num_layers, 4 * hs, 8 * hs,
                                                    use_pool=False, **kw),
            "output": _Container({"conv": Conv(8 * hs, config.vocab_size, 1,
                                               ndim=2, **kw)}, **kw),
        }, **kw)

    def _blocks(self, params, x):
        mods = self.blocks._children
        p = params["blocks"]
        h = mods["input"](p["input"], jnp.asarray(x, self.dtype))
        for g in ("group_1", "group_2", "group_3", "group_4"):
            h = mods[g](p[g], h)
        out = mods["output"]._children["conv"]
        return out(p["output"]["conv"], jax.nn.relu(h))

    def get_codebook_indices(self, params, pixel_values):
        return jnp.argmax(self._blocks(params, pixel_values), axis=1)

    def get_codebook_probs(self, params, pixel_values):
        return jax.nn.softmax(self._blocks(params, pixel_values), axis=1)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self._blocks(params, pixel_values)


class FlavaPredictionHeadTransform(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            kernel_init=normal_init(config.initializer_range), **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, h):
        return self.LayerNorm(params["LayerNorm"],
                              self.act(self.dense(params["dense"], h)))


class FlavaMaskedPredictionHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.transform = FlavaPredictionHeadTransform(config, **kw)
        self.decoder = Linear(config.hidden_size, config.vocab_size, True,
                              kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, x):
        return self.decoder(params["decoder"],
                            self.transform(params["transform"], x))


class FlavaITMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.pooler = FlavaPooler(config, **kw)
        self.seq_relationship = Linear(config.hidden_size, 2, True,
                                       kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, x):
        return self.seq_relationship(params["seq_relationship"],
                                     self.pooler(params["pooler"], x))


def _cross_entropy(logits, labels, ignore_index=-100):
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0)) / jnp.maximum(valid.sum(), 1)


class FlavaForPreTraining(FlavaPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: FlavaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.flava = FlavaModel(config, **kw)
        self.image_codebook = (FlavaImageCodebook(config.image_codebook_config, **kw)
                               if config.init_codebook else None)
        self.mim_head = FlavaMaskedPredictionHead(config.image_config, **kw)
        self.mlm_head = FlavaMaskedPredictionHead(config.text_config, **kw)
        self.itm_head = FlavaITMHead(config, **kw)
        self.mmm_image_head = FlavaMaskedPredictionHead(config.image_config, **kw)
        self.mmm_text_head = FlavaMaskedPredictionHead(config.text_config, **kw)
        self.ce_ignore_index = config.ce_ignore_index

    def __call__(self, params, input_ids=None, input_ids_masked=None,
                 pixel_values=None, codebook_pixel_values=None,
                 attention_mask=None, token_type_ids=None, bool_masked_pos=None,
                 position_ids=None, image_attention_mask=None,
                 skip_unmasked_multimodal_encoder=None, mlm_labels=None,
                 mim_labels=None, itm_labels=None, return_loss=None,
                 **kwargs) -> FlavaForPreTrainingOutput:
        cfg = self.config
        return_loss = cfg.return_loss if return_loss is None else return_loss
        skip = (cfg.skip_unmasked_multimodal_encoder
                if skip_unmasked_multimodal_encoder is None
                else skip_unmasked_multimodal_encoder)
        if input_ids_masked is None and input_ids is not None:
            input_ids_masked = input_ids

        flava_output = self.flava(params["flava"], input_ids=input_ids,
                                  pixel_values=pixel_values,
                                  attention_mask=attention_mask,
                                  token_type_ids=token_type_ids,
                                  position_ids=position_ids,
                                  image_attention_mask=image_attention_mask,
                                  skip_multimodal_encoder=skip)
        flava_masked = self.flava(params["flava"], input_ids=input_ids_masked,
                                  pixel_values=pixel_values,
                                  attention_mask=attention_mask,
                                  token_type_ids=token_type_ids,
                                  image_attention_mask=image_attention_mask,
                                  bool_masked_pos=bool_masked_pos)

        image_embeddings = flava_output.image_embeddings
        text_embeddings = flava_output.text_embeddings
        image_masked = flava_masked.image_embeddings
        text_masked = flava_masked.text_embeddings
        mm_masked = flava_masked.multimodal_embeddings

        losses = {}
        mim_logits = mlm_logits = mmm_image_logits = mmm_text_logits = None
        itm_logits = logits_per_image = logits_per_text = None
        pos_mask = None

        if (image_masked is not None or mm_masked is not None) and \
                mim_labels is None and return_loss:
            if self.image_codebook is None:
                raise RuntimeError("image codebook not initialized and no "
                                   "mim_labels passed")
            if codebook_pixel_values is None:
                raise ValueError("codebook_pixel_values required to generate "
                                 "mim_labels")
            idx = self.image_codebook.get_codebook_indices(
                params["image_codebook"], codebook_pixel_values)
            b = idx.shape[0]
            mim_labels = idx.reshape(b, -1)

        if cfg.mim_weight > 0 and image_masked is not None and mm_masked is None:
            seq = image_masked
            if mim_labels is not None:
                mim_labels = jnp.asarray(mim_labels).reshape(mim_labels.shape[0], -1)
                bmp = jnp.asarray(bool_masked_pos).reshape(mim_labels.shape)
                mim_labels = jnp.where(bmp, mim_labels, self.ce_ignore_index)
                seq = seq[:, -mim_labels.shape[1]:, :]
                masked = np.asarray(mim_labels != self.ce_ignore_index)
                mim_logits = self.mim_head(params["mim_head"], seq[masked])
                if return_loss:
                    losses["mim"] = cfg.mim_weight * _cross_entropy(
                        mim_logits, mim_labels[masked])
            else:
                mim_logits = self.mim_head(params["mim_head"], seq)

        if cfg.mlm_weight > 0 and text_masked is not None and mm_masked is None:
            seq = text_masked
            if mlm_labels is not None:
                mlm_labels = jnp.asarray(mlm_labels)
                seq = seq[:, -mlm_labels.shape[1]:, :]
                masked = np.asarray(mlm_labels != self.ce_ignore_index)
                mlm_logits = self.mlm_head(params["mlm_head"], seq[masked])
                if return_loss:
                    losses["mlm"] = cfg.mlm_weight * _cross_entropy(
                        mlm_logits, mlm_labels[masked])
            else:
                mlm_logits = self.mlm_head(params["mlm_head"], seq)

        if cfg.itm_weight > 0 and mm_masked is not None:
            itm_logits = self.itm_head(params["itm_head"], mm_masked)
            if itm_labels is not None:
                itm_labels = jnp.asarray(itm_labels)
                pos_pairs = np.asarray(itm_labels != 0)
                pos_mask = pos_pairs | (~pos_pairs.any())
                if return_loss:
                    losses["itm"] = cfg.itm_weight * _cross_entropy(
                        itm_logits, itm_labels)
                mm_masked = mm_masked[pos_mask]
                if mlm_labels is not None:
                    mlm_labels = jnp.asarray(mlm_labels)[pos_mask]
                if mim_labels is not None:
                    mim_labels = jnp.asarray(mim_labels)[pos_mask]
                    bool_masked_pos = jnp.asarray(bool_masked_pos)[pos_mask]

        if mm_masked is not None and cfg.mmm_image_weight > 0:
            end_index = image_masked.shape[1] - 1
            seq = mm_masked[:, 2:2 + end_index, :]
            if mim_labels is not None:
                mim_labels = jnp.asarray(mim_labels).reshape(mim_labels.shape[0], -1)
                bmp = jnp.asarray(bool_masked_pos).reshape(mim_labels.shape)
                mim_labels = jnp.where(bmp, mim_labels, self.ce_ignore_index)
                masked = np.asarray(mim_labels != self.ce_ignore_index)
                mmm_image_logits = self.mmm_image_head(
                    params["mmm_image_head"], seq[masked])
                if return_loss:
                    losses["mmm_image"] = cfg.mmm_image_weight * _cross_entropy(
                        mmm_image_logits, mim_labels[masked])
            else:
                mmm_image_logits = self.mmm_image_head(params["mmm_image_head"], seq)

        if mm_masked is not None and cfg.mmm_text_weight > 0:
            seq = mm_masked[:, -text_masked.shape[1]:, :]
            if mlm_labels is not None:
                masked = np.asarray(mlm_labels != self.ce_ignore_index)
                mmm_text_logits = self.mmm_text_head(
                    params["mmm_text_head"], seq[masked])
                if return_loss:
                    losses["mmm_text"] = cfg.mmm_text_weight * _cross_entropy(
                        mmm_text_logits, mlm_labels[masked])
            else:
                mmm_text_logits = self.mmm_text_head(params["mmm_text_head"], seq)

        if (image_embeddings is not None and text_embeddings is not None
                and cfg.global_contrastive_weight > 0):
            fp = params["flava"]
            text_emb = self.flava.text_projection(fp["text_projection"],
                                                  text_embeddings[:, 0])
            text_emb = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
            image_emb = self.flava.image_projection(fp["image_projection"],
                                                    image_embeddings[:, 0])
            image_emb = image_emb / jnp.linalg.norm(image_emb, axis=-1, keepdims=True)
            temperature = jnp.exp(fp["logit_scale"].astype(jnp.float32))
            logits_per_image = image_emb @ text_emb.T * temperature
            logits_per_text = text_emb @ image_emb.T * temperature
            gc_labels = jnp.arange(image_emb.shape[0])
            if pos_mask is not None:
                logits_per_image = logits_per_image[pos_mask]
                logits_per_text = logits_per_text[pos_mask]
                gc_labels = gc_labels[pos_mask]
            if return_loss:
                gc = (_cross_entropy(logits_per_image, gc_labels)
                      + _cross_entropy(logits_per_text, gc_labels)) / 2
                losses["global_contrastive"] = cfg.global_contrastive_weight * gc

        loss_info = FlavaLosses(**losses)
        total_loss = None
        if return_loss and losses:
            total_loss = sum(losses.values())
        return FlavaForPreTrainingOutput(
            loss=total_loss, loss_info=loss_info,
            image_embeddings=image_embeddings, text_embeddings=text_embeddings,
            multimodal_embeddings=flava_output.multimodal_embeddings,
            image_masked_embeddings=image_masked,
            text_masked_embeddings=text_masked,
            multimodal_masked_embeddings=mm_masked,
            mim_logits=mim_logits, mlm_logits=mlm_logits, itm_logits=itm_logits,
            contrastive_logits_per_image=logits_per_image,
            contrastive_logits_per_text=logits_per_text,
            mmm_image_logits=mmm_image_logits, mmm_text_logits=mmm_text_logits)
