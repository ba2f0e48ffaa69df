"""BridgeTower (reference models/bridgetower/modeling_bridgetower.py):
vision-language fusion with bridges — a CLIP-style visual tower and a
RoBERTa text tower run in parallel, and the TOP-K unimodal layers feed
cross-modal encoder layers through link towers (LayerNorm(uni + cross)), so
fusion sees multiple levels of each encoder rather than only the last."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from ..mask2former.modeling_mask2former import _TorchMHA
from .configuration_bridgetower import (
    BridgeTowerConfig,
    BridgeTowerTextConfig,
    BridgeTowerVisionConfig,
)


@dataclass
class BridgeTowerModelOutput(ModelOutput):
    text_features: Optional[jnp.ndarray] = None
    image_features: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None


@dataclass
class BridgeTowerITMOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


@dataclass
class BridgeTowerContrastiveOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    text_embeds: Optional[jnp.ndarray] = None
    image_embeds: Optional[jnp.ndarray] = None
    cross_embeds: Optional[jnp.ndarray] = None


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class BridgeTowerResidualAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.attn = _TorchMHA(d, d // 64, **kw)
        self.ln_1 = LayerNorm(d, config.layer_norm_eps, **kw)
        self.mlp = _Container({"c_fc": Linear(d, 4 * d, True, **lkw),
                               "c_proj": Linear(4 * d, d, True, **lkw)}, **kw)
        self.ln_2 = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden):
        h = self.ln_1(params["ln_1"], hidden)
        h = self.attn(params["attn"], h, h, h)
        residual = hidden + h
        h = self.ln_2(params["ln_2"], residual)
        mods = self.mlp._children
        h = mods["c_proj"](params["mlp"]["c_proj"],
                           _quick_gelu(mods["c_fc"](params["mlp"]["c_fc"], h)))
        return residual + h


class BridgeTowerVisionTransformer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        d = config.hidden_size
        n = config.num_hidden_layers - (1 if config.remove_last_layer else 0)
        self.embeddings = _BTVisionEmbeddings(config, **kw)
        self.ln_pre = LayerNorm(d, config.layer_norm_eps, **kw)
        self.transformer = _Container({"resblocks": ModuleList(
            [BridgeTowerResidualAttention(config, **kw) for _ in range(n)])}, **kw)
        self.ln_post = LayerNorm(d, config.layer_norm_eps, **kw)

    def forward_pre(self, params, pixel_values):
        h = self.embeddings(params["embeddings"], pixel_values)
        return self.ln_pre(params["ln_pre"], h)

    def forward_post(self, params, hidden):
        return self.ln_post(params["ln_post"], hidden)


class _BTVisionEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        from ...core.module import Conv

        self.patch_embedding = Conv(config.num_channels, config.hidden_size,
                                    config.patch_size, stride=config.patch_size,
                                    use_bias=False, ndim=2, dtype=dtype,
                                    param_dtype=param_dtype)
        n = (config.image_size // config.patch_size) ** 2 + 1
        self.position_embedding = Embedding(n, config.hidden_size, dtype=dtype,
                                            param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        params["class_embedding"] = jnp.zeros((self.config.hidden_size,),
                                              self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        h = self.patch_embedding(params["patch_embedding"], pixel_values)
        b, c = h.shape[:2]
        h = h.reshape(b, c, -1).transpose(0, 2, 1)
        cls = jnp.broadcast_to(params["class_embedding"].astype(h.dtype)[None, None],
                               (b, 1, c))
        h = jnp.concatenate([cls, h], axis=1)
        return h + params["position_embedding"]["weight"][None].astype(h.dtype)


class _BertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.query = Linear(d, d, True, **kw)
        self.key = Linear(d, d, True, **kw)
        self.value = Linear(d, d, True, **kw)

    def __call__(self, params, hidden, kv=None, mask=None):
        kv = hidden if kv is None else kv
        b, sq, d = hidden.shape
        sk = kv.shape[1]
        q = self.query(params["query"], hidden).reshape(b, sq, self.num_heads, self.head_dim)
        k = self.key(params["key"], kv).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.value(params["value"], kv).reshape(b, sk, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / (self.head_dim ** 0.5)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sq, d)


class _BertAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        d = config.hidden_size
        setattr(self, "self", _BertSelfAttention(config, **kw))
        self.output = _Container({
            "dense": Linear(d, d, True, **lkw),
            "LayerNorm": LayerNorm(d, config.layer_norm_eps, **kw)}, **kw)

    def __call__(self, params, hidden, kv=None, mask=None):
        h = self._children["self"](params["self"], hidden, kv, mask)
        out = self.output._children
        h = out["dense"](params["output"]["dense"], h)
        return out["LayerNorm"](params["output"]["LayerNorm"], h + hidden)


class _BertFFN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.intermediate = _Container({"dense": Linear(
            d, config.intermediate_size, True, **lkw)}, **kw)
        self.output = _Container({
            "dense": Linear(config.intermediate_size, d, True, **lkw),
            "LayerNorm": LayerNorm(d, config.layer_norm_eps, **kw)}, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        h = self.act(self.intermediate._children["dense"](
            params["intermediate"]["dense"], hidden))
        out = self.output._children
        h = out["dense"](params["output"]["dense"], h)
        return out["LayerNorm"](params["output"]["LayerNorm"], h + hidden)


class BridgeTowerTextLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _BertAttention(config, **kw)
        ffn = _BertFFN(config, **kw)
        self.intermediate = ffn._children["intermediate"]
        self.output = ffn._children["output"]
        self._ffn = ffn
        self._children.pop("_ffn", None)

    def __call__(self, params, hidden, mask=None):
        hidden = self.attention(params["attention"], hidden, None, mask)
        return self._ffn(params, hidden)


class BridgeTowerBertCrossLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _BertAttention(config, **kw)
        self.crossattention = _BertAttention(config, **kw)
        ffn = _BertFFN(config, **kw)
        self.intermediate = ffn._children["intermediate"]
        self.output = ffn._children["output"]
        self._ffn = ffn
        self._children.pop("_ffn", None)

    def __call__(self, params, hidden, encoder_hidden, mask=None, enc_mask=None):
        hidden = self.attention(params["attention"], hidden, None, mask)
        hidden = self.crossattention(params["crossattention"], hidden,
                                     encoder_hidden, enc_mask)
        return self._ffn(params, hidden)


class BridgeTowerTextEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.padding_idx = config.pad_token_id
        self.word_embeddings = Embedding(config.vocab_size, d, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, d, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, d, **kw)
        self.LayerNorm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids):
        ids = jnp.asarray(input_ids)
        mask = (ids != self.padding_idx).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        token_type = jnp.zeros_like(ids)
        h = self.word_embeddings(params["word_embeddings"], ids)
        h = h + self.token_type_embeddings(params["token_type_embeddings"],
                                           token_type)
        h = h + self.position_embeddings(params["position_embeddings"],
                                         position_ids)
        return self.LayerNorm(params["LayerNorm"], h)


class BridgeTowerLinkTower(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.link_tower_type = config.link_tower_type
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        if self.link_tower_type == "scaled_add":
            params["scaled_factor"] = jnp.asarray(1.0, self.param_dtype)
        elif self.link_tower_type == "interpolate":
            params["beta"] = jnp.asarray(0.5, self.param_dtype)
        return params

    def __call__(self, params, hidden, cross):
        if self.link_tower_type == "add":
            h = hidden + cross
        elif self.link_tower_type == "scaled_add":
            h = hidden * params["scaled_factor"] + cross
        else:
            beta = params["beta"]
            h = hidden * (1 - beta) + cross * beta
        return self.LayerNorm(params["LayerNorm"], h)


class BridgeTowerPooler(Module):
    def __init__(self, hidden_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(hidden_size, hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


class BridgeTowerPreTrainedModel(PreTrainedModel):
    config_class = BridgeTowerConfig
    base_model_prefix = "bridgetower"
    _keys_to_ignore_on_load_unexpected = (r"position_ids$", r"token_type_ids$")


class _BridgeTowerCore(Module):
    def __init__(self, config: BridgeTowerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.config = config
        tc, vc = config.text_config, config.vision_config
        d = config.hidden_size
        self.cross_modal_text_transform = Linear(tc.hidden_size, d, True, **lkw)
        self.cross_modal_image_transform = Linear(vc.hidden_size, d, True, **lkw)
        self.token_type_embeddings = Embedding(2, d, **kw)
        self.vision_model = _Container({
            "visual": BridgeTowerVisionTransformer(vc, **kw)}, **kw)
        self.text_model = _Container({
            "embeddings": BridgeTowerTextEmbeddings(tc, **kw),
            "encoder": _Container({"layer": ModuleList(
                [BridgeTowerTextLayer(tc, **kw)
                 for _ in range(tc.num_hidden_layers)])}, **kw),
            "pooler": BridgeTowerPooler(tc.hidden_size, **kw),
        }, **kw)
        self.cross_modal_image_layers = [BridgeTowerBertCrossLayer(tc, **kw)
                                         for _ in range(config.num_hidden_layers)]
        self.cross_modal_text_layers = [BridgeTowerBertCrossLayer(tc, **kw)
                                        for _ in range(config.num_hidden_layers)]
        self.cross_modal_image_pooler = BridgeTowerPooler(d, **kw)
        self.cross_modal_text_pooler = BridgeTowerPooler(d, **kw)
        self.cross_modal_text_layernorm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.cross_modal_image_layernorm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.cross_modal_text_link_tower = [
            BridgeTowerLinkTower(config, **kw)
            for _ in range(config.num_hidden_layers - 1)]
        self.cross_modal_image_link_tower = [
            BridgeTowerLinkTower(config, **kw)
            for _ in range(config.num_hidden_layers - 1)]

    def __call__(self, params, input_ids, pixel_values, attention_mask=None,
                 image_token_type_idx=1):
        cfg = self.config
        tmods = self.text_model._children
        tp = params["text_model"]
        text_embeds = tmods["embeddings"](tp["embeddings"], input_ids)
        b, s = jnp.asarray(input_ids).shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        text_mask = (1.0 - jnp.asarray(attention_mask)[:, None, None, :]
                     .astype(jnp.float32)) * jnp.finfo(jnp.float32).min
        text_layers = tmods["encoder"]._children["layer"]
        n_text = len(text_layers)
        split = n_text - cfg.num_hidden_layers + 1
        for i in range(split):
            text_embeds = text_layers[i](tp["encoder"]["layer"][str(i)],
                                         text_embeds, text_mask)
        visual = self.vision_model._children["visual"]
        vp = params["vision_model"]["visual"]
        image_embeds = visual.forward_pre(vp, jnp.asarray(pixel_values, self.dtype))
        resblocks = visual.transformer._children["resblocks"]
        for i in range(split):
            image_embeds = resblocks[i](vp["transformer"]["resblocks"][str(i)],
                                        image_embeds)
        image_with_ln = visual.forward_post(vp, image_embeds)
        cross_text = self.cross_modal_text_transform(
            params["cross_modal_text_transform"], text_embeds)
        tt_text = self.token_type_embeddings(params["token_type_embeddings"],
                                             jnp.zeros((1,), jnp.int32))
        cross_text = self.cross_modal_text_layernorm(
            params["cross_modal_text_layernorm"], cross_text + tt_text[None])
        image_with_ln = self.cross_modal_image_transform(
            params["cross_modal_image_transform"], image_with_ln)
        tt_img = self.token_type_embeddings(
            params["token_type_embeddings"],
            jnp.full((1,), image_token_type_idx, jnp.int32))
        image_with_ln = image_with_ln + tt_img[None]
        cross_image = self.cross_modal_image_layernorm(
            params["cross_modal_image_layernorm"], image_with_ln)
        cross_text_features = self.cross_modal_text_layers[0](
            params["cross_modal_text_layers"]["0"], cross_text, cross_image,
            text_mask, None)
        cross_image_features = self.cross_modal_image_layers[0](
            params["cross_modal_image_layers"]["0"], cross_image, cross_text,
            None, text_mask)
        link = 0
        for i in range(split, n_text):
            text_embeds = text_layers[i](tp["encoder"]["layer"][str(i)],
                                         text_embeds, text_mask)
            image_embeds = resblocks[i](vp["transformer"]["resblocks"][str(i)],
                                        image_embeds)
            image_with_ln = self.cross_modal_image_transform(
                params["cross_modal_image_transform"],
                visual.forward_post(vp, image_embeds)) + tt_img[None]
            transformed_text = self.cross_modal_text_transform(
                params["cross_modal_text_transform"], text_embeds)
            cross_text_in = self.cross_modal_text_link_tower[link](
                params["cross_modal_text_link_tower"][str(link)],
                transformed_text + tt_text[None], cross_text_features)
            cross_image_in = self.cross_modal_image_link_tower[link](
                params["cross_modal_image_link_tower"][str(link)],
                image_with_ln, cross_image_features)
            cross_text_features = self.cross_modal_text_layers[link + 1](
                params["cross_modal_text_layers"][str(link + 1)],
                cross_text_in, cross_image_in, text_mask, None)
            cross_image_features = self.cross_modal_image_layers[link + 1](
                params["cross_modal_image_layers"][str(link + 1)],
                cross_image_in, cross_text_in, None, text_mask)
            link += 1
        cls_text = self.cross_modal_text_pooler(
            params["cross_modal_text_pooler"], cross_text_features)
        cls_image = self.cross_modal_image_pooler(
            params["cross_modal_image_pooler"], cross_image_features)
        pooled = jnp.concatenate([cls_text, cls_image], axis=-1)
        return BridgeTowerModelOutput(text_features=cross_text_features,
                                      image_features=cross_image_features,
                                      pooler_output=pooled)


class BridgeTowerModel(BridgeTowerPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: BridgeTowerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _BridgeTowerCore(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, pixel_values=None, pixel_mask=None,
                 image_token_type_idx=None, **kwargs) -> BridgeTowerModelOutput:
        return self._core(params, input_ids, pixel_values, attention_mask,
                          image_token_type_idx or 1)


class BridgeTowerForImageAndTextRetrieval(BridgeTowerPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: BridgeTowerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.bridgetower = _BridgeTowerCore(config, **kw)
        self.itm_score = _Container({"fc": Linear(
            config.hidden_size * 2, 2, True, kernel_init=normal_init(0.02), **kw)},
            **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 pixel_values=None, labels=None, **kwargs) -> BridgeTowerITMOutput:
        out = self.bridgetower(params["bridgetower"], input_ids, pixel_values,
                               attention_mask)
        logits = self.itm_score._children["fc"](params["itm_score"]["fc"],
                                                out.pooler_output)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            loss = -jnp.take_along_axis(
                logp, jnp.asarray(labels)[:, None], axis=-1).mean()
        return BridgeTowerITMOutput(loss=loss, logits=logits)


class BridgeTowerContrastiveHead(Module):
    def __init__(self, hidden_size, embed_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.fc = Linear(hidden_size, embed_size, True, dtype=dtype,
                         param_dtype=param_dtype, kernel_init=normal_init(0.02))

    def __call__(self, params, x):
        return self.fc(params["fc"], x)


class BridgeTowerForContrastiveLearning(BridgeTowerPreTrainedModel):
    main_input_name = "input_ids"

    def __init__(self, config: BridgeTowerConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.bridgetower = _BridgeTowerCore(config, **kw)
        ch = config.contrastive_hidden_size
        self.itc_text_head = BridgeTowerContrastiveHead(config.hidden_size, ch, **kw)
        self.itc_image_head = BridgeTowerContrastiveHead(config.hidden_size, ch, **kw)
        self.itc_cross_modal_head = BridgeTowerContrastiveHead(
            config.hidden_size * 2, ch, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.config.logit_scale_init_value,
                                            self.param_dtype)
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 pixel_values=None, labels=None,
                 **kwargs) -> BridgeTowerContrastiveOutput:
        out = self.bridgetower(params["bridgetower"], input_ids, pixel_values,
                               attention_mask)
        text_embeds = self.itc_text_head(params["itc_text_head"],
                                         out.text_features[:, 0])
        image_embeds = self.itc_image_head(params["itc_image_head"],
                                           out.image_features[:, 0])
        cross_embeds = self.itc_cross_modal_head(params["itc_cross_modal_head"],
                                                 out.pooler_output)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1,
                                                    keepdims=True)
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1,
                                                      keepdims=True)
        cross_embeds = cross_embeds / jnp.linalg.norm(cross_embeds, axis=-1,
                                                      keepdims=True)
        logits = jnp.stack([text_embeds, image_embeds, cross_embeds], axis=-2)
        return BridgeTowerContrastiveOutput(logits=logits,
                                            text_embeds=text_embeds,
                                            image_embeds=image_embeds,
                                            cross_embeds=cross_embeds)
