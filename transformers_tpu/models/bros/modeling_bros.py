"""BROS (reference models/bros/modeling_bros.py): BERT encoder for document
key-information extraction — pairwise bbox differences get Transformer-XL
sinusoidal embeddings projected per-head and added as attention-score bias;
SPADE heads do initial-token classification and token→token relation linking."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, ModuleList, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput, TokenClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..luke.modeling_luke import _Container
from .configuration_bros import BrosConfig


@dataclass
class BrosSpadeOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    initial_token_logits: Optional[jnp.ndarray] = None
    subsequent_token_logits: Optional[jnp.ndarray] = None
    hidden_states: Optional[tuple] = None


def _sinusoid_1d(pos, dim):
    inv_freq = 1.0 / (10000.0 ** (np.arange(0.0, dim, 2.0) / dim))
    inp = pos[..., None] * jnp.asarray(inv_freq, pos.dtype)
    return jnp.concatenate([jnp.sin(inp), jnp.cos(inp)], axis=-1)


class BrosBboxEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.bbox_projection = Linear(config.dim_bbox_sinusoid_emb_2d,
                                      config.dim_bbox_projection, False,
                                      dtype=dtype, param_dtype=param_dtype,
                                      kernel_init=normal_init(0.02))

    def __call__(self, params, bbox):  # [B, S, dim_bbox]
        c = self.config
        bbox_t = bbox.transpose(1, 0, 2)  # [S, B, D]
        pos = bbox_t[None, :, :, :] - bbox_t[:, None, :, :]  # [S, S, B, D]
        parts = [_sinusoid_1d(pos[..., i], c.dim_bbox_sinusoid_emb_1d)
                 for i in range(c.dim_bbox)]
        emb = jnp.concatenate(parts, axis=-1)
        return self.bbox_projection(params["bbox_projection"], emb)


class BrosTextEmbeddings(Module):
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


class BrosSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // config.num_attention_heads
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)

    def __call__(self, params, hidden, bbox_pos_emb, attention_mask=None):
        b, s, _ = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        # bbox bias: [S, S, B, d_head] -> [B, S, S, d_head]
        pe = bbox_pos_emb.reshape(s, s, b, self.head_dim).transpose(2, 0, 1, 3)
        bias = jnp.einsum("bqhd,bqkd->bhqk", q.astype(jnp.float32),
                          pe.astype(jnp.float32))
        scores = (scores + bias) / math.sqrt(self.head_dim)
        if attention_mask is not None:
            scores = scores + attention_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)


class BrosLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.attention = _Container({
            "self": BrosSelfAttention(config, **kw),
            "output": _Container({
                "dense": Linear(h, h, True, **lkw),
                "LayerNorm": LayerNorm(h, config.layer_norm_eps, **kw)}, **kw),
        }, **kw)
        self.intermediate = _Container({"dense": Linear(
            h, config.intermediate_size, True, **lkw)}, **kw)
        self.output = _Container({
            "dense": Linear(config.intermediate_size, h, True, **lkw),
            "LayerNorm": LayerNorm(h, config.layer_norm_eps, **kw)}, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, bbox_pos_emb, attention_mask=None):
        attn = self.attention._children
        h = attn["self"](params["attention"]["self"], hidden, bbox_pos_emb,
                         attention_mask)
        out = attn["output"]._children
        po = params["attention"]["output"]
        h = out["dense"](po["dense"], h)
        hidden = out["LayerNorm"](po["LayerNorm"], h + hidden)
        inter = self.intermediate._children["dense"](
            params["intermediate"]["dense"], hidden)
        inter = self.act(inter)
        o = self.output._children
        h = o["dense"](params["output"]["dense"], inter)
        return o["LayerNorm"](params["output"]["LayerNorm"], h + hidden)


class BrosEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [BrosLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, bbox_pos_emb, attention_mask=None):
        all_hidden = [hidden]
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, bbox_pos_emb,
                           attention_mask)
            all_hidden.append(hidden)
        return hidden, tuple(all_hidden)


class BrosPooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return jnp.tanh(self.dense(params["dense"], hidden[:, 0]))


class BrosRelationExtractor(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        h = config.hidden_size
        self.n_relations = config.n_relations
        self.hidden_size = h
        self.query = Linear(h, config.n_relations * h, True, **kw)
        self.key = Linear(h, config.n_relations * h, True, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["dummy_node"] = jnp.zeros((1, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, query_layer, key_layer):
        # inputs are [S, B, H] (reference transposes before the head)
        q = self.query(params["query"], query_layer)
        dummy = jnp.broadcast_to(params["dummy_node"][None].astype(key_layer.dtype),
                                 (1, key_layer.shape[1], self.hidden_size))
        k = jnp.concatenate([key_layer, dummy], axis=0)
        k = self.key(params["key"], k)
        s_q, b = q.shape[0], q.shape[1]
        s_k = k.shape[0]
        q = q.reshape(s_q, b, self.n_relations, self.hidden_size)
        k = k.reshape(s_k, b, self.n_relations, self.hidden_size)
        return jnp.einsum("ibnd,jbnd->nbij", q, k)


class BrosPreTrainedModel(PreTrainedModel):
    config_class = BrosConfig
    base_model_prefix = "bros"
    _keys_to_ignore_on_load_unexpected = (r"position_ids$", r"inv_freq$",
                                          r"token_type_ids$")


class _BrosCore(Module):
    def __init__(self, config, add_pooling_layer=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = BrosTextEmbeddings(config, **kw)
        self.bbox_embeddings = BrosBboxEmbeddings(config, **kw)
        self.encoder = BrosEncoder(config, **kw)
        self.pooler = BrosPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids, bbox, attention_mask=None,
                 token_type_ids=None, position_ids=None):
        ids = jnp.asarray(input_ids)
        emb = self.embeddings(params["embeddings"], ids, token_type_ids,
                              position_ids)
        mask = None
        if attention_mask is not None:
            m = jnp.asarray(attention_mask)[:, None, None, :].astype(jnp.float32)
            mask = (1.0 - m) * jnp.finfo(jnp.float32).min
        bbox = jnp.asarray(bbox, jnp.float32)
        if bbox.shape[-1] == 4:
            bbox = bbox[:, :, jnp.asarray([0, 1, 2, 1, 2, 3, 0, 3])]
        pe = self.bbox_embeddings(params["bbox_embeddings"],
                                  bbox * self.config.bbox_scale)
        hidden, all_hidden = self.encoder(params["encoder"], emb, pe, mask)
        pooled = (self.pooler(params["pooler"], hidden)
                  if self.pooler is not None else None)
        return hidden, pooled, all_hidden


class BrosModel(BrosPreTrainedModel):
    def __init__(self, config: BrosConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        core = _BrosCore(config, dtype=self.dtype, param_dtype=self.param_dtype)
        for name, child in core._children.items():
            setattr(self, name, child)
        self._core = core
        self._children.pop("_core", None)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, position_ids=None,
                 **kwargs) -> BaseModelOutputWithPooling:
        hidden, pooled, all_hidden = self._core(params, input_ids, bbox,
                                                attention_mask, token_type_ids,
                                                position_ids)
        return BaseModelOutputWithPooling(last_hidden_state=hidden,
                                          pooler_output=pooled,
                                          hidden_states=all_hidden)


class BrosForTokenClassification(BrosPreTrainedModel):
    def __init__(self, config: BrosConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.bros = _BrosCore(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 bbox_first_token_mask=None, token_type_ids=None,
                 position_ids=None, labels=None, **kwargs) -> TokenClassifierOutput:
        hidden, _, all_hidden = self.bros(params["bros"], input_ids, bbox,
                                          attention_mask, token_type_ids,
                                          position_ids)
        logits = self.classifier(params["classifier"], hidden)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, jnp.asarray(labels)[..., None],
                                       axis=-1)[..., 0]
            if bbox_first_token_mask is not None:
                valid = jnp.asarray(bbox_first_token_mask).astype(bool)
                loss = jnp.sum(jnp.where(valid, nll, 0)) / jnp.maximum(valid.sum(), 1)
            else:
                loss = nll.mean()
        return TokenClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=all_hidden)


class BrosSpadeEEForTokenClassification(BrosPreTrainedModel):
    def __init__(self, config: BrosConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.bros = _BrosCore(config, **kw)
        self.initial_token_classifier = _Container({
            "1": Linear(config.hidden_size, config.hidden_size, True, **lkw),
            "3": Linear(config.hidden_size, config.num_labels, True, **lkw)}, **kw)
        self.subsequent_token_classifier = BrosRelationExtractor(config, **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 bbox_first_token_mask=None, token_type_ids=None,
                 position_ids=None, initial_token_labels=None,
                 subsequent_token_labels=None, **kwargs) -> BrosSpadeOutput:
        hidden, _, all_hidden = self.bros(params["bros"], input_ids, bbox,
                                          attention_mask, token_type_ids,
                                          position_ids)
        hs = hidden.transpose(1, 0, 2)  # [S, B, H]
        mods = self.initial_token_classifier._children
        p = params["initial_token_classifier"]
        initial = mods["3"](p["3"], mods["1"](p["1"], hs)).transpose(1, 0, 2)
        subsequent = self.subsequent_token_classifier(
            params["subsequent_token_classifier"], hs, hs)[0]
        b, s = jnp.asarray(input_ids).shape
        neg = jnp.finfo(subsequent.dtype).min
        if attention_mask is not None:
            inv = 1 - jnp.asarray(attention_mask)
            invalid = jnp.concatenate([inv, jnp.zeros((b, 1), inv.dtype)],
                                      axis=1).astype(bool)
            subsequent = jnp.where(invalid[:, None, :], neg, subsequent)
        self_mask = jnp.eye(s, s + 1, dtype=bool)
        subsequent = jnp.where(self_mask[None], neg, subsequent)
        return BrosSpadeOutput(initial_token_logits=initial,
                               subsequent_token_logits=subsequent,
                               hidden_states=all_hidden)


class BrosSpadeELForTokenClassification(BrosPreTrainedModel):
    def __init__(self, config: BrosConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.bros = _BrosCore(config, **kw)
        self.entity_linker = BrosRelationExtractor(config, **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 bbox_first_token_mask=None, token_type_ids=None,
                 position_ids=None, labels=None, **kwargs) -> TokenClassifierOutput:
        hidden, _, all_hidden = self.bros(params["bros"], input_ids, bbox,
                                          attention_mask, token_type_ids,
                                          position_ids)
        hs = hidden.transpose(1, 0, 2)
        logits = self.entity_linker(params["entity_linker"], hs, hs)[0]
        return TokenClassifierOutput(logits=logits, hidden_states=all_hidden)
