"""LUKE (reference models/luke/modeling_luke.py): RoBERTa-style word stream +
an entity stream (entity embeddings span-pooled over their token positions),
jointly encoded with entity-aware attention — per-(source,target)-type query
projections (w2w / w2e / e2w / e2e, reference LukeSelfAttention)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from .configuration_luke import LukeConfig


@dataclass
class BaseLukeModelOutputWithPooling(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    entity_last_hidden_state: Optional[jnp.ndarray] = None
    pooler_output: Optional[jnp.ndarray] = None


class LukeEmbeddings(Module):
    """RoBERTa-style: position ids offset past the padding index."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        init = normal_init(config.initializer_range)
        d = config.hidden_size
        self.word_embeddings = Embedding(config.vocab_size, d, embedding_init=init, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, d,
                                             embedding_init=init, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, d,
                                               embedding_init=init, **kw)
        self.LayerNorm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.padding_idx = config.pad_token_id

    def __call__(self, params, input_ids, token_type_ids=None):
        mask = (input_ids != self.padding_idx).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        h = (self.word_embeddings(params["word_embeddings"], input_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))
        return self.LayerNorm(params["LayerNorm"], h)


class LukeEntityEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        init = normal_init(config.initializer_range)
        d = config.hidden_size
        self.config = config
        self.entity_embeddings = Embedding(config.entity_vocab_size,
                                           config.entity_emb_size,
                                           embedding_init=init, **kw)
        if config.entity_emb_size != d:
            self.entity_embedding_dense = Linear(config.entity_emb_size, d, False, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, d,
                                             embedding_init=init, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, d,
                                               embedding_init=init, **kw)
        self.LayerNorm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, entity_ids, position_ids, token_type_ids=None):
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(entity_ids)
        e = self.entity_embeddings(params["entity_embeddings"], entity_ids)
        if self.config.entity_emb_size != self.config.hidden_size:
            e = self.entity_embedding_dense(params["entity_embedding_dense"], e)
        # position_ids [B, E, L] with -1 padding -> mean of valid positions
        pe = self.position_embeddings(params["position_embeddings"],
                                      jnp.maximum(position_ids, 0))
        valid = (position_ids != -1).astype(pe.dtype)[..., None]
        pe = (pe * valid).sum(axis=-2) / jnp.maximum(valid.sum(axis=-2), 1e-7)
        te = self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
        return self.LayerNorm(params["LayerNorm"], e + pe + te)


class LukeSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        self.use_eaa = config.use_entity_aware_attention
        self.query = Linear(d, d, True, **kw)
        self.key = Linear(d, d, True, **kw)
        self.value = Linear(d, d, True, **kw)
        if self.use_eaa:
            self.w2e_query = Linear(d, d, True, **kw)
            self.e2w_query = Linear(d, d, True, **kw)
            self.e2e_query = Linear(d, d, True, **kw)

    def _heads(self, x):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def __call__(self, params, word_h, entity_h, bias):
        word_size = word_h.shape[1]
        concat = (word_h if entity_h is None
                  else jnp.concatenate([word_h, entity_h], axis=1))
        k = self._heads(self.key(params["key"], concat))
        v = self._heads(self.value(params["value"], concat))
        if self.use_eaa and entity_h is not None:
            w2w_q = self._heads(self.query(params["query"], word_h))
            w2e_q = self._heads(self.w2e_query(params["w2e_query"], word_h))
            e2w_q = self._heads(self.e2w_query(params["e2w_query"], entity_h))
            e2e_q = self._heads(self.e2e_query(params["e2e_query"], entity_h))
            kw_ = k[:, :, :word_size]
            ke = k[:, :, word_size:]
            w2w = jnp.einsum("bhqd,bhkd->bhqk", w2w_q, kw_)
            w2e = jnp.einsum("bhqd,bhkd->bhqk", w2e_q, ke)
            e2w = jnp.einsum("bhqd,bhkd->bhqk", e2w_q, kw_)
            e2e = jnp.einsum("bhqd,bhkd->bhqk", e2e_q, ke)
            word_scores = jnp.concatenate([w2w, w2e], axis=3)
            ent_scores = jnp.concatenate([e2w, e2e], axis=3)
            scores = jnp.concatenate([word_scores, ent_scores], axis=2)
        else:
            q = self._heads(self.query(params["query"], concat))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        scores = scores / math.sqrt(self.head_dim)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        if entity_h is None:
            return ctx, None
        return ctx[:, :word_size], ctx[:, word_size:]


class _Container(Module):
    """Registers children under arbitrary checkpoint-tree names (the torch
    module tree uses names like "self" that cannot be Python attributes)."""

    def __init__(self, children: dict, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        for name, child in children.items():
            self._children[name] = child


class LukeLayer(Module):
    """Checkpoint tree mirrored exactly: attention.{self,output.{dense,
    LayerNorm}}, intermediate.dense, output.{dense, LayerNorm}."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self._attn = LukeSelfAttention(config, **kw)
        self._attn_out = Linear(d, d, True, **kw)
        self._attn_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self._inter = Linear(d, config.intermediate_size, True, **kw)
        self._out = Linear(config.intermediate_size, d, True, **kw)
        self._out_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)
        self._children.clear()
        self._children["attention"] = _Container(
            {"self": self._attn,
             "output": _Container({"dense": self._attn_out,
                                   "LayerNorm": self._attn_norm}, **kw)}, **kw)
        self._children["intermediate"] = _Container({"dense": self._inter}, **kw)
        self._children["output"] = _Container({"dense": self._out,
                                               "LayerNorm": self._out_norm}, **kw)

    def __call__(self, params, word_h, entity_h, bias):
        word_size = word_h.shape[1]
        w_ctx, e_ctx = self._attn(params["attention"]["self"], word_h,
                                  entity_h, bias)
        concat_ctx = (w_ctx if e_ctx is None
                      else jnp.concatenate([w_ctx, e_ctx], axis=1))
        concat_in = (word_h if entity_h is None
                     else jnp.concatenate([word_h, entity_h], axis=1))
        h = self._attn_out(params["attention"]["output"]["dense"], concat_ctx)
        h = self._attn_norm(params["attention"]["output"]["LayerNorm"], h + concat_in)
        inter = self.act(self._inter(params["intermediate"]["dense"], h))
        out = self._out(params["output"]["dense"], inter)
        out = self._out_norm(params["output"]["LayerNorm"], out + h)
        if entity_h is None:
            return out, None
        return out[:, :word_size], out[:, word_size:]


class LukePreTrainedModel(PreTrainedModel):
    config_class = LukeConfig
    base_model_prefix = "luke"


class LukeModel(LukePreTrainedModel):
    def __init__(self, config: LukeConfig, *, dtype=jnp.float32, param_dtype=None,
                 add_pooling_layer: bool = True):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = LukeEmbeddings(config, **kw)
        self.entity_embeddings = LukeEntityEmbeddings(config, **kw)
        self.layers = [LukeLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.pooler_dense = Linear(config.hidden_size, config.hidden_size, True, **kw) \
            if add_pooling_layer else None
        # mirror the torch tree: encoder.layer.N + pooler.dense
        self._children.pop("layers", None)
        self._children.pop("pooler_dense", None)
        from ...core.module import ModuleList

        self._children["encoder"] = _Container(
            {"layer": ModuleList(self.layers)}, **kw)
        if self.pooler_dense is not None:
            self._children["pooler"] = _Container({"dense": self.pooler_dense}, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, entity_ids=None,
                 entity_attention_mask=None, entity_token_type_ids=None,
                 entity_position_ids=None, **kwargs) -> BaseLukeModelOutputWithPooling:
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        word_h = self.embeddings(params["embeddings"], input_ids, token_type_ids)
        if entity_ids is not None:
            if entity_attention_mask is None:
                entity_attention_mask = jnp.ones(entity_ids.shape, jnp.int32)
            mask = jnp.concatenate([attention_mask, entity_attention_mask], axis=1)
            entity_h = self.entity_embeddings(params["entity_embeddings"],
                                              entity_ids, entity_position_ids,
                                              entity_token_type_ids)
        else:
            mask = attention_mask
            entity_h = None
        bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * jnp.finfo(jnp.float32).min
        for i, layer in enumerate(self.layers):
            word_h, entity_h = layer(params["encoder"]["layer"][str(i)],
                                     word_h, entity_h, bias)
        pooled = None
        if self.pooler_dense is not None:
            pooled = jnp.tanh(self.pooler_dense(params["pooler"]["dense"],
                                                word_h[:, 0]))
        return BaseLukeModelOutputWithPooling(
            last_hidden_state=word_h, entity_last_hidden_state=entity_h,
            pooler_output=pooled)


class LukeModelStandalone(LukeModel):
    pass
