"""RoCBert (reference models/roc_bert/modeling_roc_bert.py).

BERT body with robust Chinese embeddings: word + shape + pronunciation
streams either concatenated through ``map_inputs_layer`` (``concat_input``,
:121-169) or averaged (:122-143), then the standard BERT encoder and
``cls.predictions`` MLM head.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..bert.configuration_bert import BertConfig
from ..bert.modeling_bert import (
    BertEncoder,
    BertPooler,
    _BertOnlyMLMHead,
)


class RoCBertConfig(BertConfig):
    model_type = "roc_bert"

    def __init__(self, enable_pronunciation=True, enable_shape=True,
                 pronunciation_embed_dim=768, pronunciation_vocab_size=910,
                 shape_embed_dim=512, shape_vocab_size=24858, concat_input=True,
                 **kwargs):
        self.enable_pronunciation = enable_pronunciation
        self.enable_shape = enable_shape
        self.pronunciation_embed_dim = pronunciation_embed_dim
        self.pronunciation_vocab_size = pronunciation_vocab_size
        self.shape_embed_dim = shape_embed_dim
        self.shape_vocab_size = shape_vocab_size
        self.concat_input = concat_input
        super().__init__(**kwargs)


class RoCBertEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.config = config
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        self.pronunciation_embed = Embedding(config.pronunciation_vocab_size,
                                             config.pronunciation_embed_dim, **ekw)
        self.shape_embed = Embedding(config.shape_vocab_size, config.shape_embed_dim, **ekw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **ekw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **ekw)
        if config.concat_input:
            input_dim = config.hidden_size
            if config.enable_pronunciation:
                input_dim += config.pronunciation_embed_dim
            if config.enable_shape:
                input_dim += config.shape_embed_dim
            self.map_inputs_layer = Linear(input_dim, config.hidden_size, True,
                                           kernel_init=normal_init(config.initializer_range), **kw)
        else:
            self.map_inputs_layer = None
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids=None, input_shape_ids=None,
                 input_pronunciation_ids=None, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        b, s = inputs_embeds.shape[:2]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if self.map_inputs_layer is None:
            h = (inputs_embeds
                 + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
                 + self.position_embeddings(params["position_embeddings"], position_ids))
            h = self.LayerNorm(params["LayerNorm"], h)
            denom = 1.0
            out = h
            if cfg.enable_shape and input_shape_ids is not None:
                out = out + self.shape_embed(params["shape_embed"], input_shape_ids)
                denom += 1.0
            if cfg.enable_pronunciation and input_pronunciation_ids is not None:
                out = out + self.pronunciation_embed(params["pronunciation_embed"],
                                                     input_pronunciation_ids)
                denom += 1.0
            return out / denom
        parts = [inputs_embeds]
        if cfg.enable_shape:
            if input_shape_ids is None:
                input_shape_ids = jnp.zeros((b, s), jnp.int32)
            parts.append(self.shape_embed(params["shape_embed"], input_shape_ids))
        if cfg.enable_pronunciation:
            if input_pronunciation_ids is None:
                input_pronunciation_ids = jnp.zeros((b, s), jnp.int32)
            parts.append(self.pronunciation_embed(params["pronunciation_embed"],
                                                  input_pronunciation_ids))
        h = self.map_inputs_layer(params["map_inputs_layer"],
                                  jnp.concatenate(parts, axis=-1))
        h = (h + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids))
        return self.LayerNorm(params["LayerNorm"], h)


class RoCBertModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = RoCBertEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, input_shape_ids=None,
                 input_pronunciation_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 **kwargs):
        h = self.embeddings(params["embeddings"], input_ids, input_shape_ids,
                            input_pronunciation_ids, token_type_ids, position_ids,
                            inputs_embeds)
        b, s, _ = h.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        h, all_hidden = self.encoder(params["encoder"], h, attn_args, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        from ...modeling_outputs import BaseModelOutputWithPooling

        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class RoCBertPreTrainedModel(PreTrainedModel):
    config_class = RoCBertConfig
    base_model_prefix = "roc_bert"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class RoCBertModelStandalone(RoCBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roc_bert = RoCBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roc_bert(params["roc_bert"], *args, **kwargs)


class RoCBertForMaskedLM(RoCBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roc_bert = RoCBertModel(config, add_pooling_layer=False, **kw)
        self.cls = _BertOnlyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "roc_bert.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, input_shape_ids=None,
                 input_pronunciation_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        out = self.roc_bert(params["roc_bert"], input_ids, input_shape_ids,
                            input_pronunciation_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds, output_hidden_states)
        table = params["roc_bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class RoCBertForSequenceClassification(RoCBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.roc_bert = RoCBertModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, input_shape_ids=None,
                 input_pronunciation_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        out = self.roc_bert(params["roc_bert"], input_ids, input_shape_ids,
                            input_pronunciation_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=out.hidden_states)
