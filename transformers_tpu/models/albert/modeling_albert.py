"""ALBERT encoder, TPU-native.

Semantics match reference src/transformers/models/albert/modeling_albert.py:
factorized embeddings (embedding_size) projected by
``encoder.embedding_hidden_mapping_in`` (:263), CROSS-LAYER PARAMETER SHARING
— ``num_hidden_groups`` layer groups each applied
``num_hidden_layers / num_hidden_groups`` times (:276), post-LN attention
(LayerNorm(x + attn), :200) and ffn (full_layer_layer_norm, :231), tanh
pooler on CLS (:403), MLM head dense→act→LN→tied decoder with its own bias
(:512-527). Checkpoint layout: ``albert.{embeddings,encoder,pooler}``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    SequenceClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertEmbeddings
from .configuration_albert import AlbertConfig


class AlbertEmbeddings(BertEmbeddings):
    def __init__(self, config, *, dtype, param_dtype):
        import copy

        shim = copy.copy(config)
        shim.hidden_size = config.embedding_size
        super().__init__(shim, dtype=dtype, param_dtype=param_dtype)


class AlbertAttention(Module):
    """Post-LN attention: LayerNorm(x + dense(attn)) (reference :138-200)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        out = self.dense(params["dense"], out.reshape(b, s, e))
        return self.LayerNorm(params["LayerNorm"], hidden + out)


class AlbertLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.attention = AlbertAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.ffn = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.ffn_output = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.full_layer_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                               dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attn_args):
        attn = self.attention(params["attention"], hidden, attn_args)
        h = self.ffn_output(params["ffn_output"], self.act(self.ffn(params["ffn"], attn)))
        return self.full_layer_layer_norm(params["full_layer_layer_norm"], h + attn)


class AlbertLayerGroup(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.albert_layers = [AlbertLayer(config, dtype=dtype, param_dtype=param_dtype)
                              for _ in range(config.inner_group_num)]

    def __call__(self, params, hidden, attn_args):
        for i, layer in enumerate(self.albert_layers):
            hidden = layer(params["albert_layers"][str(i)], hidden, attn_args)
        return hidden


class AlbertTransformer(Module):
    """Shared-group layer loop (reference :258-286): the SAME group params are
    applied num_hidden_layers / num_hidden_groups times — cross-layer
    parameter sharing, ALBERT's defining trick."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embedding_hidden_mapping_in = Linear(
            config.embedding_size, config.hidden_size, True, dtype=dtype,
            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.albert_layer_groups = [AlbertLayerGroup(config, dtype=dtype, param_dtype=param_dtype)
                                    for _ in range(config.num_hidden_groups)]

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        hidden = self.embedding_hidden_mapping_in(params["embedding_hidden_mapping_in"], hidden)
        cfg = self.config
        all_hidden = [] if output_hidden_states else None
        for i in range(cfg.num_hidden_layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            group_idx = int(i / (cfg.num_hidden_layers / cfg.num_hidden_groups))
            hidden = self.albert_layer_groups[group_idx](
                params["albert_layer_groups"][str(group_idx)], hidden, attn_args)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class AlbertModel(Module):
    def __init__(self, config: AlbertConfig, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = AlbertEmbeddings(config, **kw)
        self.encoder = AlbertTransformer(config, **kw)
        if add_pooling_layer:
            self.pooler = Linear(config.hidden_size, config.hidden_size, True,
                                 dtype=dtype, param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        else:
            self.pooler = None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = jnp.tanh(self.pooler(params["pooler"], hidden[:, 0]))
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class AlbertPreTrainedModel(PreTrainedModel):
    config_class = AlbertConfig
    base_model_prefix = "albert"


class AlbertModelStandalone(AlbertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.albert = AlbertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.albert(params["albert"], *args, **kwargs)


class AlbertForMaskedLM(AlbertPreTrainedModel):
    """dense -> act -> LN -> tied decoder + bias (reference :512-527)."""

    _keys_to_ignore_on_load_unexpected = (r"predictions\.decoder\.", r"\.position_ids$",
                                          r"^sop_classifier\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.albert = AlbertModel(config, **kw, add_pooling_layer=False)
        self.predictions = _AlbertMLMHead(config, **kw)
        self.vocab_size = config.vocab_size

    def get_input_embedding_path(self):
        return "albert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs) -> MaskedLMOutput:
        out = self.albert(params["albert"], input_ids, attention_mask, token_type_ids, **kwargs)
        logits = self.predictions(
            params["predictions"], out.last_hidden_state,
            params["albert"]["embeddings"]["word_embeddings"]["weight"])
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)


class _AlbertMLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.embedding_size, True, **kw)
        self.LayerNorm = LayerNorm(config.embedding_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, embedding_table):
        h = self.LayerNorm(params["LayerNorm"], self.act(self.dense(params["dense"], hidden)))
        logits = jnp.dot(h.astype(self.dtype), embedding_table.astype(self.dtype).T)
        return logits + params["bias"].astype(self.dtype)


class AlbertForSequenceClassification(AlbertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.albert = AlbertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 kernel_init=normal_init(config.initializer_range))
        self.num_labels = config.num_labels

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs):
        out = self.albert(params["albert"], input_ids, attention_mask, token_type_ids, **kwargs)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)
