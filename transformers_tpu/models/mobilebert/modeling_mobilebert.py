"""MobileBERT, TPU-native (reference src/transformers/models/mobilebert/modeling_mobilebert.py).

Bottleneck BERT: 512-wide residual stream with 128-wide transformer compute
(bottleneck in/out projections per layer), trigram input embeddings, NoNorm
(elementwise affine) in place of LayerNorm, 4 stacked FFNs per layer, and an
MLM head whose projection is [tied embedding table ‖ learned extra rows].
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutputWithPooling, MaskedLMOutput,
                                 QuestionAnsweringModelOutput,
                                 SequenceClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import to_additive
from .configuration_mobilebert import MobileBertConfig


class NoNorm(Module):
    """Elementwise affine, no normalization (reference NoNorm)."""

    def __init__(self, dim, eps=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim

    def init(self, rng):
        return {"weight": jnp.ones((self.dim,), self.param_dtype),
                "bias": jnp.zeros((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        return x * params["weight"].astype(x.dtype) + params["bias"].astype(x.dtype)


def make_norm(config, dim, *, dtype, param_dtype):
    if config.normalization_type == "no_norm":
        return NoNorm(dim, dtype=dtype, param_dtype=param_dtype)
    return LayerNorm(dim, config.layer_norm_eps, dtype=dtype, param_dtype=param_dtype)


class MobileBertEmbeddings(Module):
    def __init__(self, config: MobileBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Embedding

        self.word_embeddings = Embedding(config.vocab_size, config.embedding_size,
                                         embedding_init=normal_init(config.initializer_range), **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size,
                                             embedding_init=normal_init(config.initializer_range), **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size,
                                               embedding_init=normal_init(config.initializer_range), **kw)
        mult = 3 if config.trigram_input else 1
        self.embedding_transformation = Linear(config.embedding_size * mult,
                                               config.hidden_size, True,
                                               kernel_init=normal_init(config.initializer_range), **kw)
        self.LayerNorm = make_norm(config, config.hidden_size, **kw)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        b, s = inputs_embeds.shape[:2]
        if self.config.trigram_input:
            nxt = jnp.pad(inputs_embeds[:, 1:], ((0, 0), (0, 1), (0, 0)))
            prv = jnp.pad(inputs_embeds[:, :-1], ((0, 0), (1, 0), (0, 0)))
            inputs_embeds = jnp.concatenate([nxt, inputs_embeds, prv], axis=2)
        if self.config.trigram_input or \
                self.config.embedding_size != self.config.hidden_size:
            inputs_embeds = self.embedding_transformation(
                params["embedding_transformation"], inputs_embeds)
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        emb = (inputs_embeds
               + self.position_embeddings(params["position_embeddings"], position_ids)
               + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))
        return self.LayerNorm(params["LayerNorm"], emb)


class MobileBertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        th = config.true_hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = th // config.num_attention_heads
        self.query = Linear(th, th, True, **kw)
        self.key = Linear(th, th, True, **kw)
        self.value = Linear(th if config.use_bottleneck_attention
                            else config.hidden_size, th, True, **kw)

    def __call__(self, params, q_in, k_in, v_in, mask_bias):
        b, s, _ = q_in.shape
        q = self.query(params["query"], q_in).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], k_in).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], v_in).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        scores = scores.astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(b, s, self.num_heads * self.head_dim)


class _DenseNorm(Module):
    """dense + norm(+residual) building block used all over MobileBERT."""

    def __init__(self, config, din, dout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(din, dout, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = make_norm(config, dout, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x, residual=None):
        h = self.dense(params["dense"], x)
        if residual is not None:
            h = h + residual
        return self.LayerNorm(params["LayerNorm"], h)


class MobileBertLayer(Module):
    def __init__(self, config: MobileBertConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lk = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.config = config
        th = config.true_hidden_size
        self.attention = _Attn(config, **kw)
        self.intermediate = _Intermediate(config, **kw)
        self.output = _Output(config, **kw)
        if config.use_bottleneck:
            self.bottleneck = _Bottleneck(config, **kw)
        if config.num_feedforward_networks > 1:
            self.ffn = [_FFNLayer(config, **kw)
                        for _ in range(config.num_feedforward_networks - 1)]

    def __call__(self, params, hidden, mask_bias):
        cfg = self.config
        if cfg.use_bottleneck:
            q, k, v, layer_input = self.bottleneck(params["bottleneck"], hidden)
        else:
            q = k = v = layer_input = hidden
        attn = self.attention(params["attention"], q, k, v, layer_input, mask_bias)
        if cfg.num_feedforward_networks != 1:
            for i, ffn in enumerate(self.ffn):
                attn = ffn(params["ffn"][str(i)], attn)
        inter = self.intermediate(params["intermediate"], attn)
        return self.output(params["output"], inter, attn, hidden)


class _Attn(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "self", MobileBertSelfAttention(config, **kw))
        self.output = _DenseNorm(config, config.true_hidden_size,
                                 config.true_hidden_size, **kw)

    def __call__(self, params, q, k, v, layer_input, mask_bias):
        ctx = getattr(self, "self")(params["self"], q, k, v, mask_bias)
        return self.output(params["output"], ctx, layer_input)


class _Intermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.true_hidden_size, config.intermediate_size,
                            True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class _Output(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.use_bottleneck = config.use_bottleneck
        self.dense = Linear(config.intermediate_size, config.true_hidden_size,
                            True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = make_norm(config, config.true_hidden_size, **kw)
        if config.use_bottleneck:
            self.bottleneck = _DenseNorm(config, config.true_hidden_size,
                                         config.hidden_size, **kw)

    def __call__(self, params, inter, residual1, residual2):
        h = self.dense(params["dense"], inter)
        h = self.LayerNorm(params["LayerNorm"], h + residual1)
        if self.use_bottleneck:
            h = self.bottleneck(params["bottleneck"], h, residual2)
        return h


class _Bottleneck(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        setattr(self, "input", _DenseNorm(config, config.hidden_size,
                                          config.intra_bottleneck_size, **kw))
        if config.key_query_shared_bottleneck:
            self.attention = _DenseNorm(config, config.hidden_size,
                                        config.intra_bottleneck_size, **kw)

    def __call__(self, params, hidden):
        bottlenecked = getattr(self, "input")(params["input"], hidden)
        if self.config.use_bottleneck_attention:
            return (bottlenecked,) * 4
        if self.config.key_query_shared_bottleneck:
            shared = self.attention(params["attention"], hidden)
            return shared, shared, hidden, bottlenecked
        return hidden, hidden, hidden, bottlenecked


class _FFNLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.intermediate = _Intermediate(config, **kw)
        self.output = _DenseNorm(config, config.intermediate_size,
                                 config.true_hidden_size, **kw)

    def __call__(self, params, x):
        inter = self.intermediate(params["intermediate"], x)
        return self.output(params["output"], inter, x)


class MobileBertModel(Module):
    def __init__(self, config: MobileBertConfig, *, dtype, param_dtype,
                 add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = MobileBertEmbeddings(config, **kw)
        self.encoder = _Encoder(config, **kw)
        self.pooler = _Pooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        mask = (attention_mask if attention_mask is not None
                else jnp.ones((b, s), jnp.int32))
        mask_bias = to_additive(mask.astype(bool)[:, None, None, :], jnp.float32)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, mask_bias)
        if output_hidden_states:
            all_hidden.append(hidden)
        pooled = (self.pooler(params["pooler"], hidden)
                  if self.pooler is not None else None)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _Encoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [MobileBertLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


class _Pooler(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.do_activate = config.classifier_activation
        if self.do_activate:
            self.dense = Linear(config.hidden_size, config.hidden_size, True,
                                dtype=dtype, param_dtype=param_dtype,
                                kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        first = hidden[:, 0]
        if not self.do_activate:
            return first
        return jnp.tanh(self.dense(params["dense"], first))


class MobileBertPreTrainedModel(PreTrainedModel):
    config_class = MobileBertConfig
    base_model_prefix = "mobilebert"
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.",
                                          r"\.position_ids$")


class MobileBertModelStandalone(MobileBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mobilebert = MobileBertModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.mobilebert(params["mobilebert"], *args, **kwargs)


class MobileBertForMaskedLM(MobileBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mobilebert = MobileBertModel(config, add_pooling_layer=False, **kw)
        self.cls = _OnlyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "mobilebert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, **kwargs) -> MaskedLMOutput:
        out = self.mobilebert(params["mobilebert"], input_ids, attention_mask,
                              token_type_ids, position_ids, inputs_embeds)
        table = params["mobilebert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class _OnlyMLMHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.predictions = _LMPredictionHead(config, dtype=dtype,
                                             param_dtype=param_dtype)

    def __call__(self, params, hidden, table):
        return self.predictions(params["predictions"], hidden, table)


class _LMPredictionHead(Module):
    """projection = [embedding_tableᵀ ‖ dense.weight] (reference
    MobileBertLMPredictionHead)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.transform = _HeadTransform(config, dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        params["dense"] = {"weight": (jax.random.normal(
            rng, (c.hidden_size - c.embedding_size, c.vocab_size))
            * c.initializer_range).astype(self.param_dtype)}
        params["bias"] = jnp.zeros((c.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden, table):
        h = self.transform(params["transform"], hidden)
        proj = jnp.concatenate(
            [table.astype(self.dtype).T,
             params["dense"]["weight"].astype(self.dtype)], axis=0)
        return jnp.dot(h.astype(self.dtype), proj) + params["bias"].astype(self.dtype)


class _HeadTransform(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.LayerNorm(params["LayerNorm"],
                              self.act(self.dense(params["dense"], x)))


class MobileBertForSequenceClassification(MobileBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mobilebert = MobileBertModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.mobilebert(params["mobilebert"], input_ids, attention_mask,
                              token_type_ids)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class MobileBertForQuestionAnswering(MobileBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.mobilebert = MobileBertModel(config, add_pooling_layer=False, **kw)
        self.qa_outputs = Linear(config.hidden_size, 2, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        out = self.mobilebert(params["mobilebert"], input_ids, attention_mask,
                              token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start, end = jnp.split(logits, 2, axis=-1)
        return QuestionAnsweringModelOutput(start_logits=start[..., 0],
                                            end_logits=end[..., 0])
