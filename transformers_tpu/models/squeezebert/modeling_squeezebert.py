"""SqueezeBERT, TPU-native (reference
src/transformers/models/squeezebert/modeling_squeezebert.py).

BERT where every dense projection is a grouped pointwise (1x1) convolution —
block-diagonal linear maps, expressed here as one grouped einsum per
projection (batched MXU matmuls; no NCW permute dance).  Embeddings, pooler
and the MLM head are standard BERT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutputWithPooling, MaskedLMOutput,
                                 QuestionAnsweringModelOutput,
                                 SequenceClassifierOutput,
                                 TokenClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import to_additive
from ..bert.modeling_bert import BertEmbeddings, BertPooler, _BertOnlyMLMHead
from .configuration_squeezebert import SqueezeBertConfig


class _GroupedPointwiseConv(Module):
    """torch Conv1d(kernel=1, groups=g) == block-diagonal linear
    (checkpoint weight [cout, cin/g, 1])."""

    def __init__(self, cin, cout, groups, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.cin, self.cout, self.groups = cin, cout, groups

    def init(self, rng):
        import math

        kw, kb = jax.random.split(rng)
        fan_in = self.cin // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        return {"weight": jax.random.uniform(
            kw, (self.cout, self.cin // self.groups, 1), self.param_dtype,
            -bound, bound),
            "bias": jax.random.uniform(kb, (self.cout,), self.param_dtype,
                                       -bound, bound)}

    def __call__(self, params, x):  # [b, s, cin]
        g = self.groups
        w = params["weight"].astype(self.dtype)[..., 0]      # [cout, cin/g]
        b, s, _ = x.shape
        xg = x.reshape(b, s, g, self.cin // g)
        wg = w.reshape(g, self.cout // g, self.cin // g)
        out = jnp.einsum("bsgi,goi->bsgo", xg, wg).reshape(b, s, self.cout)
        return out + params["bias"].astype(self.dtype)


class SqueezeBertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        c = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = c // config.num_attention_heads
        self.query = _GroupedPointwiseConv(c, c, config.q_groups, **kw)
        self.key = _GroupedPointwiseConv(c, c, config.k_groups, **kw)
        self.value = _GroupedPointwiseConv(c, c, config.v_groups, **kw)

    def __call__(self, params, hidden, mask_bias):
        b, s, c = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (self.head_dim ** 0.5)
        scores = scores.astype(jnp.float32) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c)


class _ConvDropoutLayerNorm(Module):
    def __init__(self, cin, cout, groups, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.conv1d = _GroupedPointwiseConv(cin, cout, groups, dtype=dtype,
                                            param_dtype=param_dtype)
        self.layernorm = LayerNorm(cout, 1e-12, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x, residual):
        h = self.conv1d(params["conv1d"], x)
        return self.layernorm(params["layernorm"], h + residual)


class _ConvActivation(Module):
    def __init__(self, cin, cout, groups, act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.conv1d = _GroupedPointwiseConv(cin, cout, groups, dtype=dtype,
                                            param_dtype=param_dtype)
        self.act = get_activation(act)

    def __call__(self, params, x):
        return self.act(self.conv1d(params["conv1d"], x))


class SqueezeBertModule(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        c = config.hidden_size
        self.attention = SqueezeBertSelfAttention(config, **kw)
        self.post_attention = _ConvDropoutLayerNorm(c, c, config.post_attention_groups, **kw)
        self.intermediate = _ConvActivation(c, config.intermediate_size,
                                            config.intermediate_groups,
                                            config.hidden_act, **kw)
        self.output = _ConvDropoutLayerNorm(config.intermediate_size, c,
                                            config.output_groups, **kw)

    def __call__(self, params, hidden, mask_bias):
        attn = self.attention(params["attention"], hidden, mask_bias)
        post = self.post_attention(params["post_attention"], attn, hidden)
        inter = self.intermediate(params["intermediate"], post)
        return self.output(params["output"], inter, post)


class SqueezeBertModel(Module):
    def __init__(self, config: SqueezeBertConfig, *, dtype, param_dtype,
                 add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BertEmbeddings(config, **kw)
        self.encoder = _Encoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

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
        for i, layer in enumerate(self.encoder.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["encoder"]["layers"][str(i)], hidden, mask_bias)
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
        self.layers = [SqueezeBertModule(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]


class SqueezeBertPreTrainedModel(PreTrainedModel):
    config_class = SqueezeBertConfig
    base_model_prefix = "transformer"
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.",
                                          r"\.position_ids$")


class SqueezeBertModelStandalone(SqueezeBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = SqueezeBertModel(config, dtype=self.dtype,
                                            param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)


class SqueezeBertForMaskedLM(SqueezeBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = SqueezeBertModel(config, add_pooling_layer=True, **kw)
        self.cls = _BertOnlyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "transformer.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, **kwargs) -> MaskedLMOutput:
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids, position_ids, inputs_embeds)
        table = params["transformer"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits)


class SqueezeBertForSequenceClassification(SqueezeBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = SqueezeBertModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        logits = self.classifier(params["classifier"], out.pooler_output)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class SqueezeBertForTokenClassification(SqueezeBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = SqueezeBertModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, labels=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        logits = self.classifier(params["classifier"], out.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits)


class SqueezeBertForQuestionAnswering(SqueezeBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = SqueezeBertModel(config, **kw)
        self.qa_outputs = Linear(config.hidden_size, 2, True,
                                 kernel_init=normal_init(config.initializer_range),
                                 **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, **kwargs):
        out = self.transformer(params["transformer"], input_ids, attention_mask,
                               token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start, end = jnp.split(logits, 2, axis=-1)
        return QuestionAnsweringModelOutput(start_logits=start[..., 0],
                                            end_logits=end[..., 0])
