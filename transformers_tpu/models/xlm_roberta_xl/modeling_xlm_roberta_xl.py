"""XLM-RoBERTa-XL (reference models/xlm_roberta_xl/modeling_xlm_roberta_xl.py).

Pre-LN RoBERTa at XL/XXL scale: no embedding LayerNorm (:61-77), each block
normalizes *before* attention (``self_attn_layer_norm``, :344-374) and before
the FFN (``LayerNorm``, :402-467) with plain residual adds, and the encoder
applies one final LayerNorm (:469-497). Heads reuse the RoBERTa layouts
(``lm_head.{dense,layer_norm,decoder,bias}``, ``classifier.out_proj``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertPooler
from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import RobertaClassificationHead, RobertaLMHead


class XLMRobertaXLConfig(RobertaConfig):
    model_type = "xlm-roberta-xl"

    def __init__(self, vocab_size=250880, hidden_size=2560, num_hidden_layers=36,
                 num_attention_heads=32, intermediate_size=10240, **kwargs):
        kwargs.setdefault("max_position_embeddings", 514)
        kwargs.setdefault("type_vocab_size", 1)
        kwargs.setdefault("layer_norm_eps", 1e-5)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         intermediate_size=intermediate_size, **kwargs)


class _XLSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)

    def __call__(self, params, hidden, attn_args):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return out.reshape(b, s, e)


class _XLLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        attention = Module(**kw)
        setattr(attention, "self", _XLSelfAttention(config, **kw))
        out = Module(**kw)
        out.dense = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        attention.output = out
        attention.self_attn_layer_norm = LayerNorm(config.hidden_size,
                                                   config.layer_norm_eps, **kw)
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
        self.intermediate = inter
        outp = Module(**kw)
        outp.dense = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
        self.output = outp
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        from ...ops.activations import get_activation

        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attn_args):
        ap = params["attention"]
        normed = self.attention.self_attn_layer_norm(ap["self_attn_layer_norm"], hidden)
        attn = getattr(self.attention, "self")(ap["self"], normed, attn_args)
        hidden = self.attention.output.dense(ap["output"]["dense"], attn) + hidden
        normed = self.LayerNorm(params["LayerNorm"], hidden)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], normed))
        return self.output.dense(params["output"]["dense"], inner) + hidden


class XLMRobertaXLModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        embeddings = Module(**kw)
        embeddings.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        embeddings.position_embeddings = Embedding(config.max_position_embeddings,
                                                   config.hidden_size, **ekw)
        embeddings.token_type_embeddings = Embedding(config.type_vocab_size,
                                                     config.hidden_size, **ekw)
        self.embeddings = embeddings
        encoder = Module(**kw)
        encoder.layer = [_XLLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        encoder.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = encoder
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None
        self.padding_idx = config.pad_token_id

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 **kwargs) -> BaseModelOutputWithPooling:
        emb = params["embeddings"]
        if position_ids is None and input_ids is not None:
            mask = (input_ids != self.padding_idx).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        if inputs_embeds is None:
            inputs_embeds = self.embeddings.word_embeddings(emb["word_embeddings"], input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        h = (inputs_embeds
             + self.embeddings.position_embeddings(emb["position_embeddings"], position_ids)
             + self.embeddings.token_type_embeddings(emb["token_type_embeddings"], token_type_ids))
        b, s, _ = h.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, attn_args)
        h = self.encoder.LayerNorm(params["encoder"]["LayerNorm"], h)
        if output_hidden_states:
            all_hidden.append(h)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class XLMRobertaXLPreTrainedModel(PreTrainedModel):
    config_class = XLMRobertaXLConfig
    base_model_prefix = "roberta"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class XLMRobertaXLModelStandalone(XLMRobertaXLPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = XLMRobertaXLModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class XLMRobertaXLForMaskedLM(XLMRobertaXLPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roberta = XLMRobertaXLModel(config, add_pooling_layer=False, **kw)
        self.lm_head = RobertaLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "roberta.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds, output_hidden_states)
        table = params["roberta"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class XLMRobertaXLForSequenceClassification(XLMRobertaXLPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.roberta = XLMRobertaXLModel(config, add_pooling_layer=False, **kw)
        self.classifier = RobertaClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=outputs.hidden_states)


class XLMRobertaXLForTokenClassification(XLMRobertaXLPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roberta = XLMRobertaXLModel(config, add_pooling_layer=False, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None, **kwargs):
        outputs = self.roberta(params["roberta"], input_ids, attention_mask, token_type_ids,
                               position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_token_classification_loss

            loss = for_token_classification_loss(logits, labels, self.config)
        return TokenClassifierOutput(loss=loss, logits=logits,
                                     hidden_states=outputs.hidden_states)
