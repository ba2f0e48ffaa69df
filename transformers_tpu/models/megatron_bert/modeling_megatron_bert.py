"""MegatronBERT (reference src/transformers/models/megatron_bert/modeling_megatron_bert.py).

BERT skeleton rewired PRE-norm (Megatron-LM style): embeddings have NO
LayerNorm; each layer applies ``attention.ln`` before self-attention and
``ln`` before the FF, residuals add un-normed; one final ``encoder.ln``.
Checkpoint prefix ``bert.*`` (same as BERT)."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Module
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import (
    BertEmbeddings,
    BertIntermediate,
    BertModel,
    BertSelfAttention,
    _BertOnlyMLMHead,
)
from ...core.module import Linear, normal_init
from .configuration_megatron_bert import MegatronBertConfig


class MegatronBertEmbeddings(BertEmbeddings):
    """Sum only — no LayerNorm (reference MegatronBertEmbeddings)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        del self._children["LayerNorm"]
        object.__delattr__(self, "LayerNorm")

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        if position_ids is None:
            position_ids = self.position_ids(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        return (inputs_embeds
                + self.position_embeddings(params["position_embeddings"], position_ids)
                + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))


class MegatronBertLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.attention = _MegatronBertAttention(config, **kw)
        self.ln = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = _MegatronBertOutput(config, **lkw)

    def __call__(self, params, hidden, attn_args):
        attn_out = self.attention(params["attention"], hidden, attn_args)
        ln_out = self.ln(params["ln"], attn_out)
        inner = self.intermediate(params["intermediate"], ln_out)
        return self.output(params["output"], inner, attn_out)


class _MegatronBertAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.self = BertSelfAttention(config, **kw)
        self.output = _MegatronBertSelfOutput(config, **kw)

    def __call__(self, params, hidden, attn_args):
        ln_out = self.ln(params["ln"], hidden)
        out = self.self(params["self"], ln_out, attn_args)
        return self.output(params["output"], out, hidden)


class _MegatronBertSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, residual):
        return residual + self.dense(params["dense"], hidden)


class _MegatronBertOutput(Module):
    def __init__(self, config, *, dtype, param_dtype, **_):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, residual):
        return residual + self.dense(params["dense"], hidden)


class MegatronBertEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer = [MegatronBertLayer(config, **kw)
                      for _ in range(config.num_hidden_layers)]
        self.ln = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attn_args, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden, attn_args)
        hidden = self.ln(params["ln"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class MegatronBertModel(BertModel):
    embeddings_cls = MegatronBertEmbeddings
    encoder_cls = MegatronBertEncoder


class MegatronBertPreTrainedModel(PreTrainedModel):
    config_class = MegatronBertConfig
    base_model_prefix = "bert"


class MegatronBertModelStandalone(MegatronBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = MegatronBertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.bert(params["bert"], *args, **kwargs)


class MegatronBertForMaskedLM(MegatronBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = MegatronBertModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype, add_pooling_layer=False)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "bert.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.bert(params["bert"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds, output_hidden_states)
        table = params["bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
