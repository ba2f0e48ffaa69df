"""RoBERTa-PreLayerNorm (reference
models/roberta_prelayernorm/modeling_roberta_prelayernorm.py).

fairseq's ``--encoder-normalize-before`` RoBERTa: the LayerNorm moves in
front of each sub-block (attention :286, intermediate :341), residual adds
are norm-free, and the model applies one final LayerNorm (:606).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertPooler, BertSelfAttention
from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import (RobertaEmbeddings, RobertaForMaskedLM,
                                        RobertaLMHead)


class RobertaPreLayerNormConfig(RobertaConfig):
    model_type = "roberta-prelayernorm"


class _PreLNAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self = BertSelfAttention(config, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        output = Module(dtype=dtype, param_dtype=param_dtype)
        output.dense = Linear(config.hidden_size, config.hidden_size, True,
                              kernel_init=normal_init(config.initializer_range), **kw)
        self.output = output

    def __call__(self, params, hidden, attn_args):
        pre = self.LayerNorm(params["LayerNorm"], hidden)
        out = self.self(params["self"], pre, attn_args)
        return self.output.dense(params["output"]["dense"], out) + hidden


class _PreLNLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _PreLNAttention(config, **kw)
        inter = Module(dtype=dtype, param_dtype=param_dtype)
        inter.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.intermediate = inter
        out = Module(dtype=dtype, param_dtype=param_dtype)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True,
                           kernel_init=normal_init(config.initializer_range), **kw)
        self.output = out
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attn_args):
        hidden = self.attention(params["attention"], hidden, attn_args)
        h = self.intermediate.LayerNorm(params["intermediate"]["LayerNorm"], hidden)
        h = self.act(self.intermediate.dense(params["intermediate"]["dense"], h))
        return self.output.dense(params["output"]["dense"], h) + hidden


class RobertaPreLayerNormPreTrainedModel(PreTrainedModel):
    config_class = RobertaPreLayerNormConfig
    base_model_prefix = "roberta_prelayernorm"


class RobertaPreLayerNormModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = RobertaEmbeddings(config, **kw)
        encoder = Module(dtype=dtype, param_dtype=param_dtype)
        encoder.layer = [_PreLNLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, attn_args)
        hidden = self.LayerNorm(params["LayerNorm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class RobertaPreLayerNormModelStandalone(RobertaPreLayerNormPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta_prelayernorm = RobertaPreLayerNormModel(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta_prelayernorm(params["roberta_prelayernorm"], *args, **kwargs)


class RobertaPreLayerNormForMaskedLM(RobertaPreLayerNormPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roberta_prelayernorm = RobertaPreLayerNormModel(
            config, add_pooling_layer=False, **kw)
        self.lm_head = RobertaLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "roberta_prelayernorm.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, output_hidden_states=False, **kwargs):
        from ...modeling_outputs import MaskedLMOutput

        outputs = self.roberta_prelayernorm(
            params["roberta_prelayernorm"], input_ids, attention_mask,
            token_type_ids, position_ids, inputs_embeds, output_hidden_states)
        table = params["roberta_prelayernorm"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits,
                              hidden_states=outputs.hidden_states)
