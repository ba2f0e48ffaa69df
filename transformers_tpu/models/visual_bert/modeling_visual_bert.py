"""VisualBERT (reference models/visual_bert/modeling_visual_bert.py).

BERT encoder over [text ‖ visual] tokens: visual region features are
projected to hidden size and given their own token-type / position
embeddings (optionally averaged over aligned text positions,
``image_text_alignment``, :106-165), then concatenated after the text
embeddings and run through the standard stack. Heads: pre-training
(``cls.predictions``) and multiple-choice/VQA poolers.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ..bert.configuration_bert import BertConfig
from ..bert.modeling_bert import BertEncoder, BertPooler, _BertOnlyMLMHead


class VisualBertConfig(BertConfig):
    model_type = "visual_bert"

    def __init__(self, visual_embedding_dim=512, bypass_transformer=False,
                 special_visual_initialize=True, **kwargs):
        self.visual_embedding_dim = visual_embedding_dim
        self.bypass_transformer = bypass_transformer
        self.special_visual_initialize = special_visual_initialize
        kwargs.setdefault("pad_token_id", 1)
        super().__init__(**kwargs)


class VisualBertEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **ekw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **ekw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.visual_token_type_embeddings = Embedding(config.type_vocab_size,
                                                      config.hidden_size, **ekw)
        self.visual_position_embeddings = Embedding(config.max_position_embeddings,
                                                    config.hidden_size, **ekw)
        self.visual_projection = Linear(config.visual_embedding_dim, config.hidden_size,
                                        True, kernel_init=normal_init(config.initializer_range),
                                        **kw)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 visual_embeds=None, visual_token_type_ids=None,
                 image_text_alignment=None):
        b, s = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        h = (self.word_embeddings(params["word_embeddings"], input_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids))
        if visual_embeds is not None:
            v = self.visual_projection(params["visual_projection"], visual_embeds)
            if visual_token_type_ids is None:
                visual_token_type_ids = jnp.ones(v.shape[:-1], jnp.int32)
            v_tt = self.visual_token_type_embeddings(
                params["visual_token_type_embeddings"], visual_token_type_ids)
            if image_text_alignment is not None:
                mask = (image_text_alignment != -1).astype(jnp.int32)
                aligned = mask * image_text_alignment
                v_pos = self.position_embeddings(params["position_embeddings"], aligned)
                v_pos = (v_pos * mask[..., None].astype(v_pos.dtype)).sum(axis=2)
                denom = jnp.maximum(mask.astype(v_pos.dtype).sum(axis=2), 1.0)
                v_pos = v_pos / denom[..., None]
                v_pos = v_pos + self.visual_position_embeddings(
                    params["visual_position_embeddings"],
                    jnp.zeros(v.shape[:-1], jnp.int32))
            else:
                v_pos = self.visual_position_embeddings(
                    params["visual_position_embeddings"],
                    jnp.zeros(v.shape[:-1], jnp.int32))
            v = v + v_tt + v_pos
            h = jnp.concatenate([h, v], axis=1)
        return self.LayerNorm(params["LayerNorm"], h)


class VisualBertModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = VisualBertEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, visual_embeds=None, visual_attention_mask=None,
                 visual_token_type_ids=None, image_text_alignment=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        h = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                            position_ids, visual_embeds, visual_token_type_ids,
                            image_text_alignment)
        b, total = h.shape[:2]
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        if visual_embeds is not None:
            if visual_attention_mask is None:
                visual_attention_mask = jnp.ones(visual_embeds.shape[:-1], jnp.int32)
            kv_valid = jnp.concatenate([attention_mask, visual_attention_mask], axis=1)
        else:
            kv_valid = attention_mask
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        h, all_hidden = self.encoder(params["encoder"], h, attn_args, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class VisualBertPreTrainedModel(PreTrainedModel):
    config_class = VisualBertConfig
    base_model_prefix = "visual_bert"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class VisualBertModelStandalone(VisualBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.visual_bert = VisualBertModel(config, dtype=self.dtype,
                                           param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.visual_bert(params["visual_bert"], *args, **kwargs)


class VisualBertForPreTraining(VisualBertPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",
                                          r"cls\.predictions\.decoder\.",
                                          r"cls\.seq_relationship\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.visual_bert = VisualBertModel(config, **kw)
        self.cls = _BertOnlyMLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "visual_bert.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, visual_embeds=None, visual_attention_mask=None,
                 visual_token_type_ids=None, labels=None, **kwargs) -> MaskedLMOutput:
        out = self.visual_bert(params["visual_bert"], input_ids, attention_mask,
                               token_type_ids, None, visual_embeds,
                               visual_attention_mask, visual_token_type_ids)
        table = params["visual_bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], out.last_hidden_state, table)
        return MaskedLMOutput(logits=logits)
