"""MarkupLM (reference models/markuplm/modeling_markuplm.py).

BERT encoder for web pages: each token carries an xpath (tag-id and
subscript-id per tree depth, padded to ``max_depth``); per-depth embedding
tables are concatenated and pushed through a 2-layer ReLU MLP into hidden
size, then ADDED to word+position+type embeddings (:45-207). Positions are
RoBERTa pad-offset style. Heads: QA / token / sequence classification
(:603-900).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    QuestionAnsweringModelOutput,
    SequenceClassifierOutput,
    TokenClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ..bert.configuration_bert import BertConfig
from ..bert.modeling_bert import BertEncoder, BertPooler


class MarkupLMConfig(BertConfig):
    model_type = "markuplm"

    def __init__(self, max_xpath_tag_unit_embeddings=256,
                 max_xpath_subs_unit_embeddings=1024, tag_pad_id=216,
                 subs_pad_id=1001, xpath_unit_hidden_size=32, max_depth=50, **kwargs):
        self.max_xpath_tag_unit_embeddings = max_xpath_tag_unit_embeddings
        self.max_xpath_subs_unit_embeddings = max_xpath_subs_unit_embeddings
        self.tag_pad_id = tag_pad_id
        self.subs_pad_id = subs_pad_id
        self.xpath_unit_hidden_size = xpath_unit_hidden_size
        self.max_depth = max_depth
        super().__init__(**kwargs)


class XPathEmbeddings(Module):
    """Per-depth tag/subscript tables -> concat -> inner MLP (:45-93)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.max_depth = config.max_depth
        unit = config.xpath_unit_hidden_size
        self.xpath_unitseq2_embeddings = Linear(unit * config.max_depth,
                                                config.hidden_size, True, **lkw)
        self.xpath_unitseq2_inner = Linear(unit * config.max_depth,
                                           4 * config.hidden_size, True, **lkw)
        self.inner2emb = Linear(4 * config.hidden_size, config.hidden_size, True, **lkw)
        self.xpath_tag_sub_embeddings = [
            Embedding(config.max_xpath_tag_unit_embeddings, unit, **ekw)
            for _ in range(config.max_depth)]
        self.xpath_subs_sub_embeddings = [
            Embedding(config.max_xpath_subs_unit_embeddings, unit, **ekw)
            for _ in range(config.max_depth)]

    def __call__(self, params, xpath_tags_seq, xpath_subs_seq):
        tags = jnp.concatenate(
            [emb(params["xpath_tag_sub_embeddings"][str(i)], xpath_tags_seq[:, :, i])
             for i, emb in enumerate(self.xpath_tag_sub_embeddings)], axis=-1)
        subs = jnp.concatenate(
            [emb(params["xpath_subs_sub_embeddings"][str(i)], xpath_subs_seq[:, :, i])
             for i, emb in enumerate(self.xpath_subs_sub_embeddings)], axis=-1)
        x = tags + subs
        h = jax.nn.relu(self.xpath_unitseq2_inner(params["xpath_unitseq2_inner"], x))
        return self.inner2emb(params["inner2emb"], h)


class MarkupLMEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.config = config
        self.padding_idx = config.pad_token_id
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **ekw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **ekw)
        self.xpath_embeddings = XPathEmbeddings(config, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids, xpath_tags_seq=None, xpath_subs_seq=None,
                 token_type_ids=None, position_ids=None):
        b, s = input_ids.shape
        cfg = self.config
        if position_ids is None:
            mask = (input_ids != self.padding_idx).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        if xpath_tags_seq is None:
            xpath_tags_seq = jnp.full((b, s, cfg.max_depth), cfg.tag_pad_id, jnp.int32)
        if xpath_subs_seq is None:
            xpath_subs_seq = jnp.full((b, s, cfg.max_depth), cfg.subs_pad_id, jnp.int32)
        h = (self.word_embeddings(params["word_embeddings"], input_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
             + self.xpath_embeddings(params["xpath_embeddings"], xpath_tags_seq,
                                     xpath_subs_seq))
        return self.LayerNorm(params["LayerNorm"], h)


class MarkupLMModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = MarkupLMEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, token_type_ids=None, position_ids=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        h = self.embeddings(params["embeddings"], input_ids, xpath_tags_seq,
                            xpath_subs_seq, token_type_ids, position_ids)
        attn_args = {"kv_valid": attention_mask, "is_causal": False}
        h, all_hidden = self.encoder(params["encoder"], h, attn_args,
                                     output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class MarkupLMPreTrainedModel(PreTrainedModel):
    config_class = MarkupLMConfig
    base_model_prefix = "markuplm"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class MarkupLMModelStandalone(MarkupLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.markuplm = MarkupLMModel(config, dtype=self.dtype,
                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.markuplm(params["markuplm"], *args, **kwargs)


class MarkupLMForQuestionAnswering(MarkupLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.markuplm = MarkupLMModel(config, add_pooling_layer=False, **kw)
        self.qa_outputs = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, token_type_ids=None,
                 **kwargs) -> QuestionAnsweringModelOutput:
        out = self.markuplm(params["markuplm"], input_ids, xpath_tags_seq,
                            xpath_subs_seq, attention_mask, token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start, end = jnp.split(logits, 2, axis=-1)
        return QuestionAnsweringModelOutput(start_logits=start.squeeze(-1),
                                            end_logits=end.squeeze(-1))


class MarkupLMForTokenClassification(MarkupLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.markuplm = MarkupLMModel(config, add_pooling_layer=False, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, token_type_ids=None,
                 **kwargs) -> TokenClassifierOutput:
        out = self.markuplm(params["markuplm"], input_ids, xpath_tags_seq,
                            xpath_subs_seq, attention_mask, token_type_ids)
        return TokenClassifierOutput(
            logits=self.classifier(params["classifier"], out.last_hidden_state))


class MarkupLMForSequenceClassification(MarkupLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.markuplm = MarkupLMModel(config, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, token_type_ids=None,
                 **kwargs) -> SequenceClassifierOutput:
        out = self.markuplm(params["markuplm"], input_ids, xpath_tags_seq,
                            xpath_subs_seq, attention_mask, token_type_ids)
        return SequenceClassifierOutput(
            logits=self.classifier(params["classifier"], out.pooler_output))
