"""LiLT — Language-independent Layout Transformer (reference
models/lilt/modeling_lilt.py).

Two parallel streams: text at ``hidden_size`` and layout at
``hidden_size / channel_shrink_ratio`` (bbox corner/size embeddings each
``hidden/6`` wide, concatenated -> box_linear + box position embedding,
:126-180). Each layer runs both attentions and couples them BiACM-style —
the pre-softmax score of each stream is the SUM of both streams' scaled
scores (:219-260); then per-stream output/FFN blocks. RoBERTa pad-offset
positions; heads mirror the RoBERTa task heads (:646-915).
"""

from __future__ import annotations

import math

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
from ...ops.activations import get_activation
from ..bert.configuration_bert import BertConfig
from ..bert.modeling_bert import BertPooler


class LiltConfig(BertConfig):
    model_type = "lilt"

    def __init__(self, channel_shrink_ratio=4, max_2d_position_embeddings=1024,
                 **kwargs):
        self.channel_shrink_ratio = channel_shrink_ratio
        self.max_2d_position_embeddings = max_2d_position_embeddings
        kwargs.setdefault("pad_token_id", 0)
        super().__init__(**kwargs)


class LiltTextEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        self.padding_idx = config.pad_token_id
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **ekw)
        self.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **ekw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None):
        if position_ids is None:
            mask = (input_ids != self.padding_idx).astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + self.padding_idx
        if token_type_ids is None:
            token_type_ids = jnp.zeros(input_ids.shape, jnp.int32)
        h = (self.word_embeddings(params["word_embeddings"], input_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids)
             + self.position_embeddings(params["position_embeddings"], position_ids))
        return self.LayerNorm(params["LayerNorm"], h), position_ids


class LiltLayoutEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d6 = config.hidden_size // 6
        small = config.hidden_size // config.channel_shrink_ratio
        self.x_position_embeddings = Embedding(config.max_2d_position_embeddings, d6, **ekw)
        self.y_position_embeddings = Embedding(config.max_2d_position_embeddings, d6, **ekw)
        self.h_position_embeddings = Embedding(config.max_2d_position_embeddings, d6, **ekw)
        self.w_position_embeddings = Embedding(config.max_2d_position_embeddings, d6, **ekw)
        self.box_position_embeddings = Embedding(config.max_position_embeddings, small, **ekw)
        self.box_linear_embeddings = Linear(config.hidden_size, small, True, **lkw)
        self.LayerNorm = LayerNorm(small, config.layer_norm_eps, **kw)

    def __call__(self, params, bbox, position_ids):
        left = self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 0])
        upper = self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 1])
        right = self.x_position_embeddings(params["x_position_embeddings"], bbox[:, :, 2])
        lower = self.y_position_embeddings(params["y_position_embeddings"], bbox[:, :, 3])
        hh = self.h_position_embeddings(params["h_position_embeddings"],
                                        bbox[:, :, 3] - bbox[:, :, 1])
        ww = self.w_position_embeddings(params["w_position_embeddings"],
                                        bbox[:, :, 2] - bbox[:, :, 0])
        spatial = jnp.concatenate([left, upper, right, lower, hh, ww], axis=-1)
        spatial = self.box_linear_embeddings(params["box_linear_embeddings"], spatial)
        spatial = spatial + self.box_position_embeddings(
            params["box_position_embeddings"], position_ids)
        return self.LayerNorm(params["LayerNorm"], spatial)


class _SelfOutput(Module):
    """dense -> residual add -> LayerNorm (BertSelfOutput shape)."""

    def __init__(self, in_dim, out_dim, eps, init_range, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True,
                            kernel_init=normal_init(init_range), **kw)
        self.LayerNorm = LayerNorm(out_dim, eps, **kw)

    def __call__(self, params, h, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], h) + residual)


class _FFN(Module):
    def __init__(self, dim, inner, act, eps, init_range, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(init_range))
        inter = Module(**kw)
        inter.dense = Linear(dim, inner, True, **lkw)
        self.intermediate = inter
        out = Module(**kw)
        out.dense = Linear(inner, dim, True, **lkw)
        out.LayerNorm = LayerNorm(dim, eps, **kw)
        self.output = out
        self.act = get_activation(act)

    def __call__(self, params, h):
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], h))
        return self.output.LayerNorm(
            params["output"]["LayerNorm"],
            self.output.dense(params["output"]["dense"], inner) + h)


class LiltLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        r = config.channel_shrink_ratio
        self.num_heads = config.num_attention_heads
        self.head_dim = d // config.num_attention_heads
        self.small_head = self.head_dim // r

        attn = Module(**kw)
        sa = Module(**kw)
        sa.query = Linear(d, d, True, **lkw)
        sa.key = Linear(d, d, True, **lkw)
        sa.value = Linear(d, d, True, **lkw)
        sa.layout_query = Linear(d // r, d // r, True, **lkw)
        sa.layout_key = Linear(d // r, d // r, True, **lkw)
        sa.layout_value = Linear(d // r, d // r, True, **lkw)
        attn.self = sa
        attn.output = _SelfOutput(d, d, config.layer_norm_eps,
                                  config.initializer_range, **kw)
        attn.layout_output = _SelfOutput(d // r, d // r, config.layer_norm_eps,
                                         config.initializer_range, **kw)
        self.attention = attn
        self.text_ffn = _FFN(d, config.intermediate_size, config.hidden_act,
                             config.layer_norm_eps, config.initializer_range, **kw)
        self.layout_ffn = _FFN(d // r, config.intermediate_size // r,
                               config.hidden_act, config.layer_norm_eps,
                               config.initializer_range, **kw)

    def _heads(self, x, hd):
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)

    def __call__(self, params, hidden, layout, mask_bias):
        ap = params["attention"]
        sa = self.attention.self
        sp = ap["self"]
        q = self._heads(sa.query(sp["query"], hidden), self.head_dim)
        k = self._heads(sa.key(sp["key"], hidden), self.head_dim)
        v = self._heads(sa.value(sp["value"], hidden), self.head_dim)
        lq = self._heads(sa.layout_query(sp["layout_query"], layout), self.small_head)
        lk = self._heads(sa.layout_key(sp["layout_key"], layout), self.small_head)
        lv = self._heads(sa.layout_value(sp["layout_value"], layout), self.small_head)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        lscores = jnp.einsum("bhqd,bhkd->bhqk", lq, lk) / math.sqrt(self.small_head)
        text_scores = scores + lscores
        layout_scores = lscores + scores
        if mask_bias is not None:
            text_scores = text_scores + mask_bias
            layout_scores = layout_scores + mask_bias

        def ctx(s, vv, hd):
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(vv.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vv)
            b, h, q_, _ = o.shape
            return o.transpose(0, 2, 1, 3).reshape(b, q_, h * hd)

        hidden = self.attention.output(ap["output"],
                                       ctx(text_scores, v, self.head_dim), hidden)
        layout = self.attention.layout_output(ap["layout_output"],
                                              ctx(layout_scores, lv, self.small_head),
                                              layout)
        return (self.text_ffn(params["text_ffn"], hidden),
                self.layout_ffn(params["layout_ffn"], layout))


class LiltModel(Module):
    # reference stores FFN params as layer.{intermediate,output} and
    # layer.layout_{intermediate,layout_output}; map our nested names
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = LiltTextEmbeddings(config, **kw)
        self.layout_embeddings = LiltLayoutEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [LiltLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, position_ids=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        b, s = input_ids.shape
        if bbox is None:
            bbox = jnp.zeros((b, s, 4), jnp.int32)
        hidden, position_ids = self.embeddings(params["embeddings"], input_ids,
                                               token_type_ids, position_ids)
        layout = self.layout_embeddings(params["layout_embeddings"], bbox, position_ids)
        mask_bias = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, layout = layer(params["encoder"]["layer"][str(i)], hidden,
                                   layout, mask_bias)
        if output_hidden_states:
            all_hidden.append(hidden)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class LiltPreTrainedModel(PreTrainedModel):
    config_class = LiltConfig
    base_model_prefix = "lilt"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    from ...core.loading import WeightRule as _WR

    # checkpoint names the FFN blocks layer.{intermediate,output} (text) and
    # layer.{layout_intermediate,layout_output} — remap into our grouped
    # text_ffn/layout_ffn submodules (LiltLayer :363-420)
    _weight_rules = (
        _WR(pattern=r"^(.*\.layer\.\d+)\.layout_intermediate\.(.*)$",
            rename=r"\1.layout_ffn.intermediate.\2",
            save_pattern=r"^(.*\.layer\.\d+)\.layout_ffn\.intermediate\.(.*)$",
            save_rename=r"\1.layout_intermediate.\2"),
        _WR(pattern=r"^(.*\.layer\.\d+)\.layout_output\.(.*)$",
            rename=r"\1.layout_ffn.output.\2",
            save_pattern=r"^(.*\.layer\.\d+)\.layout_ffn\.output\.(.*)$",
            save_rename=r"\1.layout_output.\2"),
        _WR(pattern=r"^(.*\.layer\.\d+)\.intermediate\.(.*)$",
            rename=r"\1.text_ffn.intermediate.\2",
            save_pattern=r"^(.*\.layer\.\d+)\.text_ffn\.intermediate\.(.*)$",
            save_rename=r"\1.intermediate.\2"),
        _WR(pattern=r"^(.*\.layer\.\d+)\.output\.(.*)$",
            rename=r"\1.text_ffn.output.\2",
            save_pattern=r"^(.*\.layer\.\d+)\.text_ffn\.output\.(.*)$",
            save_rename=r"\1.output.\2"),
    )


class LiltModelStandalone(LiltPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.lilt = LiltModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.lilt(params["lilt"], *args, **kwargs)


class LiltClassificationHead(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.out_proj = Linear(config.hidden_size, config.num_labels, True, **kw)

    def __call__(self, params, hidden):
        x = jnp.tanh(self.dense(params["dense"], hidden[:, 0]))
        return self.out_proj(params["out_proj"], x)


class LiltForSequenceClassification(LiltPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.lilt = LiltModel(config, add_pooling_layer=False, **kw)
        self.classifier = LiltClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, **kwargs) -> SequenceClassifierOutput:
        out = self.lilt(params["lilt"], input_ids, bbox, attention_mask,
                        token_type_ids)
        return SequenceClassifierOutput(
            logits=self.classifier(params["classifier"], out.last_hidden_state))


class LiltForTokenClassification(LiltPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.lilt = LiltModel(config, add_pooling_layer=False, **kw)
        self.classifier = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, **kwargs) -> TokenClassifierOutput:
        out = self.lilt(params["lilt"], input_ids, bbox, attention_mask,
                        token_type_ids)
        return TokenClassifierOutput(
            logits=self.classifier(params["classifier"], out.last_hidden_state))


class LiltForQuestionAnswering(LiltPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.lilt = LiltModel(config, add_pooling_layer=False, **kw)
        self.qa_outputs = Linear(config.hidden_size, config.num_labels, True,
                                 kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, bbox=None, attention_mask=None,
                 token_type_ids=None, **kwargs) -> QuestionAnsweringModelOutput:
        out = self.lilt(params["lilt"], input_ids, bbox, attention_mask,
                        token_type_ids)
        logits = self.qa_outputs(params["qa_outputs"], out.last_hidden_state)
        start, end = jnp.split(logits, 2, axis=-1)
        return QuestionAnsweringModelOutput(start_logits=start.squeeze(-1),
                                            end_logits=end.squeeze(-1))
