"""LXMERT (reference models/lxmert/modeling_lxmert.py).

Two-stream cross-modality encoder: ``l_layers`` BERT layers over text,
``r_layers`` over projected region features (visual feats + box coords each
LayerNorm'd and averaged, :452-477), then ``x_layers`` cross blocks — one
SHARED cross-attention applied in both directions, per-stream self-attention
and FFNs (:361-450). Pooler reads the language CLS; the QA head is a 2-layer
GeLU MLP (:602-614).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from dataclasses import dataclass
from typing import Any


class LxmertConfig(PretrainedConfig):
    model_type = "lxmert"

    def __init__(self, vocab_size=30522, hidden_size=768, num_attention_heads=12,
                 num_qa_labels=9500, num_object_labels=1600, num_attr_labels=400,
                 intermediate_size=3072, hidden_act="gelu", hidden_dropout_prob=0.1,
                 attention_probs_dropout_prob=0.1, max_position_embeddings=512,
                 type_vocab_size=2, initializer_range=0.02, layer_norm_eps=1e-12,
                 l_layers=9, x_layers=5, r_layers=5, visual_feat_dim=2048,
                 visual_pos_dim=4, visual_loss_normalizer=6.67, task_matched=True,
                 task_mask_lm=True, task_obj_predict=True, task_qa=True,
                 visual_obj_loss=True, visual_attr_loss=True, visual_feat_loss=True,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.num_qa_labels = num_qa_labels
        self.num_object_labels = num_object_labels
        self.num_attr_labels = num_attr_labels
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.l_layers = l_layers
        self.x_layers = x_layers
        self.r_layers = r_layers
        self.visual_feat_dim = visual_feat_dim
        self.visual_pos_dim = visual_pos_dim
        self.visual_loss_normalizer = visual_loss_normalizer
        self.task_matched = task_matched
        self.task_mask_lm = task_mask_lm
        self.task_obj_predict = task_obj_predict
        self.task_qa = task_qa
        self.visual_obj_loss = visual_obj_loss
        self.visual_attr_loss = visual_attr_loss
        self.visual_feat_loss = visual_feat_loss
        self.num_hidden_layers = {"language": l_layers, "cross_encoder": x_layers,
                                  "vision": r_layers}
        super().__init__(**kwargs)


@dataclass
class LxmertModelOutput(ModelOutput):
    language_output: Any = None
    vision_output: Any = None
    pooled_output: Any = None


class LxmertAttention(Module):
    """query from input, key/value from context (:217-268)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // config.num_attention_heads
        self.query = Linear(h, h, True, **kw)
        self.key = Linear(h, h, True, **kw)
        self.value = Linear(h, h, True, **kw)

    def __call__(self, params, hidden, context, ctx_mask_bias=None):
        b, s, e = hidden.shape
        sk = context.shape[1]
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], context).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.value(params["value"], context).reshape(b, sk, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.head_dim, jnp.float32))
        if ctx_mask_bias is not None:
            scores = scores + ctx_mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)


class _AttOut(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.hidden_size, config.hidden_size, True,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, 1e-12, dtype=dtype,
                                   param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"],
                              self.dense(params["dense"], hidden) + residual)


class _AttLayer(Module):
    """att + output (Self- and Cross- share this layout; checkpoint names
    ``self``/``att`` respectively)."""

    def __init__(self, config, attr, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        setattr(self, attr, LxmertAttention(config, **kw))
        self.attr = attr
        self.output = _AttOut(config, **kw)

    def __call__(self, params, hidden, context, ctx_mask_bias=None):
        att = getattr(self, self.attr)(params[self.attr], hidden, context, ctx_mask_bias)
        return self.output(params["output"], att, hidden)


class _FFN(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        inter = Module(dtype=dtype, param_dtype=param_dtype)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.inter = inter
        out = Module(dtype=dtype, param_dtype=param_dtype)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        out.LayerNorm = LayerNorm(config.hidden_size, 1e-12, dtype=dtype,
                                  param_dtype=param_dtype)
        self.out = out
        self.act = get_activation(config.hidden_act)


class LxmertLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.attention = _AttLayer(config, "self", **kw)
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
        self.intermediate = inter
        out = Module(**kw)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
        out.LayerNorm = LayerNorm(config.hidden_size, 1e-12, **kw)
        self.output = out
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, mask_bias):
        h = self.attention(params["attention"], hidden, hidden, mask_bias)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], h))
        o = self.output.dense(params["output"]["dense"], inner)
        return self.output.LayerNorm(params["output"]["LayerNorm"], o + h)


class LxmertXLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.visual_attention = _AttLayer(config, "att", **kw)
        self.lang_self_att = _AttLayer(config, "self", **kw)
        self.visn_self_att = _AttLayer(config, "self", **kw)
        for name in ("lang_inter", "visn_inter"):
            m = Module(**kw)
            m.dense = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
            setattr(self, name, m)
        for name in ("lang_output", "visn_output"):
            m = Module(**kw)
            m.dense = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
            m.LayerNorm = LayerNorm(config.hidden_size, 1e-12, **kw)
            setattr(self, name, m)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, lang, lang_bias, visual, visual_bias):
        lang_att = self.visual_attention(params["visual_attention"], lang, visual,
                                         visual_bias)
        visn_att = self.visual_attention(params["visual_attention"], visual, lang,
                                         lang_bias)
        lang_att = self.lang_self_att(params["lang_self_att"], lang_att, lang_att,
                                      lang_bias)
        visn_att = self.visn_self_att(params["visn_self_att"], visn_att, visn_att,
                                      visual_bias)
        li = self.act(self.lang_inter.dense(params["lang_inter"]["dense"], lang_att))
        vi = self.act(self.visn_inter.dense(params["visn_inter"]["dense"], visn_att))
        lang_out = self.lang_output.LayerNorm(
            params["lang_output"]["LayerNorm"],
            self.lang_output.dense(params["lang_output"]["dense"], li) + lang_att)
        visn_out = self.visn_output.LayerNorm(
            params["visn_output"]["LayerNorm"],
            self.visn_output.dense(params["visn_output"]["dense"], vi) + visn_att)
        return lang_out, visn_out


class LxmertModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        embeddings = Module(**kw)
        embeddings.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        embeddings.position_embeddings = Embedding(config.max_position_embeddings,
                                                   config.hidden_size, **ekw)
        embeddings.token_type_embeddings = Embedding(config.type_vocab_size,
                                                     config.hidden_size, **ekw)
        embeddings.LayerNorm = LayerNorm(config.hidden_size, 1e-12, **kw)
        self.embeddings = embeddings
        encoder = Module(**kw)
        visn_fc = Module(**kw)
        visn_fc.visn_fc = Linear(config.visual_feat_dim, config.hidden_size, True, **lkw)
        visn_fc.visn_layer_norm = LayerNorm(config.hidden_size, 1e-12, **kw)
        visn_fc.box_fc = Linear(config.visual_pos_dim, config.hidden_size, True, **lkw)
        visn_fc.box_layer_norm = LayerNorm(config.hidden_size, 1e-12, **kw)
        encoder.visn_fc = visn_fc
        encoder.layer = [LxmertLayer(config, **kw) for _ in range(config.l_layers)]
        encoder.x_layers = [LxmertXLayer(config, **kw) for _ in range(config.x_layers)]
        encoder.r_layers = [LxmertLayer(config, **kw) for _ in range(config.r_layers)]
        self.encoder = encoder
        pooler = Module(**kw)
        pooler.dense = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        self.pooler = pooler

    @staticmethod
    def _bias(mask):
        if mask is None:
            return None
        return ((1.0 - mask[:, None, None, :].astype(jnp.float32))
                * jnp.finfo(jnp.float32).min)

    def __call__(self, params, input_ids=None, visual_feats=None, visual_pos=None,
                 attention_mask=None, visual_attention_mask=None, token_type_ids=None,
                 **kwargs) -> LxmertModelOutput:
        emb = params["embeddings"]
        b, s = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        pos_ids = jnp.arange(s, dtype=jnp.int32)[None]
        lang = (self.embeddings.word_embeddings(emb["word_embeddings"], input_ids)
                + self.embeddings.position_embeddings(emb["position_embeddings"], pos_ids)
                + self.embeddings.token_type_embeddings(emb["token_type_embeddings"],
                                                        token_type_ids))
        lang = self.embeddings.LayerNorm(emb["LayerNorm"], lang)
        vp = params["encoder"]["visn_fc"]
        vf = self.encoder.visn_fc
        x = vf.visn_layer_norm(vp["visn_layer_norm"],
                               vf.visn_fc(vp["visn_fc"], visual_feats))
        y = vf.box_layer_norm(vp["box_layer_norm"], vf.box_fc(vp["box_fc"], visual_pos))
        visual = (x + y) / 2
        lang_bias = self._bias(attention_mask)
        visual_bias = self._bias(visual_attention_mask)
        for i, layer in enumerate(self.encoder.layer):
            lang = layer(params["encoder"]["layer"][str(i)], lang, lang_bias)
        for i, layer in enumerate(self.encoder.r_layers):
            visual = layer(params["encoder"]["r_layers"][str(i)], visual, visual_bias)
        for i, layer in enumerate(self.encoder.x_layers):
            lang, visual = layer(params["encoder"]["x_layers"][str(i)], lang, lang_bias,
                                 visual, visual_bias)
        pooled = jnp.tanh(self.pooler.dense(params["pooler"]["dense"], lang[:, 0]))
        return LxmertModelOutput(language_output=lang, vision_output=visual,
                                 pooled_output=pooled)


class LxmertPreTrainedModel(PreTrainedModel):
    config_class = LxmertConfig
    base_model_prefix = "lxmert"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class LxmertModelStandalone(LxmertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.lxmert = LxmertModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.lxmert(params["lxmert"], *args, **kwargs)


class LxmertForQuestionAnswering(LxmertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.lxmert = LxmertModel(config, **kw)
        head = Module(**kw)
        logit_fc = Module(**kw)
        setattr(logit_fc, "0", Linear(config.hidden_size, config.hidden_size * 2, True, **lkw))
        setattr(logit_fc, "2", LayerNorm(config.hidden_size * 2, 1e-12, **kw))
        setattr(logit_fc, "3", Linear(config.hidden_size * 2, config.num_qa_labels, True, **lkw))
        head.logit_fc = logit_fc
        self.answer_head = head

    def __call__(self, params, input_ids=None, visual_feats=None, visual_pos=None,
                 attention_mask=None, visual_attention_mask=None, token_type_ids=None,
                 labels=None, **kwargs):
        out = self.lxmert(params["lxmert"], input_ids, visual_feats, visual_pos,
                          attention_mask, visual_attention_mask, token_type_ids)
        fc = params["answer_head"]["logit_fc"]
        h = getattr(self.answer_head.logit_fc, "0")(fc["0"], out.pooled_output)
        h = jax.nn.gelu(h, approximate=False)
        h = getattr(self.answer_head.logit_fc, "2")(fc["2"], h)
        logits = getattr(self.answer_head.logit_fc, "3")(fc["3"], h)
        from ...modeling_outputs import SequenceClassifierOutput

        return SequenceClassifierOutput(logits=logits)
