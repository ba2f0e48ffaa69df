"""X-MOD (reference models/xmod/modeling_xmod.py).

RoBERTa body with per-language bottleneck adapters after each FFN
(:397-460): ``output.adapter_modules[lang]`` bottleneck of size
``hidden/adapter_reduction_factor``, with LayerNorm placement governed by
``ln_before_adapter`` / ``adapter_layer_norm`` / ``adapter_reuse_layer_norm``
and an optional fully pre-norm block layout (``pre_norm``, :352-377 and
:462-533, final encoder LayerNorm :543-569). ``lang_ids`` selects the
adapter per sample (default = ``config.default_language``); on TPU all
adapters are evaluated branchlessly and the result gathered by language id,
which keeps the program static for jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (
    BaseModelOutputWithPooling,
    MaskedLMOutput,
    SequenceClassifierOutput,
)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertPooler
from ..roberta.configuration_roberta import RobertaConfig
from ..roberta.modeling_roberta import RobertaClassificationHead, RobertaEmbeddings, RobertaLMHead


class XmodConfig(RobertaConfig):
    model_type = "xmod"

    def __init__(self, pre_norm=False, adapter_reduction_factor=2,
                 adapter_layer_norm=False, adapter_reuse_layer_norm=True,
                 ln_before_adapter=True, languages=("en_XX",), default_language=None,
                 **kwargs):
        self.pre_norm = pre_norm
        self.adapter_reduction_factor = adapter_reduction_factor
        self.adapter_layer_norm = adapter_layer_norm
        self.adapter_reuse_layer_norm = adapter_reuse_layer_norm
        self.ln_before_adapter = ln_before_adapter
        self.languages = list(languages)
        self.default_language = default_language
        super().__init__(**kwargs)


class XmodAdapter(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bottleneck = config.hidden_size // config.adapter_reduction_factor
        self.dense1 = Linear(config.hidden_size, bottleneck, True, **kw)
        self.dense2 = Linear(bottleneck, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.dense2(params["dense2"], self.act(self.dense1(params["dense1"], x)))


class _XmodSelfAttention(Module):
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
        return attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args).reshape(b, s, e)


class XmodLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        attention = Module(**kw)
        setattr(attention, "self", _XmodSelfAttention(config, **kw))
        aout = Module(**kw)
        aout.dense = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        aout.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        attention.output = aout
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(config.hidden_size, config.intermediate_size, True, **lkw)
        self.intermediate = inter
        out = Module(**kw)
        out.dense = Linear(config.intermediate_size, config.hidden_size, True, **lkw)
        out.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        if config.adapter_layer_norm:
            out.adapter_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        adapters = Module(**kw)
        for lang in config.languages:
            setattr(adapters, str(lang), XmodAdapter(config, **kw))
        out.adapter_modules = adapters
        self.output = out
        self.act = get_activation(config.hidden_act)
        self.pre_norm = config.pre_norm

    def _lang_adapter(self, params, hidden, lang_onehot):
        cfg = self.config
        if not cfg.ln_before_adapter:
            residual = hidden
        normed = hidden
        if cfg.adapter_layer_norm:
            normed = self.output.adapter_layer_norm(params["adapter_layer_norm"], hidden)
        elif cfg.adapter_reuse_layer_norm:
            normed = self.output.LayerNorm(params["LayerNorm"], hidden)
        if cfg.ln_before_adapter:
            residual = normed
        # evaluate every adapter, gather by language one-hot (jit-static)
        outs = []
        for lang in self.config.languages:
            adapter = getattr(self.output.adapter_modules, str(lang))
            outs.append(adapter(params["adapter_modules"][str(lang)], normed))
        stacked = jnp.stack(outs, axis=0)  # [L, B, S, E]
        mixed = jnp.einsum("lbse,bl->bse", stacked, lang_onehot.astype(stacked.dtype))
        return mixed + residual

    def __call__(self, params, hidden, attn_args, lang_onehot):
        ap = params["attention"]
        residual = hidden
        if self.pre_norm:
            hidden = self.attention.output.LayerNorm(ap["output"]["LayerNorm"], hidden)
        attn = getattr(self.attention, "self")(ap["self"], hidden, attn_args)
        attn = self.attention.output.dense(ap["output"]["dense"], attn) + residual
        if not self.pre_norm:
            attn = self.attention.output.LayerNorm(ap["output"]["LayerNorm"], attn)

        residual = attn
        ffn_in = attn
        if self.pre_norm:
            ffn_in = self.output.LayerNorm(params["output"]["LayerNorm"], ffn_in)
        inner = self.act(self.intermediate.dense(params["intermediate"]["dense"], ffn_in))
        h = self.output.dense(params["output"]["dense"], inner) + residual
        h = self._lang_adapter(params["output"], h, lang_onehot)
        if not self.pre_norm:
            h = self.output.LayerNorm(params["output"]["LayerNorm"], h)
        return h


class XmodModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = RobertaEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [XmodLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        if config.pre_norm:
            encoder.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.encoder = encoder
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, lang_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        h = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                            position_ids, inputs_embeds)
        b, s, _ = h.shape
        n_lang = len(self.config.languages)
        if lang_ids is None:
            if self.config.default_language is None:
                raise ValueError("Input language unknown: set config.default_language "
                                 "or pass lang_ids (reference XmodModel.forward).")
            idx = self.config.languages.index(self.config.default_language)
            lang_ids = jnp.full((b,), idx, jnp.int32)
        lang_onehot = jax.nn.one_hot(jnp.asarray(lang_ids, jnp.int32), n_lang)
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, attn_args, lang_onehot)
        if self.config.pre_norm:
            h = self.encoder.LayerNorm(params["encoder"]["LayerNorm"], h)
        if output_hidden_states:
            all_hidden.append(h)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class XmodPreTrainedModel(PreTrainedModel):
    config_class = XmodConfig
    base_model_prefix = "roberta"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class XmodModelStandalone(XmodPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.roberta = XmodModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.roberta(params["roberta"], *args, **kwargs)


class XmodForMaskedLM(XmodPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"lm_head\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.roberta = XmodModel(config, add_pooling_layer=False, **kw)
        self.lm_head = RobertaLMHead(config, **kw)

    def get_input_embedding_path(self):
        return "roberta.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, lang_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.roberta(params["roberta"], input_ids, lang_ids, attention_mask,
                               token_type_ids, position_ids, inputs_embeds,
                               output_hidden_states)
        table = params["roberta"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)


class XmodForSequenceClassification(XmodPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.roberta = XmodModel(config, add_pooling_layer=False, **kw)
        self.classifier = RobertaClassificationHead(config, **kw)

    def __call__(self, params, input_ids=None, lang_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, **kwargs):
        outputs = self.roberta(params["roberta"], input_ids, lang_ids, attention_mask,
                               token_type_ids, position_ids, inputs_embeds)
        logits = self.classifier(params["classifier"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits,
                                        hidden_states=outputs.hidden_states)
