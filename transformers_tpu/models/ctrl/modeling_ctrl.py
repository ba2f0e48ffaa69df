"""CTRL (reference models/ctrl/modeling_ctrl.py): Salesforce's control-code
LM — sqrt(d)-scaled embeddings + [sin|cos]-concat sinusoidal positions (:45),
pre-LN blocks whose causal mask is ADDITIVE -1e4 (:60, not -inf), ReLU FFN,
tied biased lm_head."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import (BaseModelOutputWithPast,
                                 CausalLMOutputWithPast)
from ...modeling_utils import PreTrainedModel


class CTRLConfig(PretrainedConfig):
    model_type = "ctrl"
    attribute_map = {"hidden_size": "n_embd", "num_attention_heads": "n_head",
                     "num_hidden_layers": "n_layer",
                     "max_position_embeddings": "n_positions"}

    def __init__(self, vocab_size=246534, n_positions=256, n_embd=1280, dff=8192,
                 n_layer=48, n_head=16, resid_pdrop=0.1, embd_pdrop=0.1,
                 layer_norm_epsilon=1e-6, initializer_range=0.02, use_cache=True,
                 **kwargs):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_embd = n_embd
        self.dff = dff
        self.n_layer = n_layer
        self.n_head = n_head
        self.resid_pdrop = resid_pdrop
        self.embd_pdrop = embd_pdrop
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        super().__init__(**kwargs)


def ctrl_positional_encoding(n_positions, d_model):
    pos = np.arange(n_positions, dtype=np.float64)[:, None]
    i = np.arange(d_model, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d_model)
    return np.concatenate([np.sin(angle[:, 0::2]), np.cos(angle[:, 1::2])], axis=-1)


class CTRLAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.n_head
        self.depth = config.n_embd // config.n_head
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        e = config.n_embd
        self.Wq = Linear(e, e, True, **kw)
        self.Wk = Linear(e, e, True, **kw)
        self.Wv = Linear(e, e, True, **kw)
        self.dense = Linear(e, e, True, **kw)

    def __call__(self, params, x, pad_bias=None):
        b, s, e = x.shape
        q = self.Wq(params["Wq"], x).reshape(b, s, self.num_heads, self.depth)
        k = self.Wk(params["Wk"], x).reshape(b, s, self.num_heads, self.depth)
        v = self.Wv(params["Wv"], x).reshape(b, s, self.num_heads, self.depth)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(self.depth)
        # additive -1e4 causal mask (reference :68), NOT -inf
        causal = jnp.triu(jnp.ones((s, s), jnp.float32), 1) * -1e4
        logits = logits + causal[None, None]
        if pad_bias is not None:
            logits = logits + pad_bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.dense(params["dense"], out)


class CTRLEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.multi_head_attention = CTRLAttention(config, **kw)
        ffn = Module(**kw)
        ffn._children["0"] = Linear(config.n_embd, config.dff, True, **kw2)
        ffn._children["2"] = Linear(config.dff, config.n_embd, True, **kw2)
        self.ffn = ffn
        self.layernorm1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.layernorm2 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)

    def __call__(self, params, x, pad_bias=None):
        normed = self.layernorm1(params["layernorm1"], x)
        x = x + self.multi_head_attention(params["multi_head_attention"], normed,
                                          pad_bias)
        out2 = self.layernorm2(params["layernorm2"], x)
        h = self.ffn._children["0"](params["ffn"]["0"], out2)
        h = jax.nn.relu(h)
        h = self.ffn._children["2"](params["ffn"]["2"], h)
        return x + h


class CTRLPreTrainedModel(PreTrainedModel):
    config_class = CTRLConfig
    base_model_prefix = "transformer"


class CTRLModel(CTRLPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.w = Embedding(config.vocab_size, config.n_embd,
                           embedding_init=normal_init(config.initializer_range), **kw)
        self.h = [CTRLEncoderLayer(config, **kw) for _ in range(config.n_layer)]
        self.layernorm = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.pos_encoding = jnp.asarray(
            ctrl_positional_encoding(config.n_positions, config.n_embd), jnp.float32)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.w(params["w"], input_ids)
        b, s, e = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        tt = 0.0
        if token_type_ids is not None:
            tt = self.w(params["w"], token_type_ids) * np.sqrt(e)
        hidden = (inputs_embeds * np.sqrt(e)
                  + self.pos_encoding[position_ids].astype(self.dtype) + tt)
        pad_bias = None
        if attention_mask is not None:
            pad_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                        * jnp.finfo(jnp.float32).min)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["h"][str(i)], hidden, pad_bias)
        hidden = self.layernorm(params["layernorm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class CTRLLMHeadModel(CTRLPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = CTRLModel(config, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.lm_head = Linear(config.n_embd, config.vocab_size, True,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    @property
    def tied_weights_keys(self):
        return ("lm_head.weight",)

    def tie_weights(self, params):
        params["lm_head"]["weight"] = params["transformer"]["w"]["weight"].T
        return params

    def get_input_embedding_path(self):
        return "transformer.w.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, output_hidden_states=False, **kwargs):
        outputs = self.transformer(params["transformer"], input_ids, attention_mask,
                                   token_type_ids, position_ids, inputs_embeds,
                                   output_hidden_states)
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      hidden_states=outputs.hidden_states)
