"""OpenAI GPT(-1) (reference models/openai/modeling_openai.py): Conv1D
([in, out]) fused-qkv attention with a multiplicative tril mask plus -1e4
fill (:165), POST-LayerNorm blocks (:233), learned positions, tied lm head."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import (BaseModelOutputWithPast,
                                 CausalLMOutputWithPast)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation


class OpenAIGPTConfig(PretrainedConfig):
    model_type = "openai-gpt"
    attribute_map = {"hidden_size": "n_embd", "num_attention_heads": "n_head",
                     "num_hidden_layers": "n_layer",
                     "max_position_embeddings": "n_positions"}

    def __init__(self, vocab_size=40478, n_positions=512, n_embd=768, n_layer=12,
                 n_head=12, afn="gelu", resid_pdrop=0.1, embd_pdrop=0.1,
                 attn_pdrop=0.1, layer_norm_epsilon=1e-5, initializer_range=0.02,
                 **kwargs):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_embd = n_embd
        self.n_layer = n_layer
        self.n_head = n_head
        self.afn = afn
        self.resid_pdrop = resid_pdrop
        self.embd_pdrop = embd_pdrop
        self.attn_pdrop = attn_pdrop
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        super().__init__(**kwargs)


class OpenAIGPTAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head
        kw = dict(dtype=dtype, param_dtype=param_dtype, transpose_at_load=False,
                  kernel_init=normal_init(config.initializer_range))
        self.c_attn = Linear(config.n_embd, 3 * config.n_embd, True, **kw)
        self.c_proj = Linear(config.n_embd, config.n_embd, True, **kw)

    def __call__(self, params, x, pad_bias=None):
        b, s, e = x.shape
        qkv = self.c_attn(params["c_attn"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        tril = jnp.tril(jnp.ones((s, s), jnp.float32))[None, None]
        w = w * tril + -1e4 * (1 - tril)
        if pad_bias is not None:
            w = w + pad_bias
        probs = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.c_proj(params["c_proj"], out)


class OpenAIGPTBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype, transpose_at_load=False,
                   kernel_init=normal_init(config.initializer_range))
        self.attn = OpenAIGPTAttention(config, **kw)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        mlp = Module(**kw)
        mlp.c_fc = Linear(config.n_embd, 4 * config.n_embd, True, **kw2)
        mlp.c_proj = Linear(4 * config.n_embd, config.n_embd, True, **kw2)
        self.mlp = mlp
        self.ln_2 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.act = get_activation(config.afn)

    def __call__(self, params, x, pad_bias=None):
        a = self.attn(params["attn"], x, pad_bias)
        n = self.ln_1(params["ln_1"], x + a)
        m = self.mlp.c_proj(params["mlp"]["c_proj"],
                            self.act(self.mlp.c_fc(params["mlp"]["c_fc"], n)))
        return self.ln_2(params["ln_2"], n + m)


class OpenAIGPTPreTrainedModel(PreTrainedModel):
    config_class = OpenAIGPTConfig
    base_model_prefix = "transformer"


class OpenAIGPTModel(OpenAIGPTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   embedding_init=normal_init(config.initializer_range))
        self.tokens_embed = Embedding(config.vocab_size, config.n_embd, **ekw)
        self.positions_embed = Embedding(config.n_positions, config.n_embd, **ekw)
        self.h = [OpenAIGPTBlock(config, **kw) for _ in range(config.n_layer)]

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.tokens_embed(params["tokens_embed"], input_ids)
        b, s, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        hidden = inputs_embeds + self.positions_embed(params["positions_embed"],
                                                      position_ids)
        if token_type_ids is not None:
            hidden = hidden + self.tokens_embed(params["tokens_embed"], token_type_ids)
        pad_bias = None
        if attention_mask is not None:
            pad_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                        * jnp.finfo(jnp.float32).min)
        all_hidden = [] if output_hidden_states else None
        for i, block in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = block(params["h"][str(i)], hidden, pad_bias)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class OpenAIGPTLMHeadModel(OpenAIGPTPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = OpenAIGPTModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)
        self.lm_head = Linear(config.n_embd, config.vocab_size, False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    @property
    def tied_weights_keys(self):
        return ("lm_head.weight",)

    def tie_weights(self, params):
        params["lm_head"]["weight"] = \
            params["transformer"]["tokens_embed"]["weight"].T
        return params

    def get_input_embedding_path(self):
        return "transformer.tokens_embed.weight"

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
