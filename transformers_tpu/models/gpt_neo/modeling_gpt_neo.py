"""GPT-Neo decoder, TPU-native.

Semantics match reference src/transformers/models/gpt_neo/modeling_gpt_neo.py:
UNSCALED attention in float32 (:105-119 ``_attn`` — no sqrt(d) division),
alternating global/local layers where local attention is a causal sliding
window of ``window_size`` (:61-66 ``tril XOR tril(-window)`` — i.e.
``kv > q - window``), bias-free q/k/v with biased out_proj (:84-87),
learned absolute positions (wpe), nn.Linear MLP ``c_fc``/``c_proj`` with
gelu_new, tied lm_head. Checkpoint layout:
``transformer.{wte,wpe,h.N.{ln_1,attn.attention.{q,k,v,out}_proj,ln_2,
mlp.{c_fc,c_proj}},ln_f}`` (note the nested ``attn.attention`` level).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_gpt_neo import GPTNeoConfig


class GPTNeoSelfAttention(Module):
    def __init__(self, config, attention_type, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        # local layers: causal window `kv > q - window_size`
        self.sliding_window = config.window_size if attention_type == "local" else None
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.k_proj = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.v_proj = Linear(config.hidden_size, config.hidden_size, False, **kw)
        self.out_proj = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        kwargs = dict(attn_args)
        kwargs["sliding_window"] = self.sliding_window
        # GPT-Neo does NOT scale attention scores (reference _attn :105-119)
        out = attn_fn(q, k, v, scale=1.0, **kwargs)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class GPTNeoAttention(Module):
    """Wrapper matching the reference's nested ``attn.attention`` module."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        attention_type = config.attention_layers[layer_idx]
        self.attention = GPTNeoSelfAttention(config, attention_type, layer_idx,
                                             dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, *args):
        return self.attention(params["attention"], *args)


class GPTNeoMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = config.intermediate_size or 4 * config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.c_fc = Linear(config.hidden_size, inner, True, **kw)
        self.c_proj = Linear(inner, config.hidden_size, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.c_proj(params["c_proj"], self.act(self.c_fc(params["c_fc"], x)))


class GPTNeoBlock(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln_1 = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.attn = GPTNeoAttention(config, layer_idx, **kw)
        self.ln_2 = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)
        self.mlp = GPTNeoMLP(config, **kw)

    def __call__(self, params, hidden, attn_args, cache, cache_position):
        residual = hidden
        h = self.ln_1(params["ln_1"], hidden)
        h, cache = self.attn(params["attn"], h, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.ln_2(params["ln_2"], hidden)
        hidden = residual + self.mlp(params["mlp"], h)
        return hidden, cache


class GPTNeoModel(Module):
    def __init__(self, config: GPTNeoConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        init = normal_init(config.initializer_range)
        self.wte = Embedding(config.vocab_size, config.hidden_size, embedding_init=init, **kw)
        self.wpe = Embedding(config.max_position_embeddings, config.hidden_size,
                             embedding_init=init, **kw)
        self.h = [GPTNeoBlock(config, i, **kw) for i in range(config.num_layers)]
        self.ln_f = LayerNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        inputs_embeds=None,
        output_hidden_states: bool = False,
    ) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.wte(params["wte"], input_ids)
        b, s, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        hidden = inputs_embeds + self.wpe(params["wpe"], position_ids)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, block in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = block(params["h"][str(i)], hidden, attn_args, cache, cache_position)
        hidden = self.ln_f(params["ln_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class GPTNeoPreTrainedModel(PreTrainedModel):
    config_class = GPTNeoConfig
    base_model_prefix = "transformer"


class GPTNeoForCausalLM(GPTNeoPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTNeoModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "transformer.wte.weight"

    def compute_logits(self, params, hidden):
        return self.transformer.wte.attend(params["transformer"]["wte"], hidden)

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values=None,
        cache_position=0,
        inputs_embeds=None,
        labels=None,
        logits_to_keep: int = 0,
        output_hidden_states: bool = False,
    ) -> CausalLMOutputWithPast:
        outputs = self.transformer(
            params["transformer"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
        )
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states,
        )

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation)


class GPTNeoModelStandalone(GPTNeoPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTNeoModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
