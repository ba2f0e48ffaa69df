"""GPT-J decoder, TPU-native.

Semantics match reference src/transformers/models/gptj/modeling_gptj.py:
interleaved partial rotary over ``rotary_dim`` (:46 sinusoid table, :57
rotate_every_two), bias-free MHA q/k/v/out projections (:98), GELU-new MLP
with biases (:368), parallel residual with one ``ln_1``
(:400-411 ``attn(ln(x)) + mlp(ln(x)) + x``), final ``ln_f``, and an lm_head
WITH bias (:573). Checkpoint layout: ``transformer.{wte,h.N,ln_f}``.
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
from ...ops.rope import apply_rotary_pos_emb_interleaved, compute_cos_sin_interleaved
from .configuration_gptj import GPTJConfig


def _gptj_inv_freq(rotary_dim: int):
    import numpy as np

    return 1.0 / (10000.0 ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim))


class GPTJAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(config.n_embd, config.n_embd, False, **kw)
        self.k_proj = Linear(config.n_embd, config.n_embd, False, **kw)
        self.v_proj = Linear(config.n_embd, config.n_embd, False, **kw)
        self.out_proj = Linear(config.n_embd, config.n_embd, False, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        q, k = apply_rotary_pos_emb_interleaved(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class GPTJMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = config.n_inner if config.n_inner is not None else 4 * config.n_embd
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.fc_in = Linear(config.n_embd, inner, True, **kw)
        self.fc_out = Linear(inner, config.n_embd, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.fc_out(params["fc_out"], self.act(self.fc_in(params["fc_in"], x)))


class GPTJBlock(Module):
    """Parallel residual with one norm (reference modeling_gptj.py:382)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.attn = GPTJAttention(config, layer_idx, **kw)
        self.mlp = GPTJMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.ln_1(params["ln_1"], hidden)
        attn_out, cache = self.attn(params["attn"], h, cos, sin, attn_args, cache, cache_position)
        mlp_out = self.mlp(params["mlp"], h)
        return attn_out + mlp_out + residual, cache


class GPTJModel(Module):
    def __init__(self, config: GPTJConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.wte = Embedding(config.vocab_size, config.n_embd,
                             embedding_init=normal_init(config.initializer_range), **kw)
        self.h = [GPTJBlock(config, i, **kw) for i in range(config.n_layer)]
        self.ln_f = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.rotary_dim = config.rotary_dim or config.n_embd // config.n_head
        self.inv_freq = _gptj_inv_freq(self.rotary_dim)

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
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin_interleaved(position_ids, self.inv_freq, dtype=self.dtype)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.h):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["h"][str(i)], hidden, cos, sin, attn_args, cache, cache_position)
        hidden = self.ln_f(params["ln_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class GPTJPreTrainedModel(PreTrainedModel):
    config_class = GPTJConfig
    base_model_prefix = "transformer"


class GPTJForCausalLM(GPTJPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTJModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        # lm_head carries a bias (reference modeling_gptj.py:573)
        self.lm_head = Linear(config.n_embd, config.vocab_size, True, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "transformer.wte.weight"

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
        logits = self.lm_head(params["lm_head"], hidden)
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


class GPTJModelStandalone(GPTJPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTJModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
