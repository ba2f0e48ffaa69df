"""GPT-NeoX decoder (reference src/transformers/models/gpt_neox/modeling_gpt_neox.py).

Deltas from the Llama skeleton: fused per-head-interleaved
``query_key_value`` projection, LayerNorm (with bias), partial rotary
(``rotary_pct``), and the parallel-residual block
``x + attn(ln1(x)) + mlp(ln2(x))``.
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
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_gpt_neox import GPTNeoXConfig


class GPTNeoXAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = getattr(config, "attention_bias", True)
        self.query_key_value = Linear(config.hidden_size, 3 * config.hidden_size, bias, **kw)
        self.dense = Linear(config.hidden_size, config.hidden_size, bias, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        qkv = self.query_key_value(params["query_key_value"], hidden)
        # Per-head interleaved packing: [B, S, H, 3*D] -> q/k/v
        # (reference modeling_gpt_neox.py GPTNeoXAttention.forward view+unbind).
        qkv = qkv.reshape(b, s, self.num_heads, 3 * self.head_dim)
        q = qkv[..., : self.head_dim]
        k = qkv[..., self.head_dim : 2 * self.head_dim]
        v = qkv[..., 2 * self.head_dim :]
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        out = out.reshape(b, s, e)
        return self.dense(params["dense"], out), cache


class GPTNeoXMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.dense_h_to_4h = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.dense_4h_to_h = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.dense_4h_to_h(params["dense_4h_to_h"], self.act(self.dense_h_to_4h(params["dense_h_to_4h"], x)))


class GPTNeoXLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.use_parallel_residual = config.use_parallel_residual
        self.input_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.attention = GPTNeoXAttention(config, layer_idx, **kw)
        self.mlp = GPTNeoXMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        attn_out, cache = self.attention(
            params["attention"], self.input_layernorm(params["input_layernorm"], hidden),
            cos, sin, attn_args, cache, cache_position,
        )
        if self.use_parallel_residual:
            mlp_out = self.mlp(params["mlp"], self.post_attention_layernorm(params["post_attention_layernorm"], hidden))
            hidden = hidden + attn_out + mlp_out
        else:
            hidden = hidden + attn_out
            mlp_out = self.mlp(params["mlp"], self.post_attention_layernorm(params["post_attention_layernorm"], hidden))
            hidden = hidden + mlp_out
        return hidden, cache


class GPTNeoXModel(Module):
    def __init__(self, config: GPTNeoXConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_in = Embedding(config.vocab_size, config.hidden_size,
                                  embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [GPTNeoXLayer(config, i, **kw) for i in range(config.num_hidden_layers)]
        self.final_layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

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
            inputs_embeds = self.embed_in(params["embed_in"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape
        if position_ids is None:
            # Reference default: positions from cache_position (arange), NOT
            # mask-derived — callers with padded batches pass explicit
            # position_ids, exactly as the reference's generate() does.
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling, dtype=self.dtype)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin, attn_args, cache, cache_position)
        hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class GPTNeoXPreTrainedModel(PreTrainedModel):
    config_class = GPTNeoXConfig
    base_model_prefix = "gpt_neox"


class GPTNeoXForCausalLM(GPTNeoXPreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.gpt_neox = GPTNeoXModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed_out = Linear(config.hidden_size, config.vocab_size, False, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "gpt_neox.embed_in.weight"

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
        outputs = self.gpt_neox(
            params["gpt_neox"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
        )
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.embed_out(params["embed_out"], hidden)
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


class GPTNeoXModelStandalone(GPTNeoXPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.gpt_neox = GPTNeoXModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.gpt_neox(params["gpt_neox"], *args, **kwargs)
