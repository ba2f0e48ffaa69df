"""GPT-2, TPU-native (reference src/transformers/models/gpt2/modeling_gpt2.py).

The second decoder skeleton: learned absolute positions (wpe), LayerNorm,
fused Conv1D projections (``[in, out]`` checkpoint layout — Linear with
``transpose_at_load=False``), post-norm-free pre-LN blocks, tied lm_head.
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
from .configuration_gpt2 import GPT2Config


class GPT2Attention(Module):
    """Fused c_attn qkv + c_proj (reference modeling_gpt2.py GPT2Attention)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head
        self.scale = self.head_dim**-0.5 if config.scale_attn_weights else 1.0
        if config.scale_attn_by_inverse_layer_idx:
            self.scale = self.scale / float(layer_idx + 1)
        kw = dict(dtype=dtype, param_dtype=param_dtype, transpose_at_load=False,
                  kernel_init=normal_init(config.initializer_range))
        self.c_attn = Linear(config.n_embd, 3 * config.n_embd, True, **kw)
        self.c_proj = Linear(config.n_embd, config.n_embd, True, **kw)

    def __call__(self, params, hidden, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        qkv = self.c_attn(params["c_attn"], hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        out = out.reshape(b, s, e)
        return self.c_proj(params["c_proj"], out), cache


class GPT2MLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = config.n_inner if config.n_inner is not None else 4 * config.n_embd
        kw = dict(dtype=dtype, param_dtype=param_dtype, transpose_at_load=False,
                  kernel_init=normal_init(config.initializer_range))
        self.c_fc = Linear(config.n_embd, inner, True, **kw)
        self.c_proj = Linear(inner, config.n_embd, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.c_proj(params["c_proj"], self.act(self.c_fc(params["c_fc"], x)))


class GPT2Block(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.attn = GPT2Attention(config, layer_idx, **kw)
        self.ln_2 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.mlp = GPT2MLP(config, **kw)

    def __call__(self, params, hidden, attn_args, cache, cache_position):
        residual = hidden
        h = self.ln_1(params["ln_1"], hidden)
        h, cache = self.attn(params["attn"], h, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.ln_2(params["ln_2"], hidden)
        hidden = residual + self.mlp(params["mlp"], h)
        return hidden, cache


class GPT2Model(Module):
    """reference modeling_gpt2.py GPT2Model."""

    block_cls = GPT2Block

    def __init__(self, config: GPT2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.wte = Embedding(config.vocab_size, config.n_embd, embedding_init=normal_init(config.initializer_range), **kw)
        self.wpe = Embedding(config.n_positions, config.n_embd, embedding_init=normal_init(config.initializer_range), **kw)
        self.h = [self.block_cls(config, i, **kw) for i in range(config.n_layer)]
        self.ln_f = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)

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
            # Reference default: positions from cache_position (arange), NOT
            # mask-derived — callers with padded batches pass explicit
            # position_ids, exactly as the reference's generate() does.
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


class GPT2PreTrainedModel(PreTrainedModel):
    config_class = GPT2Config
    base_model_prefix = "transformer"


class GPT2LMHeadModel(GPT2PreTrainedModel, GenerationMixin):
    """reference modeling_gpt2.py GPT2LMHeadModel (lm_head tied to wte)."""

    _tp_plan = {
        r"transformer\.wte\.weight": "embed",
        r".*\.attn\.c_attn\.(weight|bias)": "colwise",
        r".*\.attn\.c_proj\.weight": "rowwise",
        r".*\.mlp\.c_fc\.(weight|bias)": "colwise",
        r".*\.mlp\.c_proj\.weight": "rowwise",
    }

    def __init__(self, config: GPT2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPT2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

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


class GPT2ModelStandalone(GPT2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPT2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)
