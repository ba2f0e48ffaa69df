"""GPTBigCode (StarCoder), TPU-native.

Semantics match reference src/transformers/models/gpt_bigcode/
modeling_gpt_bigcode.py: GPT-2 skeleton (wte+wpe, pre-LN blocks, tied head)
with **multi-query attention** — ``c_attn`` projects Q (n_embd) plus a single
shared K/V pair (2·head_dim) — and plain ``nn.Linear`` weights ([out, in],
transposed at load, unlike GPT-2's Conv1D layout)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import LayerNorm, Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..gpt2.modeling_gpt2 import (
    GPT2Block,
    GPT2LMHeadModel,
    GPT2Model,
    GPT2ModelStandalone,
    GPT2PreTrainedModel,
)
from .configuration_gpt_bigcode import GPTBigCodeConfig


class GPTBigCodeAttention(Module):
    """MQA: fused Q + single-KV projection (reference GPTBigCodeAttention)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head
        self.num_kv_heads = 1 if config.multi_query else config.n_head
        self.kv_dim = self.num_kv_heads * self.head_dim
        self.scale = self.head_dim**-0.5 if config.scale_attn_weights else 1.0
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.c_attn = Linear(config.n_embd, config.n_embd + 2 * self.kv_dim, True, **kw)
        self.c_proj = Linear(config.n_embd, config.n_embd, True, **kw)

    def __call__(self, params, hidden, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        qkv = self.c_attn(params["c_attn"], hidden)
        if self.config.multi_query:
            q = qkv[..., :e].reshape(b, s, self.num_heads, self.head_dim)
            k = qkv[..., e:e + self.kv_dim].reshape(b, s, self.num_kv_heads, self.head_dim)
            v = qkv[..., e + self.kv_dim:].reshape(b, s, self.num_kv_heads, self.head_dim)
        else:
            # MHA checkpoints interleave [q_h|k_h|v_h] per head (reference
            # GPTBigCodeAttention view-then-split path)
            qkv = qkv.reshape(b, s, self.num_heads, 3 * self.head_dim)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        out = out.reshape(b, s, e)
        return self.c_proj(params["c_proj"], out), cache


class GPTBigCodeMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        inner = config.n_inner if config.n_inner is not None else 4 * config.n_embd
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.c_fc = Linear(config.n_embd, inner, True, **kw)
        self.c_proj = Linear(inner, config.n_embd, True, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.c_proj(params["c_proj"], self.act(self.c_fc(params["c_fc"], x)))


class GPTBigCodeBlock(GPT2Block):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.attn = GPTBigCodeAttention(config, layer_idx, **kw)
        self.ln_2 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.mlp = GPTBigCodeMLP(config, **kw)


class GPTBigCodeModel(GPT2Model):
    block_cls = GPTBigCodeBlock


class GPTBigCodePreTrainedModel(GPT2PreTrainedModel):
    config_class = GPTBigCodeConfig


class GPTBigCodeForCausalLM(GPTBigCodePreTrainedModel, GPT2LMHeadModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        GPTBigCodePreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTBigCodeModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        return init_static_cache(
            num_layers=cfg.n_layer, batch_size=batch_size, max_len=max_len,
            num_kv_heads=1 if cfg.multi_query else cfg.n_head,
            head_dim=cfg.n_embd // cfg.n_head, dtype=dtype or self.dtype)


class GPTBigCodeModelStandalone(GPT2ModelStandalone):
    config_class = GPTBigCodeConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        GPTBigCodePreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = GPTBigCodeModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
