"""CodeGen decoder (reference src/transformers/models/codegen/modeling_codegen.py).

GPT-J skeleton (parallel residual with one ``ln_1``, interleaved partial
rotary over ``rotary_dim``, fc_in/fc_out MLP, lm_head with bias) with one
delta: a fused bias-free ``qkv_proj`` whose layout is megatron-sharded into
``mp_num=4`` groups ordered (query, VALUE, key) within each group
(reference :150-160), un-packed here back to [B, S, H, D].
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.attention import get_attention_fn
from ...ops.rope import apply_rotary_pos_emb_interleaved
from ..gptj.modeling_gptj import (
    GPTJBlock,
    GPTJForCausalLM,
    GPTJMLP,
    GPTJModel,
    GPTJModelStandalone,
)
from .configuration_codegen import CodeGenConfig


class CodeGenAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head
        self.scale = self.head_dim**-0.5
        self.mp_num = 4
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.qkv_proj = Linear(config.n_embd, 3 * config.n_embd, False, **kw)
        self.out_proj = Linear(config.n_embd, config.n_embd, False, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        b, s, e = hidden.shape
        fused = self.qkv_proj(params["qkv_proj"], hidden)
        # reference :152-160: reshape into mp groups, split (q, v, k) thirds,
        # then heads-within-group.
        qkv = fused.reshape(b, s, self.mp_num, -1)
        q, v, k = jnp.split(qkv, 3, axis=-1)
        shape = (b, s, self.num_heads, self.head_dim)
        q, v, k = q.reshape(shape), v.reshape(shape), k.reshape(shape)
        q, k = apply_rotary_pos_emb_interleaved(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class CodeGenBlock(GPTJBlock):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import LayerNorm

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.attn = CodeGenAttention(config, layer_idx, **kw)
        self.mlp = GPTJMLP(config, **kw)


class CodeGenModel(GPTJModel):
    def __init__(self, config: CodeGenConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # swap the blocks for the CodeGen variant, keeping names/rope
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.h = [CodeGenBlock(config, i, **kw) for i in range(config.n_layer)]


class CodeGenForCausalLM(GPTJForCausalLM):
    config_class = CodeGenConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = CodeGenModel(config, dtype=self.dtype, param_dtype=self.param_dtype)


class CodeGenModelStandalone(GPTJModelStandalone):
    config_class = CodeGenConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = CodeGenModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
