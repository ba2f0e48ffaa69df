"""JetMoe, TPU-native (reference
src/transformers/models/jetmoe/modeling_jetmoe.py).

Both the FFN AND the attention are sparsely gated mixtures:

- ``JetMoeMoE`` (:220-276): top-k routed single-GLU experts, shared output
  bias.
- ``JetMoeMoA`` mixture-of-attention (:278-349): each expert is a
  (query-projection, output-projection) pair. Shared K/V heads are computed
  once (``kv_proj``) and TILED ``top_k`` times head-wise (:492-494) so every
  selected query expert attends over the same keys; per-expert outputs are
  gate-weighted and summed.

Instead of the reference's sort/scatter token grouping (host-side
``expert_size.tolist()`` — data-dependent shapes XLA can't trace), routing
here gathers the selected experts' weight matrices per token and runs dense
einsums — static shapes, MXU-friendly at test scale; the ragged-dot dispatch
in ``ops/moe.py`` is the production path for large expert counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..llama.modeling_llama import (LlamaDecoderLayer, LlamaForCausalLM,
                                    LlamaModel, LlamaModelStandalone,
                                    LlamaPreTrainedModel, apply_rotary_pos_emb)
from .configuration_jetmoe import JetMoeConfig


class _ParallelExperts(Module):
    """Stacked expert weight [E, out, in] (reference JetMoeParallelExperts)."""

    def __init__(self, num_experts, in_dim, out_dim, init_range, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.shape = (num_experts, out_dim, in_dim)
        self.init_range = init_range

    def init(self, rng):
        return {"weight": normal_init(self.init_range)(rng, self.shape,
                                                       self.param_dtype)}


class _TopKGating(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        self.layer = Linear(config.hidden_size, config.num_local_experts, False,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        logits = self.layer(params["layer"], x).astype(jnp.float32)
        top_logits, top_idx = jax.lax.top_k(logits, self.top_k)
        gates = jax.nn.softmax(top_logits, axis=-1).astype(x.dtype)
        return top_idx, gates, logits


class JetMoeMoE(Module):
    """Top-k GLU experts + shared bias (reference :220-276)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.hidden = config.intermediate_size
        self.input_size = config.hidden_size
        self.input_linear = _ParallelExperts(config.num_local_experts,
                                             config.hidden_size,
                                             config.intermediate_size * 2,
                                             config.initializer_range, **kw)
        self.output_linear = _ParallelExperts(config.num_local_experts,
                                              config.intermediate_size,
                                              config.hidden_size,
                                              config.initializer_range, **kw)
        self.router = _TopKGating(config, **kw)
        self.act = get_activation(config.activation_function)

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.input_size,), self.param_dtype)
        return params

    def __call__(self, params, x):
        idx, gates, _ = self.router(params["router"], x)  # [B,S,k]
        w_in = params["input_linear"]["weight"].astype(self.dtype)    # [E,2H,I]
        w_out = params["output_linear"]["weight"].astype(self.dtype)  # [E,I,H]
        w_in_sel = w_in[idx]    # [B,S,k,2H,I]
        w_out_sel = w_out[idx]  # [B,S,k,I,H]
        h = jnp.einsum("bsi,bskoi->bsko", x, w_in_sel)
        a, b = jnp.split(h, 2, axis=-1)
        h = self.act(a) * b
        y = jnp.einsum("bskh,bskoh->bsko", h, w_out_sel)
        y = jnp.sum(y * gates[..., None], axis=2)
        return y + params["bias"].astype(self.dtype)


class JetMoeMoA(Module):
    """Mixture of attention experts (reference :278-349): expert-specific
    query/output projections around shared K/V."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.kv_size = config.kv_channels * config.num_key_value_heads
        self.input_size = config.hidden_size
        self.input_linear = _ParallelExperts(config.num_local_experts,
                                             config.hidden_size, self.kv_size,
                                             config.initializer_range, **kw)
        self.output_linear = _ParallelExperts(config.num_local_experts,
                                              self.kv_size, config.hidden_size,
                                              config.initializer_range, **kw)
        self.router = _TopKGating(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.input_size,), self.param_dtype)
        return params

    def map(self, params, x):
        idx, gates, logits = self.router(params["router"], x)
        w_in = params["input_linear"]["weight"].astype(self.dtype)  # [E,KV,H]
        q = jnp.einsum("bsi,bskoi->bsko", x, w_in[idx])  # [B,S,k,KV]
        return q, (idx, gates)

    def reduce(self, params, attn_out, topo):
        idx, gates = topo
        w_out = params["output_linear"]["weight"].astype(self.dtype)  # [E,H,KV]
        y = jnp.einsum("bskh,bskoh->bsko", attn_out, w_out[idx])
        y = jnp.sum(y * gates[..., None], axis=2)
        return y + params["bias"].astype(self.dtype)


class JetMoeAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.top_k = config.num_experts_per_tok
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = config.kv_channels
        self.kv_size = self.num_kv_heads * self.head_dim
        self.experts = JetMoeMoA(config, dtype=dtype, param_dtype=param_dtype)
        self.kv_proj = Linear(config.hidden_size, self.kv_size * 2, False,
                              dtype=dtype, param_dtype=param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        b, s, _ = hidden.shape
        q, topo = self.experts.map(params["experts"], hidden)  # [B,S,k,KV]
        q = q.reshape(b, s, self.top_k * self.num_kv_heads, self.head_dim)
        kv = self.kv_proj(params["kv_proj"], hidden)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, s, self.num_kv_heads, self.head_dim)
        v = v.reshape(b, s, self.num_kv_heads, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            if getattr(cache, "layout", "bshd") == "bhsd":
                k = jnp.swapaxes(k, 1, 2)
                v = jnp.swapaxes(v, 1, 2)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        # tile K/V heads top_k times (reference :492-494 repeats whole blocks)
        k = jnp.tile(k, (1, 1, self.top_k, 1))
        v = jnp.tile(v, (1, 1, self.top_k, 1))
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        out = out.reshape(b, s, self.top_k, self.kv_size)
        return self.experts.reduce(params["experts"], out, topo), cache


class JetMoeDecoderLayer(LlamaDecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = self.make_norm(config, **kw)
        self.self_attention = JetMoeAttention(config, layer_idx, **kw)
        self.post_attention_layernorm = self.make_norm(config, **kw)
        self.mlp = JetMoeMoE(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attention(params["self_attention"], h, cos, sin,
                                       attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h, cache


class JetMoeModel(LlamaModel):
    decoder_layer_cls = JetMoeDecoderLayer


class JetMoeForCausalLM(LlamaForCausalLM):
    config_class = JetMoeConfig
    model_cls = JetMoeModel


class JetMoeModelStandalone(LlamaModelStandalone):
    config_class = JetMoeConfig
    model_cls = JetMoeModel
