"""GraniteMoe decoder (reference src/transformers/models/granitemoe/modeling_granitemoe.py).

Granite's four scalar multipliers (attention/residual/embedding/logits) plus
a MoE block with STACKED expert tensors (``input_linear`` [E, 2I, H] chunked
into gate|up, ``output_linear`` [E, H, I]) and a top-k-then-softmax router
(:124-145 — softmax over the selected logits, not the full distribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..granite.modeling_granite import GraniteAttention, GraniteDecoderLayer, GraniteModel
from ..llama.modeling_llama import LlamaForCausalLM, LlamaModelStandalone
from .configuration_granitemoe import GraniteMoeConfig


class GraniteMoeMoE(Module):
    def __init__(self, config: GraniteMoeConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_experts = config.num_local_experts
        self.top_k = config.num_experts_per_tok
        self.inter = config.intermediate_size
        self.hidden = config.hidden_size
        self.router = _GraniteMoeRouter(config, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(rng)
        init = normal_init(self.config.initializer_range)
        params["input_linear"] = {"weight": init(
            k1, (self.num_experts, 2 * self.inter, self.hidden), self.param_dtype)}
        params["output_linear"] = {"weight": init(
            k2, (self.num_experts, self.hidden, self.inter), self.param_dtype)}
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = self.router(params["router"], x).astype(jnp.float32)
        top_logits, idx = jax.lax.top_k(logits, self.top_k)
        weights = jax.nn.softmax(top_logits, axis=-1)
        win = params["input_linear"]["weight"].astype(self.dtype)   # [E, 2I, H]
        wout = params["output_linear"]["weight"].astype(self.dtype)  # [E, H, I]
        xt = x.astype(self.dtype)
        gate_up = jnp.einsum("th,eih->eti", xt, win)  # [E, T, 2I]
        gate, up = gate_up[..., :self.inter], gate_up[..., self.inter:]
        inter = self.act(gate) * up
        down = jnp.einsum("eti,ehi->eth", inter, wout)  # [E, T, H]
        onehot = jax.nn.one_hot(idx, self.num_experts, dtype=jnp.float32)
        combine = jnp.einsum("tke,tk->et", onehot, weights)
        out = jnp.einsum("eth,et->th", down.astype(jnp.float32), combine)
        return out.reshape(b, s, h).astype(hidden.dtype)


class _GraniteMoeRouter(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = Linear(config.hidden_size, config.num_local_experts, False,
                            dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, x):
        return self.layer(params["layer"], x)


class GraniteMoeDecoderLayer(GraniteDecoderLayer):
    attention_cls = GraniteAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.block_sparse_moe = GraniteMoeMoE(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        m = jnp.asarray(self.residual_multiplier, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.block_sparse_moe(params["block_sparse_moe"], h)
        return residual + h * m, cache


class GraniteMoeModel(GraniteModel):
    decoder_layer_cls = GraniteMoeDecoderLayer


class GraniteMoeForCausalLM(LlamaForCausalLM):
    config_class = GraniteMoeConfig
    model_cls = GraniteMoeModel

    def compute_logits(self, params, hidden):
        return super().compute_logits(params, hidden) / self.config.logits_scaling


class GraniteMoeModelStandalone(LlamaModelStandalone):
    config_class = GraniteMoeConfig
    model_cls = GraniteMoeModel
