"""Llama4 text decoder, TPU-native (reference
src/transformers/models/llama4/modeling_llama4.py).

Deltas from the llama skeleton:
- complex-pair rope (interleaved output layout, :199 apply_rotary_emb) on 3
  of 4 layers; NoPE layers instead get attn-temperature tuning
  (q *= log1p(floor((pos+1)/floor_scale)) * attn_scale + 1, :338);
- parameter-free L2 qk-norm AFTER rope (:97);
- CHUNKED causal attention on rope layers (attention_chunk_size), full
  attention on NoPE layers;
- MoE: top-k router whose sigmoid scores scale the expert INPUT (:138-166),
  stacked expert tensors gate_up_proj [E, H, 2I] / down_proj [E, I, H]
  (raw nn.Parameter leaves — no .weight suffix), plus a dense shared
  expert; dense layers use intermediate_size_mlp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..deepseek_v2.modeling_deepseek_v2 import apply_rope_complex_pairs
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_llama4 import Llama4Config, Llama4TextConfig


def _l2norm(x, eps):
    f = x.astype(jnp.float32)
    return (f * jax.lax.rsqrt(jnp.mean(f * f, axis=-1, keepdims=True) + eps)).astype(x.dtype)


class Llama4TextAttention(LlamaAttention):
    apply_rope = False  # the skeleton hook is bypassed; rope happens below

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.use_rope = bool(config.no_rope_layers[layer_idx])
        self.use_qk_norm = config.use_qk_norm and self.use_rope
        self.attn_temperature_tuning = config.attn_temperature_tuning
        self.floor_scale = config.floor_scale
        self.attn_scale = config.attn_scale
        self.chunk = (config.attention_chunk_size
                      if config.layer_types[layer_idx] == "chunked_attention" else None)
        self.rms_eps = config.rms_norm_eps

    def extra_attn_kwargs(self, params):
        return {"chunk_size": self.chunk}

    def post_rope_qk(self, params, q, k):
        # invoked after the (bypassed) skeleton rope: apply llama4 rope here
        # using the positions stashed by the model (attn_args threading is
        # handled via self._rope set per forward by Llama4TextModel)
        cos, sin, q_positions = self._rope
        if self.use_rope:
            q = apply_rope_complex_pairs(q, cos, sin)
            k = apply_rope_complex_pairs(k, cos, sin)
        if self.use_qk_norm:
            q = _l2norm(q, self.rms_eps)
            k = _l2norm(k, self.rms_eps)
        if self.attn_temperature_tuning and not self.use_rope:
            scales = (jnp.log1p(jnp.floor((q_positions.astype(jnp.float32) + 1.0)
                                          / self.floor_scale)) * self.attn_scale + 1.0)
            q = (q * scales[:, :, None, None]).astype(q.dtype)
        return q, k

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        # stash rope inputs for post_rope_qk (cos/sin carry the complex-pair
        # tables; q_positions drive NoPE temperature tuning)
        object.__setattr__(self, "_rope", (cos, sin, attn_args["q_positions"]))
        return super().__call__(params, hidden, None, None, attn_args, cache,
                                cache_position)


class Llama4TextMLP(LlamaMLP):
    def __init__(self, config, intermediate_size=None, *, dtype, param_dtype):
        if intermediate_size is not None:
            import copy

            config = copy.copy(config)
            config.intermediate_size = intermediate_size
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)


class Llama4TextMoe(Module):
    """Router scores scale the expert INPUT; all experts run densely over
    the batch (reference :147-166; the scores of unselected experts are
    sigmoid(-inf) = 0 so only top-k contribute)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        # the checkpoint stores the router as a bare Linear named "router"
        self.router = Linear(config.hidden_size, config.num_local_experts, False,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.shared_expert = Llama4TextMLP(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        k1, k2 = jax.random.split(rng)
        init = normal_init(c.initializer_range)
        params["experts"] = {
            "gate_up_proj": init(k1, (c.num_local_experts, c.hidden_size,
                                      2 * c.intermediate_size), self.param_dtype),
            "down_proj": init(k2, (c.num_local_experts, c.intermediate_size,
                                   c.hidden_size), self.param_dtype),
        }
        return params

    def __call__(self, params, hidden):
        b, s, hd = hidden.shape
        c = self.config
        x = hidden.reshape(-1, hd)
        logits = self.router(params["router"], x).astype(jnp.float32)  # [T, E]
        topv, topi = jax.lax.top_k(logits, c.num_experts_per_tok)
        neg = jnp.full_like(logits, -jnp.inf)
        picked = neg.at[jnp.arange(x.shape[0])[:, None], topi].set(topv)
        scores = jax.nn.sigmoid(picked).astype(x.dtype)                # [T, E]
        gu = params["experts"]["gate_up_proj"].astype(self.dtype)      # [E, H, 2I]
        dn = params["experts"]["down_proj"].astype(self.dtype)         # [E, I, H]
        xe = x[None] * scores.T[:, :, None]                            # [E, T, H]
        gate_up = jnp.einsum("eth,ehi->eti", xe.astype(self.dtype), gu)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = get_activation(c.hidden_act)
        routed = jnp.einsum("eti,eih->eth", up * act(gate), dn).sum(0)  # [T, H]
        out = self.shared_expert(params["shared_expert"], x) + routed
        return out.reshape(b, s, hd)


class Llama4TextDecoderLayer(LlamaDecoderLayer):
    attention_cls = Llama4TextAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        if layer_idx in config.moe_layers:
            self.feed_forward = Llama4TextMoe(config, **kw)
        else:
            self.feed_forward = Llama4TextMLP(config, config.intermediate_size_mlp, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.feed_forward(params["feed_forward"], h)
        return residual + h, cache


class Llama4TextModel(LlamaModel):
    decoder_layer_cls = Llama4TextDecoderLayer

    def compute_rope(self, position_ids):
        # complex-pair tables (attention_scaling folded into cos AND sin like
        # the reference's freqs_cis * attention_scaling)
        from ...ops.rope import compute_cos_sin

        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=jnp.float32)
        return cos, sin


class Llama4ForCausalLM(LlamaForCausalLM):
    config_class = Llama4TextConfig
    model_cls = Llama4TextModel


class Llama4TextModelStandalone(LlamaModelStandalone):
    config_class = Llama4TextConfig
    model_cls = Llama4TextModel
