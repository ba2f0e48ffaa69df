"""GPT-OSS decoder, TPU-native.

Semantics match reference src/transformers/models/gpt_oss/modeling_gpt_oss.py:
attention SINKS — a learned per-head logit in the softmax denominator whose
mass is dropped (:251-257, plumbed through ops/attention.py ``sinks``),
alternating sliding/full layers (layer_types), yarn rope with fractional
(truncate=False) correction bounds, and an MoE in EVERY layer with stacked
expert params [E, H, 2I] (interleaved gate/up columns), biases, clamped
swiglu ``(up+1) · gate·σ(1.702·gate)`` (:82-88), and top-k-then-softmax
routing (:126-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, normal_init
from ...ops.moe import topk_routing
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_gpt_oss import GptOssConfig


class GptOssAttention(LlamaAttention):
    """Adds the learned sink logits (reference :293 ``self.sinks``)."""

    def init(self, rng):
        params = super().init(rng)
        params["sinks"] = jnp.zeros((self.num_heads,), self.param_dtype)
        return params

    def extra_attn_kwargs(self, params):
        return {"sinks": params["sinks"]}


class GptOssExperts(Module):
    """Stacked expert params with clamped-swiglu activation (reference :69).

    Checkpoint layout: gate_up_proj [E, H, 2I] with INTERLEAVED gate/up
    columns (gate = ::2, up = 1::2), plus per-expert biases — stored as raw
    parameters (torch keeps [E, in, out], no transpose needed).
    """

    alpha = 1.702
    limit = 7.0

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_local_experts
        self.hidden_size = config.hidden_size
        self.intermediate_size = config.intermediate_size

    def init(self, rng):
        e, h, i = self.num_experts, self.hidden_size, self.intermediate_size
        k1, _ = jax.random.split(rng)
        init = normal_init(0.02)
        return {
            "gate_up_proj": init(k1, (e, h, 2 * i), self.param_dtype),
            "gate_up_proj_bias": jnp.zeros((e, 2 * i), self.param_dtype),
            "down_proj": init(k1, (e, i, h), self.param_dtype),
            "down_proj_bias": jnp.zeros((e, h), self.param_dtype),
        }

    def __call__(self, params, x, topk_w, topk_idx):
        """Dense all-experts batched matmul + weighted combine; per-expert
        biases are folded in before the combine (unrouted experts are zeroed
        by the combine weights, matching the reference's index_add)."""
        gate_up = jnp.einsum("th,ehi->eti", x.astype(self.dtype),
                             params["gate_up_proj"].astype(self.dtype))
        gate_up = gate_up + params["gate_up_proj_bias"].astype(self.dtype)[:, None, :]
        gate = gate_up[..., 0::2]
        up = gate_up[..., 1::2]
        gate = jnp.minimum(gate, self.limit)
        up = jnp.clip(up, -self.limit, self.limit)
        glu = gate * jax.nn.sigmoid(gate * self.alpha)
        inner = (up + 1.0) * glu
        out = jnp.einsum("eti,eih->eth", inner, params["down_proj"].astype(self.dtype))
        out = out + params["down_proj_bias"].astype(self.dtype)[:, None, :]
        one_hot = jax.nn.one_hot(topk_idx, self.num_experts, dtype=jnp.float32)  # [T,k,E]
        combine = jnp.einsum("tk,tke->te", topk_w.astype(jnp.float32), one_hot)
        return jnp.einsum("te,eth->th", combine.astype(out.dtype), out)


class GptOssRouter(Module):
    """Router Linear kept in torch [E, H] layout via load transform;
    top-k-then-softmax over the top values (reference :117)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_local_experts
        self.hidden_size = config.hidden_size
        self.top_k = config.num_experts_per_tok

    def init(self, rng):
        return {
            "weight": normal_init(0.02)(rng, (self.hidden_size, self.num_experts), self.param_dtype),
            "bias": jnp.zeros((self.num_experts,), self.param_dtype),
        }

    def param_load_transform(self, name, arr):
        if name == "weight":
            import numpy as np

            return np.ascontiguousarray(arr.transpose())
        return arr

    def param_save_transform(self, name, arr):
        return arr.T if name == "weight" else arr

    def __call__(self, params, x):
        logits = jnp.dot(x.astype(self.dtype), params["weight"].astype(self.dtype))
        logits = logits + params["bias"].astype(self.dtype)
        return topk_routing(logits, self.top_k, renormalize=False, pre_softmax=False)


class GptOssMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.router = GptOssRouter(config, **kw)
        self.experts = GptOssExperts(config, **kw)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        topk_w, topk_idx = self.router(params["router"], x)
        out = self.experts(params["experts"], x, topk_w, topk_idx)
        return out.reshape(b, s, h)


class GptOssDecoderLayer(LlamaDecoderLayer):
    attention_cls = GptOssAttention
    mlp_cls = GptOssMLP


class GptOssModel(LlamaModel):
    decoder_layer_cls = GptOssDecoderLayer


class GptOssForCausalLM(LlamaForCausalLM):
    config_class = GptOssConfig
    model_cls = GptOssModel
    _tp_plan = dict(DECODER_TP_PLAN)
    _tp_plan.update({
        r".*\.mlp\.experts\.gate_up_proj": "grouped_colwise",
        r".*\.mlp\.experts\.down_proj": "grouped_rowwise",
    })


class GptOssModelStandalone(LlamaModelStandalone):
    config_class = GptOssConfig
    model_cls = GptOssModel
