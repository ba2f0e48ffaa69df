"""Qwen3-VL-MoE — Qwen3-VL with a sparse-MoE text decoder (reference
models/qwen3_vl_moe/modeling_qwen3_vl_moe.py).

Experts are stacked 3D tensors gate_up_proj [E, H, 2I] (gate = first half of
the last axis, :74) and down_proj [E, I, H]; routing is softmax-then-topk
with renormalization (:144). Vision tower, DeepStack, and interleaved M-RoPE
are shared with Qwen3-VL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import topk_routing
from ..qwen3_vl.modeling_qwen3_vl import (Qwen3VLForConditionalGeneration,
                                          Qwen3VLModel, Qwen3VLTextDecoderLayer,
                                          Qwen3VLTextModel)
from .configuration_qwen3_vl_moe import Qwen3VLMoeConfig, Qwen3VLMoeTextConfig


class Qwen3VLMoeTextExperts(Module):
    """gate_up_proj [E, H, 2I] (chunk: gate first), down_proj [E, I, H]."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_experts = config.num_experts
        self.hidden = config.hidden_size
        self.inter = config.moe_intermediate_size
        self.act = get_activation(config.hidden_act)
        self.initializer_range = config.initializer_range

    def init(self, rng):
        init = normal_init(self.initializer_range)
        k1, k2 = jax.random.split(rng)
        return {"gate_up_proj": init(k1, (self.num_experts, self.hidden, 2 * self.inter),
                                     self.param_dtype),
                "down_proj": init(k2, (self.num_experts, self.inter, self.hidden),
                                  self.param_dtype)}

    def __call__(self, params, x, topk_w, topk_idx):
        gu = params["gate_up_proj"].astype(self.dtype)
        dn = params["down_proj"].astype(self.dtype)
        gate_up = jnp.einsum("th,ehi->eti", x.astype(self.dtype), gu)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        out = jnp.einsum("eti,eih->eth", up * self.act(gate), dn)
        one_hot = jax.nn.one_hot(topk_idx, self.num_experts, dtype=jnp.float32)
        combine = jnp.einsum("tk,tke->te", topk_w.astype(jnp.float32), one_hot)
        return jnp.einsum("te,eth->th", combine.astype(out.dtype), out)


class Qwen3VLMoeTextSparseMoeBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        from ...core.module import Linear

        self.gate = Linear(config.hidden_size, config.num_experts, False, **kw)
        self.experts = Qwen3VLMoeTextExperts(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = self.gate(params["gate"], x)
        weights, idx = topk_routing(router_logits, self.top_k, renormalize=True)
        out = self.experts(params["experts"], x, weights, idx)
        return out.reshape(b, s, h).astype(hidden.dtype)


class Qwen3VLMoeTextDecoderLayer(Qwen3VLTextDecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        sparse = (layer_idx not in config.mlp_only_layers) and (
            config.num_experts > 0 and (layer_idx + 1) % config.decoder_sparse_step == 0)
        if sparse:
            del self._children["mlp"]
            object.__delattr__(self, "mlp")
            self.mlp = Qwen3VLMoeTextSparseMoeBlock(config, dtype=dtype, param_dtype=param_dtype)


class Qwen3VLMoeTextModel(Qwen3VLTextModel):
    decoder_layer_cls = Qwen3VLMoeTextDecoderLayer


class Qwen3VLMoeModel(Qwen3VLModel):
    text_model_cls = Qwen3VLMoeTextModel


class Qwen3VLMoeForConditionalGeneration(Qwen3VLForConditionalGeneration):
    config_class = Qwen3VLMoeConfig
    model_cls = Qwen3VLMoeModel
