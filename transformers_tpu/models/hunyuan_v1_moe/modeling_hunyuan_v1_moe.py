"""HunYuanMoEV1 decoder (reference models/hunyuan_v1_moe/modeling_hunyuan_v1_moe.py).

HunYuan dense attention (per-head q/k RMSNorm after rope, dynamic-NTK-alpha
rope) + per-layer MoE: fp32 ``gate.wg`` router with renormalized top-k
softmax (:224-243), llama-style experts, and an always-on ``shared_mlp``
added to the routed output (:284-302).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn, topk_routing
from ..hunyuan_v1_dense.modeling_hunyuan_v1_dense import (
    HunYuanDenseV1Attention,
    HunYuanDenseV1Model,
)
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModelStandalone,
)
from .configuration_hunyuan_v1_moe import HunYuanMoEV1Config


class HunYuanMoEV1Moe(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        n = config.num_experts
        self.num_experts = n if isinstance(n, int) else n[layer_idx]
        k = config.moe_topk
        self.top_k = k if isinstance(k, int) else k[layer_idx]
        gate = Module(**kw)
        gate.wg = Linear(config.hidden_size, self.num_experts, False, **lkw)
        self.gate = gate
        self.experts = [LlamaMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(self.num_experts)]
        self.shared_mlp = LlamaMLP(config, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        shared = self.shared_mlp(params["shared_mlp"], hidden)
        x = hidden.reshape(b * s, h)
        router_logits = self.gate.wg(params["gate"]["wg"], x.astype(jnp.float32))
        weights, idx = topk_routing(router_logits, self.top_k, renormalize=True)
        w_gate = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"]
                            for e in range(self.num_experts)])
        w_up = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"]
                          for e in range(self.num_experts)])
        w_down = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"]
                            for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w_gate.astype(self.dtype),
                         w_up.astype(self.dtype), w_down.astype(self.dtype),
                         weights, idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype) + shared


class HunYuanMoEV1DecoderLayer(LlamaDecoderLayer):
    attention_cls = HunYuanDenseV1Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.mlp = HunYuanMoEV1Moe(config, layer_idx, dtype=dtype, param_dtype=param_dtype)


class HunYuanMoEV1Model(HunYuanDenseV1Model):
    decoder_layer_cls = HunYuanMoEV1DecoderLayer


class HunYuanMoEV1ForCausalLM(LlamaForCausalLM):
    config_class = HunYuanMoEV1Config
    model_cls = HunYuanMoEV1Model


class HunYuanMoEV1ModelStandalone(LlamaModelStandalone):
    config_class = HunYuanMoEV1Config
    model_cls = HunYuanMoEV1Model
