"""HY-V3 (Hunyuan V3) decoder (reference models/hy_v3/modular_hy_v3.py).

Llama layer shape with per-head q/k RMSNorm attention (= Qwen3's form,
reference inherits ApertusAttention) and a DeepSeek-flavored MoE:
- sigmoid router; an fp32 ``e_score_correction_bias`` shifts only the top-k
  CHOICE while combine weights are the unbiased sigmoid scores renormalized
  to sum 1 (+1e-20) and scaled by ``router_scaling_factor`` (:137-152)
- stacked experts (gate_up_proj [E,2I,H] / down_proj [E,H,I]) + always-on
  shared experts of width moe_intermediate_size*num_shared_experts, combined
  in fp32 when ``enable_moe_fp32_combine`` (:166-176)
- layer 0 dense, the rest sparse (config __post_init__)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3MLP
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..qwen3.modeling_qwen3 import Qwen3Attention
from ..qwen3_next.modeling_qwen3_next import Qwen3NextExperts
from .configuration_hy_v3 import HYV3Config


class HYV3MoE(Module):
    """Sigmoid router with selection-only correction bias (reference :137)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        self.scaling = config.router_scaling_factor
        self.fp32_combine = config.enable_moe_fp32_combine
        self.hidden = config.hidden_size
        self.initializer_range = config.initializer_range
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.experts = Qwen3NextExperts(config, **kw)
        self.shared_experts = DeepseekV3MLP(
            config, config.moe_intermediate_size * config.num_shared_experts, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["gate"] = {"weight": normal_init(self.initializer_range)(
            rng, (self.num_experts, self.hidden), self.param_dtype)}
        params["e_score_correction_bias"] = jnp.zeros(
            (self.num_experts,), jnp.float32)
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        logits = x.astype(jnp.float32) @ params["gate"]["weight"].astype(jnp.float32).T
        scores = jax.nn.sigmoid(logits)
        _, idx = jax.lax.top_k(scores + params["e_score_correction_bias"][None],
                               self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20) * self.scaling
        routed = self.experts(params["experts"], x, w, idx)
        shared = self.shared_experts(params["shared_experts"], x)
        if self.fp32_combine:
            out = (routed.astype(jnp.float32) + shared.astype(jnp.float32))
        else:
            out = routed + shared
        return out.reshape(b, s, h).astype(hidden.dtype)


class HYV3DecoderLayer(LlamaDecoderLayer):
    attention_cls = Qwen3Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        if config.mlp_layer_types[layer_idx] == "sparse":
            self.mlp = HYV3MoE(config, dtype=dtype, param_dtype=param_dtype)
        else:
            self.mlp = DeepseekV3MLP(config, dtype=dtype, param_dtype=param_dtype)


class HYV3Model(LlamaModel):
    decoder_layer_cls = HYV3DecoderLayer


class HYV3ForCausalLM(LlamaForCausalLM):
    config_class = HYV3Config
    model_cls = HYV3Model
    # reference: MTP layer (model.layers.80) dropped on load
    _keys_to_ignore_on_load_unexpected = (r"model\.layers\.80.*",)


class HYV3ModelStandalone(LlamaModelStandalone):
    config_class = HYV3Config
    model_cls = HYV3Model
