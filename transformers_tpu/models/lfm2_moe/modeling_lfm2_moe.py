"""LFM2-MoE decoder (reference
src/transformers/models/lfm2_moe/modular_lfm2_moe.py): the LFM2 hybrid
short-conv / attention backbone with the per-layer feed-forward replaced by
a sigmoid-routed MoE from layer ``num_dense_layers`` on. The router's
``expert_bias`` buffer (block-level, aux-loss-free balancing) shifts only
the top-k CHOICE; combine weights are the unbiased sigmoid scores,
optionally renormalized, scaled by ``routed_scaling_factor``. Experts use
the v5 stacked layout ([E, 2I, H] w1/w3 rows; LFM2 names them w1/w3/w2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.moe import get_experts_fn
from ..lfm2.modeling_lfm2 import Lfm2DecoderLayer, Lfm2ForCausalLM, Lfm2Model
from ..llama.modeling_llama import LlamaModelStandalone
from .configuration_lfm2_moe import Lfm2MoeConfig


class Lfm2MoeExpertMLP(Module):
    """One expert at moe_intermediate_size; LFM2 w1/w3/w2 naming."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        inter = config.moe_intermediate_size
        self.w1 = Linear(config.hidden_size, inter, False, **kw)
        self.w2 = Linear(inter, config.hidden_size, False, **kw)
        self.w3 = Linear(config.hidden_size, inter, False, **kw)


class Lfm2MoeSparseBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_experts = config.num_experts
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_experts, False, **kw)
        self.experts = [Lfm2MoeExpertMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_experts)]

    def init(self, rng):
        params = super().init(rng)
        if self.config.use_expert_bias:
            params["expert_bias"] = jnp.zeros((self.config.num_experts,), jnp.float32)
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        logits = self.gate(params["gate"], x)
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
        if self.config.use_expert_bias:
            choice = scores + params["expert_bias"].astype(jnp.float32)
            _, topk_idx = jax.lax.top_k(choice, self.config.num_experts_per_tok)
            topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        else:
            topk_w, topk_idx = jax.lax.top_k(scores, self.config.num_experts_per_tok)
        if self.config.norm_topk_prob:
            topk_w = topk_w / (topk_w.sum(-1, keepdims=True) + 1e-6)
        topk_w = topk_w * self.config.routed_scaling_factor
        w1 = jnp.stack([params["experts"][str(e)]["w1"]["weight"] for e in range(self.num_experts)])
        w2 = jnp.stack([params["experts"][str(e)]["w2"]["weight"] for e in range(self.num_experts)])
        w3 = jnp.stack([params["experts"][str(e)]["w3"]["weight"] for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w1.astype(self.dtype), w3.astype(self.dtype),
                         w2.astype(self.dtype), topk_w, topk_idx, jax.nn.silu)
        return out.reshape(b, s, h).astype(hidden.dtype)


class Lfm2MoeDecoderLayer(Lfm2DecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        if layer_idx >= config.num_dense_layers:
            del self._children["feed_forward"]
            object.__delattr__(self, "feed_forward")
            self.feed_forward = Lfm2MoeSparseBlock(config, dtype=dtype,
                                                   param_dtype=param_dtype)


class Lfm2MoeModel(Lfm2Model):
    decoder_layer_cls = Lfm2MoeDecoderLayer


class Lfm2MoeForCausalLM(Lfm2ForCausalLM):
    config_class = Lfm2MoeConfig
    model_cls = Lfm2MoeModel


class Lfm2MoeModelStandalone(LlamaModelStandalone):
    config_class = Lfm2MoeConfig
    model_cls = Lfm2MoeModel
