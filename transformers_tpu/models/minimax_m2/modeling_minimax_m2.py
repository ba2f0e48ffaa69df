"""MiniMax-M2 decoder (reference
src/transformers/models/minimax_m2/modular_minimax_m2.py): pre-norm Mixtral
layer shape with

- Olmo2/FlexOlmo-style whole-projection q/k RMSNorms (before the head
  reshape),
- a sigmoid router with a selection-only ``e_score_correction_bias`` buffer
  stored at the MoE-block level (bias shifts only the top-k CHOICE; the
  combine weights are the unbiased sigmoid scores renormalized to sum 1),
- Mixtral hub key layout: ``block_sparse_moe.experts.N.{w1,w2,w3}`` (the v5
  runtime stacks these; checkpoints keep the per-expert names).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn
from ..llama.modeling_llama import (
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..mixtral.modeling_mixtral import MixtralExpertMLP
from ..olmo2.modeling_olmo2 import Olmo2Attention
from .configuration_minimax_m2 import MiniMaxM2Config


class MiniMaxM2SparseMoeBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_local_experts
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate = Linear(config.hidden_size, config.num_local_experts, False, **kw)
        self.experts = [MixtralExpertMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_local_experts)]
        self.act = get_activation(config.hidden_act)

    def init(self, rng):
        params = super().init(rng)
        params["e_score_correction_bias"] = jnp.zeros((self.num_experts,), jnp.float32)
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        logits = self.gate(params["gate"], x)
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
        choice = scores + params["e_score_correction_bias"].astype(jnp.float32)
        _, topk_idx = jax.lax.top_k(choice, self.top_k)
        topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
        topk_w = topk_w / topk_w.sum(-1, keepdims=True)
        w1 = jnp.stack([params["experts"][str(e)]["w1"]["weight"] for e in range(self.num_experts)])
        w2 = jnp.stack([params["experts"][str(e)]["w2"]["weight"] for e in range(self.num_experts)])
        w3 = jnp.stack([params["experts"][str(e)]["w3"]["weight"] for e in range(self.num_experts)])
        experts_fn = get_experts_fn(getattr(self.config, "experts_implementation", None))
        out = experts_fn(x.astype(self.dtype), w1.astype(self.dtype), w3.astype(self.dtype),
                         w2.astype(self.dtype), topk_w, topk_idx, self.act)
        return out.reshape(b, s, h).astype(hidden.dtype)


class MiniMaxM2DecoderLayer(LlamaDecoderLayer):
    attention_cls = Olmo2Attention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        # hub name: block_sparse_moe (Mixtral lineage)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        self.block_sparse_moe = MiniMaxM2SparseMoeBlock(config, dtype=dtype,
                                                        param_dtype=param_dtype)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.block_sparse_moe(params["block_sparse_moe"], h)
        return residual + h, cache


class MiniMaxM2Model(LlamaModel):
    decoder_layer_cls = MiniMaxM2DecoderLayer


class MiniMaxM2ForCausalLM(LlamaForCausalLM):
    config_class = MiniMaxM2Config
    model_cls = MiniMaxM2Model


class MiniMaxM2ModelStandalone(LlamaModelStandalone):
    config_class = MiniMaxM2Config
    model_cls = MiniMaxM2Model
