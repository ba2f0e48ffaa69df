"""LongCat-Flash (reference models/longcat_flash/modular_longcat_flash.py):
each logical layer runs TWO attention+MLP sublayers with ONE shortcut MoE
branch computed from the first sublayer's post-norm and added at the block
output (:196). The MoE routes over routed + zero-computation experts: zero
experts are the identity, so the router can trade compute for capacity
(:85). MLA queries/latents are rescaled by sqrt(hidden/rank) (:135)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache
from ...core.module import Embedding, Linear, Module, ModuleList, RMSNorm, normal_init
from ...modeling_utils import PreTrainedModel
from ..deepseek_v3.modeling_deepseek_v3 import DeepseekV3Attention
from ..llama.modeling_llama import (
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_longcat_flash import LongcatFlashConfig


class LongcatFlashMLA(DeepseekV3Attention):
    """MLA with q-LoRA / kv-LoRA rescaling (reference :135-138)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.mla_scale_q_lora = (config.hidden_size / config.q_lora_rank) ** 0.5
        self.mla_scale_kv_lora = (config.hidden_size / config.kv_lora_rank) ** 0.5

    def scale_q(self, q, attn_args):
        # rope is linear, so scaling after rope == reference's before-rope
        return q * self.mla_scale_q_lora

    def expand_kv(self, params, kv_nope, k_rot):
        return super().expand_kv(params, kv_nope * self.mla_scale_kv_lora, k_rot)


class _ExpertGeometry:
    """Config view for one routed expert's LlamaMLP."""

    def __init__(self, hidden_size, intermediate_size, base):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.mlp_bias = False
        self.hidden_act = base.hidden_act
        self.hidden_activation = None
        self.initializer_range = base.initializer_range


class LongcatFlashMoE(Module):
    """Softmax router over routed + zero experts; zero experts are identity
    (reference LongcatFlashMoE/Experts/TopkRouter)."""

    def __init__(self, config: LongcatFlashConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.n_routed = config.n_routed_experts
        self.n_zero = config.zero_expert_num or 0
        self.total = self.n_routed + self.n_zero
        self.top_k = config.moe_topk
        self.scaling = config.routed_scaling_factor
        inter = config.expert_ffn_hidden_size
        self.inter = inter
        self.hidden = config.hidden_size
        router = Module(dtype=dtype, param_dtype=param_dtype)
        router._children["classifier"] = Linear(config.hidden_size, self.total,
                                                config.router_bias, **kw)
        self.router = router
        expert_cfg = _ExpertGeometry(config.hidden_size, inter, config)
        self.experts = ModuleList([LlamaMLP(expert_cfg, dtype=dtype,
                                            param_dtype=param_dtype)
                                   for _ in range(self.n_routed)])

    def init(self, rng):
        params = super().init(rng)
        params["router"]["e_score_correction_bias"] = jnp.zeros(
            (self.total,), jnp.float32)
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(-1, h)
        logits = jnp.dot(x.astype(jnp.float32),
                         params["router"]["classifier"]["weight"].astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)
        corrected = scores + params["router"]["e_score_correction_bias"][None]
        _, top_i = jax.lax.top_k(corrected, self.top_k)  # [T, K]
        top_w = jnp.take_along_axis(scores, top_i, axis=-1) * self.scaling

        sel = jax.nn.one_hot(top_i, self.total, dtype=jnp.float32)  # [T,K,E]
        weight_per_expert = jnp.einsum("tke,tk->te", sel,
                                       top_w.astype(jnp.float32))
        routed_w = weight_per_expert[:, : self.n_routed]
        zero_w = weight_per_expert[:, self.n_routed:].sum(-1)

        w_gate = jnp.stack([params["experts"][str(e)]["gate_proj"]["weight"]
                            for e in range(self.n_routed)]).astype(self.dtype)
        w_up = jnp.stack([params["experts"][str(e)]["up_proj"]["weight"]
                          for e in range(self.n_routed)]).astype(self.dtype)
        w_down = jnp.stack([params["experts"][str(e)]["down_proj"]["weight"]
                            for e in range(self.n_routed)]).astype(self.dtype)
        ge = jnp.einsum("th,ehi->tei", x, w_gate)
        up = jnp.einsum("th,ehi->tei", x, w_up)
        act = jax.nn.silu(ge) * up
        per_expert = jnp.einsum("tei,eih->teh", act, w_down)
        out = jnp.einsum("te,teh->th", routed_w.astype(self.dtype), per_expert)
        out = out + zero_w[:, None].astype(self.dtype) * x
        return out.reshape(b, s, h)


class LongcatFlashDecoderLayer(Module):
    """reference :162 — dual sublayer + shortcut MoE."""

    @staticmethod
    def make_norm(config, **kw):
        # the model-level final norm hook (LlamaModel reads it off the layer)
        return RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_idx = layer_idx
        self.mlp = LongcatFlashMoE(config, **kw)
        self.self_attn = ModuleList([
            LongcatFlashMLA(config, layer_idx * 2 + i, **kw) for i in (0, 1)])
        self.mlps = ModuleList([LlamaMLP(config, **kw) for _ in (0, 1)])
        self.input_layernorm = ModuleList([
            RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
            for _ in (0, 1)])
        self.post_attention_layernorm = ModuleList([
            RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
            for _ in (0, 1)])

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm[0](params["input_layernorm"]["0"], hidden)
        h, cache = self.self_attn[0](params["self_attn"]["0"], h, cos, sin,
                                     attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm[0](
            params["post_attention_layernorm"]["0"], hidden)
        shortcut = self.mlp(params["mlp"], h)
        hidden = residual + self.mlps[0](params["mlps"]["0"], h)
        residual = hidden
        h = self.input_layernorm[1](params["input_layernorm"]["1"], hidden)
        h, cache = self.self_attn[1](params["self_attn"]["1"], h, cos, sin,
                                     attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm[1](
            params["post_attention_layernorm"]["1"], hidden)
        hidden = residual + self.mlps[1](params["mlps"]["1"], h) + shortcut
        return hidden, cache


class LongcatFlashModel(LlamaModel):
    decoder_layer_cls = LongcatFlashDecoderLayer


class LongcatFlashForCausalLM(LlamaForCausalLM):
    config_class = LongcatFlashConfig
    model_cls = LongcatFlashModel

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        """Latent MLA cache with 2 sublayers per logical layer."""
        cfg = self.config
        dtype = dtype or self.dtype
        n = cfg.num_layers * 2
        keys = tuple(jnp.zeros((batch_size, max_len, 1, cfg.kv_lora_rank), dtype)
                     for _ in range(n))
        values = tuple(jnp.zeros((batch_size, max_len, 1, cfg.qk_rope_head_dim), dtype)
                       for _ in range(n))
        return StaticKVCache(keys=keys, values=values,
                             layer_windows=(None,) * n, max_len=max_len)


class LongcatFlashModelStandalone(LlamaModelStandalone):
    config_class = LongcatFlashConfig
    model_cls = LongcatFlashModel
