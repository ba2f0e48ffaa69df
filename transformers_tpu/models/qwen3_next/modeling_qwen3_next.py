"""Qwen3-Next — hybrid gated-DeltaNet / gated-attention MoE decoder.

Reference src/transformers/models/qwen3_next/modeling_qwen3_next.py:
- 3-of-4 layers are ``linear_attention`` (Qwen3NextGatedDeltaNet :510): a
  depthwise causal conv over concatenated q/k/v streams feeds the gated
  delta rule, whose output is gated-RMSNormed by the z stream;
- every 4th layer is ``full_attention`` (:239): GQA with per-head q/k
  RMSNorm, partial rotary (0.25), and a sigmoid output gate folded into
  q_proj's doubled columns;
- every layer's MLP is the Qwen2-MoE-style sparse block (router
  softmax-then-topk + sigmoid-gated shared expert, :755) with experts
  stored as stacked 3D tensors (:716 gate_up_proj [E, 2I, H]);
- RMSNorms use the zero-centered (1 + weight) parameterization (:133).

TPU-native: the delta rule is the chunked MXU form in
``ops/gated_delta.py`` (inter-chunk ``lax.scan``, in-chunk batched
triangular solve); decode carries (conv window, recurrent state) in the
shared HybridCache pytree so the whole loop jits into one program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import HybridCache, init_hybrid_cache
from ...core.loading import CollectRule
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ...ops.gated_delta import chunk_gated_delta_rule, recurrent_gated_delta_step
from ...ops.moe import topk_routing
from ..llama.modeling_llama import (DECODER_TP_PLAN, LlamaAttention,
                                    LlamaForCausalLM, LlamaMLP, LlamaModel,
                                    LlamaModelStandalone)
from .configuration_qwen3_next import Qwen3NextConfig


class Qwen3NextRMSNorm(RMSNorm):
    """Zero-centered: output × (1 + weight), weight zero-init (reference :133)."""

    def __init__(self, dim, eps, *, dtype, param_dtype):
        super().__init__(dim, eps, dtype=dtype, param_dtype=param_dtype,
                         scale_offset=1.0)


class Qwen3NextAttention(LlamaAttention):
    """GQA with doubled q_proj ([q | gate] per head), per-head q/k zero-centered
    RMSNorm, partial rotary, and sigmoid output gating (reference :239)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.q_proj = Linear(config.hidden_size, self.num_heads * self.head_dim * 2,
                             config.attention_bias, **kw)
        self.q_norm = Qwen3NextRMSNorm(self.head_dim, config.rms_norm_eps,
                                       dtype=dtype, param_dtype=param_dtype)
        self.k_norm = Qwen3NextRMSNorm(self.head_dim, config.rms_norm_eps,
                                       dtype=dtype, param_dtype=param_dtype)

    def project_qkv(self, params, hidden):
        b, s, _ = hidden.shape
        qg = self.q_proj(params["q_proj"], hidden).reshape(
            b, s, self.num_heads, 2 * self.head_dim)
        q, gate = jnp.split(qg, 2, axis=-1)
        self._gate = gate.reshape(b, s, self.num_heads * self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        return q, k, v

    def project_out(self, params, out):
        out = out * jax.nn.sigmoid(self._gate)
        return self.o_proj(params["o_proj"], out)


class Qwen3NextGatedDeltaNet(Module):
    """Reference :510. Projections → depthwise causal conv over [q|k|v] →
    gated delta rule → z-gated RMSNorm → out_proj."""

    # OLMo-Hybrid allow_neg_eigval: beta in [0, 2]
    beta_scale = 1.0

    def __init__(self, config: Qwen3NextConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_idx = layer_idx
        self.hidden_size = config.hidden_size
        self.num_v_heads = config.linear_num_value_heads
        self.num_k_heads = config.linear_num_key_heads
        self.head_k_dim = config.linear_key_head_dim
        self.head_v_dim = config.linear_value_head_dim
        self.key_dim = self.head_k_dim * self.num_k_heads
        self.value_dim = self.head_v_dim * self.num_v_heads
        self.conv_dim = self.key_dim * 2 + self.value_dim
        self.conv_kernel_size = config.linear_conv_kernel_dim
        self.eps = config.rms_norm_eps
        self.act = get_activation(config.hidden_act)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj_qkvz = Linear(self.hidden_size,
                                   self.key_dim * 2 + self.value_dim * 2, False, **kw)
        self.in_proj_ba = Linear(self.hidden_size, self.num_v_heads * 2, False, **kw)
        self.out_proj = Linear(self.value_dim, self.hidden_size, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(rng)
        params["conv1d"] = {"weight": normal_init(0.02)(
            k1, (self.conv_dim, 1, self.conv_kernel_size), self.param_dtype)}
        params["dt_bias"] = jnp.ones((self.num_v_heads,), self.param_dtype)
        A = jax.random.uniform(k2, (self.num_v_heads,), jnp.float32, 1e-4, 16.0)
        params["A_log"] = jnp.log(A).astype(self.param_dtype)
        # gated norm uses the plain (ones-init) parameterization (:58)
        params["norm"] = {"weight": jnp.ones((self.head_v_dim,), self.param_dtype)}
        return params

    def _split_qkvz_ba(self, qkvz, ba):
        """Reference fix_query_key_value_ordering (:588): per-k-head packing."""
        b, s, _ = qkvz.shape
        r = self.num_v_heads // self.num_k_heads
        qkvz = qkvz.reshape(b, s, self.num_k_heads,
                            2 * self.head_k_dim + 2 * r * self.head_v_dim)
        q, k, v, z = jnp.split(
            qkvz, [self.head_k_dim, 2 * self.head_k_dim,
                   2 * self.head_k_dim + r * self.head_v_dim], axis=3)
        ba = ba.reshape(b, s, self.num_k_heads, 2 * r)
        b_, a_ = jnp.split(ba, 2, axis=3)
        v = v.reshape(b, s, self.num_v_heads, self.head_v_dim)
        z = z.reshape(b, s, self.num_v_heads, self.head_v_dim)
        return q, k, v, z, b_.reshape(b, s, -1), a_.reshape(b, s, -1)

    def _conv_full(self, params, x):
        """Causal depthwise conv over [B, L, conv_dim] (no bias)."""
        w = params["conv1d"]["weight"].astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            jnp.swapaxes(x, 1, 2).astype(jnp.float32), w, window_strides=(1,),
            padding=[(self.conv_kernel_size - 1, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=self.conv_dim)
        return jnp.swapaxes(y, 1, 2)

    def project_in(self, params, hidden):
        """Input projections → ([B,S,conv_dim] mixed qkv, z, b, a). Hook for
        variants with differently-factored projections (Qwen3.5 splits
        qkv/z/b/a into four Linears, reference qwen3_5/modular_qwen3_5.py:207)."""
        b, s, _ = hidden.shape
        q, k, v, z, b_, a_ = self._split_qkvz_ba(
            self.in_proj_qkvz(params["in_proj_qkvz"], hidden),
            self.in_proj_ba(params["in_proj_ba"], hidden))
        mixed = jnp.concatenate([q.reshape(b, s, -1), k.reshape(b, s, -1),
                                 v.reshape(b, s, -1)], axis=-1)  # [B,S,conv_dim]
        return mixed, z, b_, a_

    def __call__(self, params, hidden, cache: Optional[HybridCache], attention_mask=None):
        b, s, _ = hidden.shape
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        mixed, z, b_, a_ = self.project_in(params, hidden)

        has_state = cache is not None and cache.initialized
        decode = has_state and s == 1
        conv_state = cache.conv_states[self.layer_idx] if cache is not None else None
        if decode:
            conv_state = jnp.concatenate(
                [conv_state[:, :, 1:], jnp.swapaxes(mixed, 1, 2).astype(conv_state.dtype)],
                axis=2)
            w = params["conv1d"]["weight"].astype(jnp.float32)[:, 0, :]
            cx = jnp.sum(conv_state.astype(jnp.float32) * w[None], axis=-1)
            cx = self.act(cx)[:, None, :]
        else:
            raw = jnp.swapaxes(mixed.astype(jnp.float32), 1, 2)  # [B, conv_dim, S]
            if has_state:
                raw = jnp.concatenate([conv_state.astype(jnp.float32), raw], axis=2)
                cx = self.act(self._conv_full(params, jnp.swapaxes(raw, 1, 2))[:, -s:])
            else:
                cx = self.act(self._conv_full(params, mixed))
            if cache is not None:
                pad = jnp.zeros((b, self.conv_dim,
                                 max(self.conv_kernel_size - raw.shape[2], 0)), jnp.float32)
                conv_state = jnp.concatenate([pad, raw], axis=2)[:, :, -self.conv_kernel_size:]

        q, k, v = jnp.split(cx, [self.key_dim, 2 * self.key_dim], axis=-1)
        q = q.reshape(b, -1, self.num_k_heads, self.head_k_dim)
        k = k.reshape(b, -1, self.num_k_heads, self.head_k_dim)
        v = v.reshape(b, -1, self.num_v_heads, self.head_v_dim)

        beta = jax.nn.sigmoid(b_.astype(jnp.float32)) * self.beta_scale
        g = (-jnp.exp(params["A_log"].astype(jnp.float32))[None, None]
             * jax.nn.softplus(a_.astype(jnp.float32)
                               + params["dt_bias"].astype(jnp.float32)[None, None]))
        r = self.num_v_heads // self.num_k_heads
        if r > 1:
            q = jnp.repeat(q, r, axis=2)
            k = jnp.repeat(k, r, axis=2)

        state = cache.ssm_states[self.layer_idx] if has_state else None
        if decode:
            core, state = recurrent_gated_delta_step(q, k, v, g, beta, state)
        else:
            core, state = chunk_gated_delta_rule(q, k, v, g, beta,
                                                 initial_state=state)
        if cache is not None:
            from dataclasses import replace as dc_replace

            conv_states = list(cache.conv_states)
            ssm_states = list(cache.ssm_states)
            conv_states[self.layer_idx] = conv_state.astype(
                cache.conv_states[self.layer_idx].dtype)
            ssm_states[self.layer_idx] = state
            cache = dc_replace(cache, conv_states=tuple(conv_states),
                               ssm_states=tuple(ssm_states))

        # z-gated RMSNorm over the value head dim (reference :58: norm, scale,
        # then × silu(z), all in float32)
        var = jnp.mean(jnp.square(core), axis=-1, keepdims=True)
        normed = core * jax.lax.rsqrt(var + self.eps)
        normed = normed * params["norm"]["weight"].astype(jnp.float32)
        gated = normed * jax.nn.silu(z.astype(jnp.float32))
        out = gated.reshape(b, s, self.value_dim).astype(self.dtype)
        return self.out_proj(params["out_proj"], out), cache


class Qwen3NextExperts(Module):
    """Stacked expert tensors: gate_up_proj [E, 2I, H] (gate first half),
    down_proj [E, H, I] (reference :716)."""

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
        return {"gate_up_proj": init(k1, (self.num_experts, 2 * self.inter, self.hidden),
                                     self.param_dtype),
                "down_proj": init(k2, (self.num_experts, self.hidden, self.inter),
                                  self.param_dtype)}

    def __call__(self, params, x, topk_w, topk_idx):
        gu = params["gate_up_proj"].astype(self.dtype)
        dn = params["down_proj"].astype(self.dtype)
        gate_up = jnp.einsum("th,eih->eti", x.astype(self.dtype), gu)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        inner = self.act(gate) * up
        out = jnp.einsum("eti,ehi->eth", inner, dn)
        one_hot = jax.nn.one_hot(topk_idx, self.num_experts, dtype=jnp.float32)
        combine = jnp.einsum("tk,tke->te", topk_w.astype(jnp.float32), one_hot)
        return jnp.einsum("te,eth->th", combine.astype(out.dtype), out)


class Qwen3NextSparseMoeBlock(Module):
    """Router (weight [E, H], softmax-then-topk, optional renorm) + stacked
    experts + sigmoid-gated shared expert (reference :755)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.top_k = config.num_experts_per_tok
        self.norm_topk_prob = config.norm_topk_prob
        self.num_experts = config.num_experts
        self.hidden = config.hidden_size
        self.initializer_range = config.initializer_range
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.experts = Qwen3NextExperts(config, dtype=dtype, param_dtype=param_dtype)
        self.shared_expert = _NextMLP(config, config.shared_expert_intermediate_size,
                                      dtype=dtype, param_dtype=param_dtype)
        self.shared_expert_gate = Linear(config.hidden_size, 1, False, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["gate"] = {"weight": normal_init(self.initializer_range)(
            rng, (self.num_experts, self.hidden), self.param_dtype)}
        return params

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = x.astype(self.dtype) @ params["gate"]["weight"].astype(self.dtype).T
        weights, idx = topk_routing(router_logits, self.top_k,
                                    renormalize=self.norm_topk_prob)
        out = self.experts(params["experts"], x, weights, idx)
        shared = self.shared_expert(params["shared_expert"], x)
        gate = jax.nn.sigmoid(self.shared_expert_gate(params["shared_expert_gate"], x))
        out = out + gate * shared
        return out.reshape(b, s, h).astype(hidden.dtype)


class _NextMLP(LlamaMLP):
    def __init__(self, config, intermediate_size, *, dtype, param_dtype):
        import copy

        cfg = copy.copy(config)
        cfg.intermediate_size = intermediate_size
        super().__init__(cfg, dtype=dtype, param_dtype=param_dtype)


class Qwen3NextDecoderLayer(Module):
    """Reference :800 — linear_attention or full_attention token mixer +
    (sparse or dense) MLP under zero-centered pre-norms."""

    deltanet_cls = Qwen3NextGatedDeltaNet
    attention_cls = Qwen3NextAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = config.layer_types[layer_idx]
        if self.block_type == "linear_attention":
            self.linear_attn = self.deltanet_cls(config, layer_idx, **kw)
        else:
            self.self_attn = self.attention_cls(config, layer_idx, **kw)
        sparse = (layer_idx not in config.mlp_only_layers) and (
            config.num_experts > 0 and (layer_idx + 1) % config.decoder_sparse_step == 0)
        if sparse:
            self.mlp = Qwen3NextSparseMoeBlock(config, **kw)
        else:
            self.mlp = _NextMLP(config, config.intermediate_size, **kw)
        self.input_layernorm = Qwen3NextRMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = Qwen3NextRMSNorm(config.hidden_size,
                                                         config.rms_norm_eps, **kw)

    @staticmethod
    def make_norm(config, **kw):
        return Qwen3NextRMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        if self.block_type == "linear_attention":
            recurrent_mask = None
            if not (cache is not None and getattr(cache, "initialized", False)):
                kv_valid = attn_args.get("kv_valid")
                if kv_valid is not None:
                    recurrent_mask = kv_valid[:, : hidden.shape[1]]
            h, cache = self.linear_attn(params["linear_attn"], h, cache, recurrent_mask)
        else:
            h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                      cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        return residual + h, cache


class Qwen3NextModel(LlamaModel):
    decoder_layer_cls = Qwen3NextDecoderLayer

    def __call__(self, params, *args, **kwargs):
        out = super().__call__(params, *args, **kwargs)
        cache = out.past_key_values
        if cache is not None and not cache.initialized:
            from dataclasses import replace as dc_replace

            out.past_key_values = dc_replace(cache, initialized=True)
        return out


class Qwen3NextForCausalLM(LlamaForCausalLM):
    config_class = Qwen3NextConfig
    model_cls = Qwen3NextModel
    _tp_plan = DECODER_TP_PLAN
    # v4-era hub checkpoints store per-expert Linears; collect them into the
    # stacked [E, 2I, H] / [E, H, I] tensors (reference conversion_mapping.py
    # MergeModulelist). v5-style stacked checkpoints load directly.
    _weight_rules = (
        CollectRule(
            pattern=r"^(?P<pre>model\.layers\.\d+\.mlp\.experts)\.(?P<idx>\d+)\.(?P<part>gate_proj|up_proj)\.weight$",
            target=r"\g<pre>.gate_up_proj", parts=("gate_proj", "up_proj")),
        CollectRule(
            pattern=r"^(?P<pre>model\.layers\.\d+\.mlp\.experts)\.(?P<idx>\d+)\.down_proj\.weight$",
            target=r"\g<pre>.down_proj"),
    )

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        conv_dim = 2 * cfg.linear_num_key_heads * cfg.linear_key_head_dim \
            + cfg.linear_num_value_heads * cfg.linear_value_head_dim
        block_types = ["attention" if t == "full_attention" else "linear"
                       for t in cfg.layer_types]
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=block_types,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            conv_shape=(conv_dim, cfg.linear_conv_kernel_dim),
            ssm_shape=(cfg.linear_num_value_heads, cfg.linear_key_head_dim,
                       cfg.linear_value_head_dim))


class Qwen3NextModelStandalone(LlamaModelStandalone):
    config_class = Qwen3NextConfig
    model_cls = Qwen3NextModel
