"""MiniMax-Text-01 (reference models/minimax/modeling_minimax.py).

Hybrid decoder alternating full softmax attention with Lightning (linear)
attention: per-head slope rates decay a running ``K^T V`` state (:122-263);
blocks combine an intra-block masked QK^T V term with an inter-block
``Q @ state`` term, the state decaying by ``exp(-slope * block)`` per block.
The per-token decode recurrence is ``S = exp(-slope) * S + k^T v``. Output
passes a head-concat RMSNorm and a sigmoid gate from the *pre-attention*
hidden state (:252-257). Residuals use the MiniMax alpha/beta scalings with
the norm applied BEFORE the residual fork (:560-578). MoE is Mixtral-style
(``block_sparse_moe`` with w1/w2/w3 experts). The decay tables are
deterministic functions of (head, layer) and are recomputed, not loaded.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import HybridCache, init_hybrid_cache
from ...configuration_utils import PretrainedConfig
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...ops.activations import get_activation
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..mixtral.modeling_mixtral import MixtralSparseMoeBlock


class MiniMaxConfig(PretrainedConfig):
    model_type = "minimax"

    def __init__(self, vocab_size=32000, hidden_size=4096, intermediate_size=14336,
                 num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
                 head_dim=None, hidden_act="silu", max_position_embeddings=131072,
                 initializer_range=0.02, rms_norm_eps=1e-5, use_cache=True,
                 pad_token_id=None, bos_token_id=1, eos_token_id=2,
                 tie_word_embeddings=False, rope_theta=1e6, sliding_window=None,
                 attention_dropout=0.0, num_experts_per_tok=2, num_local_experts=8,
                 output_router_logits=False, router_aux_loss_coef=0.001,
                 router_jitter_noise=0.0, layer_types=None, block_size=256,
                 full_attn_alpha_factor=1, full_attn_beta_factor=1,
                 linear_attn_alpha_factor=1, linear_attn_beta_factor=1,
                 mlp_alpha_factor=1, mlp_beta_factor=1, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.head_dim = head_dim if head_dim is not None else hidden_size // num_attention_heads
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.use_cache = use_cache
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self.attention_dropout = attention_dropout
        self.num_experts_per_tok = num_experts_per_tok
        self.num_local_experts = num_local_experts
        self.output_router_logits = output_router_logits
        self.router_aux_loss_coef = router_aux_loss_coef
        self.router_jitter_noise = router_jitter_noise
        if layer_types is None:
            # even layers full attention, odd layers lightning (reference
            # configuration_minimax.py default)
            layer_types = ["full_attention" if i % 2 == 0 else "linear_attention"
                           for i in range(num_hidden_layers)]
        self.layer_types = layer_types
        self.block_size = block_size
        self.full_attn_alpha_factor = full_attn_alpha_factor
        self.full_attn_beta_factor = full_attn_beta_factor
        self.linear_attn_alpha_factor = linear_attn_alpha_factor
        self.linear_attn_beta_factor = linear_attn_beta_factor
        self.mlp_alpha_factor = mlp_alpha_factor
        self.mlp_beta_factor = mlp_beta_factor
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class MiniMaxLightningAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.head_dim = config.head_dim
        self.block_size = config.block_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size
        hd = self.num_heads * self.head_dim
        self.qkv_proj = Linear(h, hd * 3, False, **kw)
        self.out_proj = Linear(hd, h, False, **kw)
        self.output_gate = Linear(h, hd, False, **kw)
        # reference :135 builds this norm with the RMSNorm DEFAULT eps (1e-6),
        # not config.rms_norm_eps
        self.norm = RMSNorm(hd, 1e-6, dtype=dtype, param_dtype=param_dtype)
        self.act = get_activation(config.hidden_act)

        # deterministic decay tables (reference :147-170)
        base = 1.0 / (2.0 ** (8.0 / self.num_heads))
        exponent = np.arange(self.num_heads) + 1
        factor = 1 - layer_idx / (config.num_hidden_layers - 1 + 1e-5) + 1e-5
        self.slope_rate = (base ** exponent * factor)[:, None, None]  # [H,1,1]
        rng = np.arange(self.block_size) + 1
        self.query_decay = np.exp(-self.slope_rate * rng[:, None])  # [H,B,1]
        self.key_decay = np.exp(-self.slope_rate * (self.block_size - rng[:, None]))
        diag = rng[:, None] - rng[None, :]
        diag = self.slope_rate * diag[None]
        self.diagonal_decay = np.exp(np.where(diag >= 0, -diag, -np.inf))  # [H,B,B]

    def __call__(self, params, hidden, cache, attention_mask=None):
        b, s, _ = hidden.shape
        qkv = self.act(self.qkv_proj(params["qkv_proj"], hidden))
        if attention_mask is not None:
            qkv = qkv * attention_mask[..., None].astype(qkv.dtype)
        qkv = qkv.reshape(b, s, self.num_heads, 3 * self.head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.transpose(0, 2, 1, 3)  # [B,H,S,D]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        has_state = cache is not None and cache.initialized
        state = (cache.ssm_states[self.layer_idx] if has_state
                 else jnp.zeros((b, self.num_heads, self.head_dim, self.head_dim),
                                jnp.float32))
        slope = jnp.asarray(self.slope_rate, jnp.float32)[None]  # [1,H,1,1]

        if has_state and s == 1:
            # decode recurrence (reference :236-248)
            ratio = jnp.exp(-slope)
            state = ratio * state + jnp.einsum(
                "bhsd,bhse->bhde", k.astype(jnp.float32), v.astype(jnp.float32))
            out = jnp.einsum("bhsd,bhde->bhse", q.astype(jnp.float32), state)
        else:
            num_blocks = (s + self.block_size - 1) // self.block_size
            outs = []
            for i in range(num_blocks):
                lo = i * self.block_size
                hi = min(lo + self.block_size, s)
                bs = hi - lo
                cq = q[:, :, lo:hi].astype(jnp.float32)
                ck = k[:, :, lo:hi].astype(jnp.float32)
                cv = v[:, :, lo:hi].astype(jnp.float32)
                qd = jnp.asarray(self.query_decay[:, :bs], jnp.float32)[None]
                kd = jnp.asarray(self.key_decay[:, -bs:], jnp.float32)[None]
                dd = jnp.asarray(self.diagonal_decay[:, :bs, :bs], jnp.float32)[None]
                block_decay = jnp.exp(-slope * bs)
                intra = jnp.einsum("bhqd,bhkd->bhqk", cq, ck)
                o = (jnp.einsum("bhqk,bhkd->bhqd", intra * dd, cv)
                     + jnp.einsum("bhqd,bhde->bhqe", cq * qd, state))
                outs.append(o)
                state = state * block_decay + jnp.einsum(
                    "bhkd,bhke->bhde", ck * kd, cv)
            out = jnp.concatenate(outs, axis=2)

        if cache is not None:
            from dataclasses import replace as dc_replace

            ssm_states = list(cache.ssm_states)
            ssm_states[self.layer_idx] = state
            cache = dc_replace(cache, ssm_states=tuple(ssm_states))

        out = out.transpose(0, 2, 1, 3).reshape(b, s, -1).astype(self.dtype)
        out = self.norm(params["norm"], out)
        gate = jax.nn.sigmoid(self.output_gate(params["output_gate"], hidden))
        out = gate * out
        return self.out_proj(params["out_proj"], out), cache


class MiniMaxDecoderLayer(LlamaDecoderLayer):
    attention_cls = LlamaAttention
    mlp_cls = None

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = config.layer_types[layer_idx]
        self.input_layernorm = self.make_norm(config, **kw)
        self.post_attention_layernorm = self.make_norm(config, **kw)
        if self.block_type == "linear_attention":
            self.self_attn = MiniMaxLightningAttention(config, layer_idx, **kw)
            self.attn_alpha = config.linear_attn_alpha_factor
            self.attn_beta = config.linear_attn_beta_factor
        else:
            self.self_attn = self.attention_cls(config, layer_idx, **kw)
            self.attn_alpha = config.full_attn_alpha_factor
            self.attn_beta = config.full_attn_beta_factor
        self.block_sparse_moe = MixtralSparseMoeBlock(config, **kw)
        self.mlp_alpha = config.mlp_alpha_factor
        self.mlp_beta = config.mlp_beta_factor

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        hidden = self.input_layernorm(params["input_layernorm"], hidden)
        residual = hidden
        if self.block_type == "linear_attention":
            recurrent_mask = None
            if not (cache is not None and getattr(cache, "initialized", False)):
                kv_valid = attn_args.get("kv_valid")
                if kv_valid is not None:
                    recurrent_mask = kv_valid[:, : hidden.shape[1]]
            h, cache = self.self_attn(params["self_attn"], hidden, cache, recurrent_mask)
        else:
            h, cache = self.self_attn(params["self_attn"], hidden, cos, sin, attn_args,
                                      cache, cache_position)
        hidden = residual * self.attn_alpha + h * self.attn_beta
        hidden = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        residual = hidden
        h = self.block_sparse_moe(params["block_sparse_moe"], hidden)
        return residual * self.mlp_alpha + h * self.mlp_beta, cache


class MiniMaxModel(LlamaModel):
    decoder_layer_cls = MiniMaxDecoderLayer

    def __call__(self, params, *args, **kwargs):
        out = super().__call__(params, *args, **kwargs)
        cache = out.past_key_values
        if cache is not None and not cache.initialized:
            from dataclasses import replace as dc_replace

            out.past_key_values = dc_replace(cache, initialized=True)
        return out


class MiniMaxForCausalLM(LlamaForCausalLM):
    config_class = MiniMaxConfig
    model_cls = MiniMaxModel
    _keys_to_ignore_on_load_unexpected = (
        r"\.slope_rate$", r"\.query_decay$", r"\.key_decay$", r"\.diagonal_decay$")

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        cfg = self.config
        block_types = ["attention" if t == "full_attention" else "linear"
                       for t in cfg.layer_types]
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=block_types, num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim, conv_shape=(1, 1),
            ssm_shape=(cfg.num_attention_heads, cfg.head_dim, cfg.head_dim))


class MiniMaxModelStandalone(LlamaModelStandalone):
    config_class = MiniMaxConfig
    model_cls = MiniMaxModel
    _keys_to_ignore_on_load_unexpected = MiniMaxForCausalLM._keys_to_ignore_on_load_unexpected
