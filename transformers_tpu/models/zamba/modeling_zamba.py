"""Zamba: Mamba(v1) backbone with a SHARED global attention block, TPU-native
(reference src/transformers/models/zamba/modeling_zamba.py).

Every layer is a Mamba1 mixer; at every ``attn_layer_period``-th layer a
rope-free transformer block (attention over the CONCAT of the running hidden
state with the original word embeddings — input width 2H, softmax scale
(head_dim/2)^-0.5, reference ZambaAttention:113-125) runs first and its
output is linearly projected and ADDED to the mamba input (fig. 2 of the
Zamba paper, reference ZambaHybridLayer:724).

The reference shares ONE attention block across all hybrid layers (tied
weights); torch's checkpoint serializes the weights at every hybrid layer's
``shared_transf`` path, so loading per-layer copies is value-identical.

Zamba's Mamba mixer is multi-head (reference ZambaMambaMixer:394): x_proj /
dt_proj / A / D are per-head over ``n_mamba_heads`` splits of the
intermediate dim, making B and C PER-HEAD selective parameters — the scan
here broadcasts them per channel and runs one associative scan over the
flat [B, L, I] layout (no per-head python loop)."""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import HybridCache, init_hybrid_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..llama.modeling_llama import DECODER_TP_PLAN, LlamaAttention, LlamaMLP
from .configuration_zamba import ZambaConfig


def zamba_selective_scan(x, dt, A, B, C, D):
    """Associative selective scan with PER-CHANNEL B/C.

    x/dt [B,L,I]; A [I,N]; B/C [B,L,I,N]; D [I]. Returns (y [B,L,I],
    final_state [B,I,N])."""
    dA = jnp.exp(dt[..., None] * A[None, None])  # [B,L,I,N]
    dBx = dt[..., None] * B * x[..., None]

    def combine(left, right):
        aL, bL = left
        aR, bR = right
        return aL * aR, aR * bL + bR

    _, states = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    y = jnp.einsum("blin,blin->bli", states, C) + x * D[None, None]
    return y, states[:, -1]


class ZambaMambaMixer(Module):
    """Multi-head Mamba1 mixer (reference ZambaMambaMixer:394)."""

    def __init__(self, config: ZambaConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.intermediate = config.mamba_expand * config.hidden_size
        self.state_size = config.mamba_d_state
        self.conv_kernel = config.mamba_d_conv
        self.time_step_rank = config.mamba_dt_rank
        self.n_heads = config.n_mamba_heads
        self.head_dim = self.intermediate // self.n_heads
        self.use_conv_bias = config.mamba_conv_bias
        self.act = get_activation(config.hidden_mamba_act)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj = Linear(config.hidden_size, self.intermediate * 2,
                              config.mamba_proj_bias, **kw)
        self.out_proj = Linear(self.intermediate, config.hidden_size,
                               config.mamba_proj_bias, **kw)

    def init(self, rng):
        import numpy as np

        params = super().init(rng)
        h, d, r, n = self.n_heads, self.head_dim, self.time_step_rank, self.state_size
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        params["conv1d"] = {"weight": jax.random.normal(
            k1, (self.intermediate, 1, self.conv_kernel), self.param_dtype) * 0.1}
        if self.use_conv_bias:
            params["conv1d"]["bias"] = jnp.zeros((self.intermediate,), self.param_dtype)
        params["x_proj_weight"] = jax.random.normal(
            k2, (h, r + 2 * n, d), self.param_dtype) * 0.02
        params["dt_proj_weight"] = (jax.random.uniform(k2, (h, d, r), self.param_dtype)
                                    - 0.5) * 2 / r ** 0.5
        params["dt_proj_bias"] = jnp.zeros((h, d), self.param_dtype)
        A = jnp.broadcast_to(jnp.arange(1, n + 1, dtype=jnp.float32)[None],
                             (self.intermediate, n))
        params["A_log"] = jnp.log(A).reshape(h, d, n).astype(self.param_dtype)
        params["D"] = jnp.ones((h, d), self.param_dtype)
        return params

    def _conv_full(self, params, x):
        w = params["conv1d"]["weight"].astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            jnp.swapaxes(x, 1, 2).astype(jnp.float32), w, window_strides=(1,),
            padding=[(self.conv_kernel - 1, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=self.intermediate)
        if self.use_conv_bias:
            y = y + params["conv1d"]["bias"].astype(jnp.float32)[None, :, None]
        return jnp.swapaxes(y, 1, 2)

    def __call__(self, params, hidden, cache, attention_mask=None):
        b, s, _ = hidden.shape
        h_heads, d, r, n = self.n_heads, self.head_dim, self.time_step_rank, self.state_size
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        proj = self.in_proj(params["in_proj"], hidden)  # [B, L, 2I]
        # x/gate interleave channel-pairwise, NOT contiguous halves (reference
        # :480 ``projected_states.view(b, -1, 2, L).chunk(2, dim=2)``)
        proj = proj.reshape(b, s, self.intermediate, 2)
        x, gate = proj[..., 0], proj[..., 1]
        A = -jnp.exp(params["A_log"].astype(jnp.float32)).reshape(self.intermediate, n)
        D = params["D"].astype(jnp.float32).reshape(self.intermediate)

        decode = cache is not None and cache.initialized and s == 1
        if decode:
            conv_state = cache.conv_states[self.layer_idx]
            conv_state = jnp.concatenate(
                [conv_state[:, :, 1:], jnp.swapaxes(x, 1, 2).astype(conv_state.dtype)], axis=2)
            w = params["conv1d"]["weight"].astype(jnp.float32)[:, 0, :]
            cx = jnp.sum(conv_state.astype(jnp.float32) * w[None], axis=-1)
            if self.use_conv_bias:
                cx = cx + params["conv1d"]["bias"].astype(jnp.float32)[None]
            cx = self.act(cx)[:, None, :]
        else:
            if attention_mask is not None:
                x = x * attention_mask[..., None].astype(x.dtype)
            cx = self.act(self._conv_full(params, x))
            if cache is not None:
                pad = jnp.zeros((b, self.intermediate, max(self.conv_kernel - s, 0)), jnp.float32)
                conv_state = jnp.concatenate(
                    [pad, jnp.swapaxes(x.astype(jnp.float32), 1, 2)], axis=2)[:, :, -self.conv_kernel:]

        if attention_mask is not None and not decode:
            cx = cx * attention_mask[..., None].astype(cx.dtype)

        # per-head selective parameters (reference :530-538)
        ch = cx.reshape(b, -1, h_heads, d)
        dbc = jnp.einsum("blhd,hkd->blhk", ch.astype(jnp.float32),
                         params["x_proj_weight"].astype(jnp.float32))
        dt_in, Bh, Ch = jnp.split(dbc, [r, r + n], axis=-1)
        dt = jnp.einsum("blhr,hdr->blhd", dt_in,
                        params["dt_proj_weight"].astype(jnp.float32))
        dt = jax.nn.softplus(dt + params["dt_proj_bias"].astype(jnp.float32)[None, None])
        dtf = dt.reshape(b, -1, self.intermediate)
        # broadcast per-head B/C to per-channel
        Bf = jnp.broadcast_to(Bh[:, :, :, None, :], (b, ch.shape[1], h_heads, d, n)
                              ).reshape(b, -1, self.intermediate, n)
        Cf = jnp.broadcast_to(Ch[:, :, :, None, :], (b, ch.shape[1], h_heads, d, n)
                              ).reshape(b, -1, self.intermediate, n)

        xf = cx.astype(jnp.float32)
        if decode:
            ssm = cache.ssm_states[self.layer_idx].astype(jnp.float32)  # [B, I, N]
            dA = jnp.exp(dtf[:, 0, :, None] * A[None])
            dBx = dtf[:, 0, :, None] * Bf[:, 0] * xf[:, 0, :, None]
            ssm = dA * ssm + dBx
            y = jnp.sum(ssm * Cf[:, 0], axis=-1)[:, None, :] + xf * D[None, None]
            final_state = ssm
        else:
            y, final_state = zamba_selective_scan(xf, dtf, A, Bf, Cf, D)

        y = y * self.act(gate.astype(jnp.float32))
        out = self.out_proj(params["out_proj"], y.astype(self.dtype))
        if cache is not None:
            cache = replace(
                cache,
                conv_states=cache.conv_states[: self.layer_idx]
                + (conv_state.astype(cache.conv_states[self.layer_idx].dtype),)
                + cache.conv_states[self.layer_idx + 1:],
                ssm_states=cache.ssm_states[: self.layer_idx]
                + (final_state.astype(cache.ssm_states[self.layer_idx].dtype),)
                + cache.ssm_states[self.layer_idx + 1:],
            )
        return out, cache

    def param_load_transform(self, name, arr):
        return arr


class ZambaAttention(LlamaAttention):
    """Input width 2H, softmax scale (head_dim/2)^-0.5, NoPE (reference :113)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.scale = (self.head_dim / 2) ** -0.5

    def build_projections(self, config, qkv_bias, o_bias, kw):
        ah = config.attention_hidden_size
        self.q_proj = Linear(ah, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(ah, self.num_kv_heads * self.head_dim, False, **kw)
        self.v_proj = Linear(ah, self.num_kv_heads * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, config.hidden_size,
                             False, **kw)


class ZambaAttentionBlock(Module):
    """The shared transformer block: attention on concat([h, embeds]) then a
    gelu-gated MLP — no internal residuals (reference
    ZambaAttentionDecoderLayer:621)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = ZambaAttention(config, layer_idx, **kw)
        self.feed_forward = LlamaMLP(config, **kw)
        self.input_layernorm = RMSNorm(config.attention_hidden_size,
                                       config.rms_norm_eps, **kw)
        self.pre_ff_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, original, attn_args, cache, cache_position):
        h = jnp.concatenate([hidden, original], axis=-1)
        h = self.input_layernorm(params["input_layernorm"], h)
        h, cache = self.self_attn(params["self_attn"], h, None, None, attn_args,
                                  cache, cache_position)
        h = self.pre_ff_layernorm(params["pre_ff_layernorm"], h)
        return self.feed_forward(params["feed_forward"], h), cache


class ZambaMambaDecoderLayer(Module):
    """Pre-norm mamba residual block (reference :672). ``transformer_out`` is
    added to the input before the norm (eq. 6)."""

    mixer_cls = ZambaMambaMixer

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.mamba = self.mixer_cls(config, layer_idx, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, cache, mamba_mask, transformer_out=None):
        residual = hidden
        if transformer_out is not None:
            hidden = hidden + transformer_out
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.mamba(params["mamba"], h, cache, mamba_mask)
        return residual + h, cache


class ZambaHybridLayer(Module):
    """shared transformer -> linear -> mamba layer (reference :724).

    The reference TIES one ZambaAttentionDecoderLayer across all hybrid
    layers (ZambaModel:836-843); here only the FIRST hybrid layer owns the
    shared block's params — later layers hold an unregistered module (own
    layer_idx for KV-cache indexing) and are called with the first layer's
    param subtree."""

    def __init__(self, config, layer_idx, *, own_shared=True, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        block = ZambaAttentionBlock(config, layer_idx, **kw)
        if own_shared:
            self.shared_transf = block
        else:
            object.__setattr__(self, "shared_transf", block)  # not a child
        self.linear = Linear(config.hidden_size, config.hidden_size, False,
                             dtype=dtype, param_dtype=param_dtype,
                             kernel_init=normal_init(config.initializer_range))
        self.mamba_decoder = ZambaMambaDecoderLayer(config, layer_idx, **kw)

    def __call__(self, params, hidden, original, attn_args, cache, cache_position,
                 mamba_mask, shared_params=None):
        t, cache = self.shared_transf(
            shared_params if shared_params is not None else params["shared_transf"],
            hidden, original, attn_args, cache, cache_position)
        t = self.linear(params["linear"], t)
        return self.mamba_decoder(params["mamba_decoder"], hidden, cache,
                                  mamba_mask, transformer_out=t)


class ZambaModel(Module):
    """Reference ZambaModel:820 — NoPE; word embeddings are re-fed to every
    shared attention block."""

    hybrid_layer_cls = ZambaHybridLayer
    mamba_layer_cls = ZambaMambaDecoderLayer

    def __init__(self, config: ZambaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(
            config.vocab_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.block_types = config.layers_block_type
        hybrid_idxs = [i for i, t in enumerate(self.block_types) if t == "hybrid"]
        self.first_hybrid = hybrid_idxs[0] if hybrid_idxs else None
        self.layers = [
            (self.hybrid_layer_cls(config, i, own_shared=(i == self.first_hybrid), **kw)
             if t == "hybrid" else self.mamba_layer_cls(config, i, **kw))
            for i, t in enumerate(self.block_types)
        ]
        self.final_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[HybridCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = inputs_embeds
        original = inputs_embeds
        b, s, _ = hidden.shape

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        mamba_mask = attention_mask
        if mamba_mask is not None and mamba_mask.shape[1] != s:
            mamba_mask = mamba_mask[:, :s] if not (
                past_key_values is not None and past_key_values.initialized) else None

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            if self.block_types[i] == "hybrid":
                shared = params["layers"][str(self.first_hybrid)]["shared_transf"]
                hidden, cache = layer(params["layers"][str(i)], hidden, original,
                                      attn_args, cache, cache_position, mamba_mask,
                                      shared_params=shared)
            else:
                hidden, cache = layer(params["layers"][str(i)], hidden, cache,
                                      mamba_mask)
        hidden = self.final_layernorm(params["final_layernorm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class ZambaPreTrainedModel(PreTrainedModel):
    config_class = ZambaConfig
    base_model_prefix = "model"


class ZambaForCausalLM(ZambaPreTrainedModel, GenerationMixin):
    model_cls = ZambaModel
    _tp_plan = DECODER_TP_PLAN

    @property
    def _weight_rules(self):
        # whichever hybrid layer's copy of the tied shared block the torch
        # checkpoint kept, route it to the first hybrid layer's slot
        first = self.model.first_hybrid
        if first is None:
            return ()
        from ...core.loading import WeightRule

        return (WeightRule(
            pattern=r"^model\.layers\.\d+\.(shared_transf\..*)$",
            rename=rf"model.layers.{first}.\g<1>"),)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states: bool = False) -> CausalLMOutputWithPast:
        outputs = self.model(
            params["model"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.model.embed_tokens.attend(params["model"]["embed_tokens"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        inter = cfg.mamba_expand * cfg.hidden_size
        block_types = ["parallel" if t == "hybrid" else "mamba"
                       for t in cfg.layers_block_type]
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=block_types,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.attention_head_dim,
            conv_shape=(inter, cfg.mamba_d_conv),
            ssm_shape=(inter, cfg.mamba_d_state))


class ZambaModelStandalone(ZambaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = ZambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
