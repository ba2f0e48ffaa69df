"""Zamba2: Mamba2 (SSD) backbone with SHARED transformer blocks, TPU-native
(reference src/transformers/models/zamba2/modular_zamba2.py).

Differences vs Zamba v1:
- the mamba mixer is the Mamba2 chunked-SSD mixer with grouped gated
  RMSNorm (group count = ``mamba_ngroups``), reused from
  ``..mamba2.Mamba2Mixer`` via a config-view adapter;
- ``num_mem_blocks`` distinct shared transformer blocks are CYCLED across
  the hybrid layers (v1 has one); the first hybrid layer of each block owns
  the tied params, later layers reference them;
- the shared block's MLP is a FUSED gate_up projection (chunk(2): gate rows
  then up rows, gelu gate) and, like the attention q/k/v, carries per-layer
  UNTIED low-rank adapters (LoRA-shaped, used in the base model — reference
  modular_zamba2.py Zamba2Attention docstring);
- optional rope (``use_mem_rope``) inside the shared attention at
  ``attention_head_dim = 2H / num_heads``.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import init_hybrid_cache
from ...core.module import Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutputWithPast
from ...ops.activations import get_activation
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..mamba2.modeling_mamba2 import Mamba2Mixer
from ..zamba.modeling_zamba import (
    ZambaAttention,
    ZambaForCausalLM,
    ZambaMambaDecoderLayer,
    ZambaModel,
    ZambaModelStandalone,
    ZambaPreTrainedModel,
)
from .configuration_zamba2 import Zamba2Config


def _mamba2_view(config: Zamba2Config):
    """Zamba2's mamba_* fields mapped onto the names Mamba2Mixer reads."""
    return SimpleNamespace(
        hidden_size=config.hidden_size,
        num_heads=config.n_mamba_heads,
        head_dim=config.mamba_headdim,
        n_groups=config.mamba_ngroups,
        state_size=config.mamba_d_state,
        conv_kernel=config.mamba_d_conv,
        intermediate_size=int(config.mamba_expand * config.hidden_size),
        chunk_size=config.chunk_size,
        time_step_limit=(config.time_step_min, float("inf")),
        layer_norm_epsilon=1e-5,
        use_bias=config.add_bias_linear,
        use_conv_bias=True,
        hidden_act="silu",
        initializer_range=config.initializer_range,
        time_step_min=config.time_step_min,
        time_step_max=config.time_step_max,
        time_step_floor=config.time_step_floor,
        # grouped gated norm: group_size = intermediate / n_groups
        gated_norm_groups=config.mamba_ngroups,
    )


class _LoRAAdapter(Module):
    """nn.Sequential(Linear(d_in, r), Linear(r, d_out)) — hub child names
    "0"/"1" (reference Zamba2Attention linear_q_adapter)."""

    def __init__(self, d_in, rank, d_out, init_range, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(init_range))
        self._children["0"] = Linear(d_in, rank, False, **kw)
        self._children["1"] = Linear(rank, d_out, False, **kw)

    def __call__(self, params, x):
        return self._children["1"](params["1"], self._children["0"](params["0"], x))


class _NoAdapter(Module):
    """nn.Identity placeholder: no params, slot kept for hub index parity."""

    def init(self, rng):
        return {}


class Zamba2Attention(ZambaAttention):
    """Zamba shared attention (input 2H, scale (head_dim/2)^-0.5) plus
    per-layer q/k/v adapters and optional rope."""

    def __init__(self, config, layer_idx, *, block_id, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.block_id = block_id
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        num_g = len(config.hybrid_layer_ids)
        if config.use_shared_attention_adapter:
            ah = config.attention_hidden_size
            r = config.adapter_rank
            for name in ("linear_q_adapter_list", "linear_k_adapter_list",
                         "linear_v_adapter_list"):
                mods = [
                    _LoRAAdapter(ah, r, ah, config.initializer_range, **kw)
                    if i % config.num_mem_blocks == block_id else _NoAdapter(**kw)
                    for i in range(num_g)
                ]
                setattr(self, name, mods)

    def project_qkv_adapted(self, params, hidden, g):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden)
        k = self.k_proj(params["k_proj"], hidden)
        v = self.v_proj(params["v_proj"], hidden)
        if self.config.use_shared_attention_adapter:
            q = q + self.linear_q_adapter_list[g](
                params["linear_q_adapter_list"][str(g)], hidden)
            k = k + self.linear_k_adapter_list[g](
                params["linear_k_adapter_list"][str(g)], hidden)
            v = v + self.linear_v_adapter_list[g](
                params["linear_v_adapter_list"][str(g)], hidden)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_kv_heads, self.head_dim)
        v = v.reshape(b, s, self.num_kv_heads, self.head_dim)
        return q, k, v

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position,
                 g=None):
        # stash the adapter index for project_qkv (the base __call__ drives
        # projection/rope/cache/attention)
        self._adapter_idx = g
        return super().__call__(params, hidden, cos, sin, attn_args, cache,
                                cache_position)

    def project_qkv(self, params, hidden):
        return self.project_qkv_adapted(params, hidden, self._adapter_idx)


class Zamba2MLP(Module):
    """Fused gate_up (chunk(2), gelu gate) + per-layer untied adapter
    (reference Zamba2MLP)."""

    def __init__(self, config, *, block_id, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.intermediate = config.intermediate_size
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_up_proj = Linear(config.hidden_size, 2 * config.intermediate_size,
                                   config.add_bias_linear, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size,
                                config.add_bias_linear, **kw)
        self.act_fn = get_activation(config.hidden_act)
        num_g = len(config.hybrid_layer_ids)
        self.gate_up_proj_adapter_list = [
            _LoRAAdapter(config.hidden_size, config.adapter_rank,
                         2 * config.intermediate_size, config.initializer_range,
                         dtype=dtype, param_dtype=param_dtype)
            if i % config.num_mem_blocks == block_id
            else _NoAdapter(dtype=dtype, param_dtype=param_dtype)
            for i in range(num_g)
        ]

    def __call__(self, params, x, g):
        gu = self.gate_up_proj(params["gate_up_proj"], x)
        gu = gu + self.gate_up_proj_adapter_list[g](
            params["gate_up_proj_adapter_list"][str(g)], x)
        gate, up = gu[..., :self.intermediate], gu[..., self.intermediate:]
        return self.down_proj(params["down_proj"], self.act_fn(gate) * up)


class Zamba2AttentionBlock(Module):
    """The shared transformer block (reference Zamba2AttentionDecoderLayer):
    attention over concat([h, embeds]) then the fused-gate_up MLP — no
    internal residuals."""

    def __init__(self, config, layer_idx, *, block_id, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = Zamba2Attention(config, layer_idx, block_id=block_id, **kw)
        self.feed_forward = Zamba2MLP(config, block_id=block_id, **kw)
        self.input_layernorm = RMSNorm(config.attention_hidden_size,
                                       config.rms_norm_eps, **kw)
        self.pre_ff_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, hidden, original, attn_args, cache, cache_position,
                 cos=None, sin=None, g=None):
        h = jnp.concatenate([hidden, original], axis=-1)
        h = self.input_layernorm(params["input_layernorm"], h)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                  cache, cache_position, g=g)
        h = self.pre_ff_layernorm(params["pre_ff_layernorm"], h)
        return self.feed_forward(params["feed_forward"], h, g), cache


class Zamba2MambaDecoderLayer(ZambaMambaDecoderLayer):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.mamba = Mamba2Mixer(_mamba2_view(config), layer_idx, **kw)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)


class Zamba2HybridLayer(Module):
    """shared block -> linear -> mamba2 layer. ``shared_transformer`` is the
    hub child name (v1 used ``shared_transf``)."""

    def __init__(self, config, layer_idx, *, block_id, own_shared, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        block = Zamba2AttentionBlock(config, layer_idx, block_id=block_id, **kw)
        if own_shared:
            self.shared_transformer = block
        else:
            object.__setattr__(self, "shared_transformer", block)  # not a child
        self.linear = Linear(config.hidden_size, config.hidden_size, False,
                             dtype=dtype, param_dtype=param_dtype,
                             kernel_init=normal_init(config.initializer_range))
        self.mamba_decoder = Zamba2MambaDecoderLayer(config, layer_idx, **kw)

    def __call__(self, params, hidden, original, attn_args, cache, cache_position,
                 mamba_mask, shared_params=None, cos=None, sin=None, g=None):
        t, cache = self.shared_transformer(
            shared_params if shared_params is not None else params["shared_transformer"],
            hidden, original, attn_args, cache, cache_position, cos=cos, sin=sin, g=g)
        t = self.linear(params["linear"], t)
        return self.mamba_decoder(params["mamba_decoder"], hidden, cache,
                                  mamba_mask, transformer_out=t)


class Zamba2Model(ZambaModel):
    """Reference Zamba2Model: num_mem_blocks shared blocks cycled over the
    hybrid layers; optional rope fed to the shared attention."""

    def __init__(self, config: Zamba2Config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Embedding

        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(
            config.vocab_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.block_types = config.layers_block_type
        hybrid_ids = config.hybrid_layer_ids
        # blocks are CYCLED over the hybrid layers in order: the g-th hybrid
        # layer uses block g % num_mem_blocks; the first hybrid layer of each
        # block owns the tied params
        self.hybrid_pos = {li: g for g, li in enumerate(hybrid_ids)}
        self.block_owner = {}
        for g, li in enumerate(hybrid_ids):
            self.block_owner.setdefault(g % config.num_mem_blocks, li)
        self.layers = [
            (Zamba2HybridLayer(
                config, i, block_id=self.hybrid_pos[i] % config.num_mem_blocks,
                own_shared=(self.block_owner[self.hybrid_pos[i] % config.num_mem_blocks] == i),
                **kw)
             if t == "hybrid" else Zamba2MambaDecoderLayer(config, i, **kw))
            for i, t in enumerate(self.block_types)
        ]
        self.final_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        if config.use_mem_rope:
            rope_cfg = SimpleNamespace(
                head_dim=config.attention_head_dim, rope_theta=config.rope_theta,
                rope_scaling=None, partial_rotary_factor=1.0,
                max_position_embeddings=config.max_position_embeddings,
                hidden_size=config.hidden_size,
                num_attention_heads=config.num_attention_heads)
            self.inv_freq, self.attention_scaling = rope_inv_freq(rope_cfg)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states: bool = False) -> BaseModelOutputWithPast:
        from dataclasses import replace

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

        cos = sin = None
        if self.config.use_mem_rope:
            if position_ids is None:
                position_ids = q_positions
            cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                       self.attention_scaling, dtype=self.dtype)

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
                owner = self.block_owner[self.hybrid_pos[i] % self.config.num_mem_blocks]
                shared = params["layers"][str(owner)]["shared_transformer"]
                hidden, cache = layer(params["layers"][str(i)], hidden, original,
                                      attn_args, cache, cache_position, mamba_mask,
                                      shared_params=shared, cos=cos, sin=sin,
                                      g=self.hybrid_pos[i])
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


class Zamba2PreTrainedModel(ZambaPreTrainedModel):
    config_class = Zamba2Config


class Zamba2ForCausalLM(ZambaForCausalLM):
    config_class = Zamba2Config
    model_cls = Zamba2Model

    @property
    def _weight_rules(self):
        # route every hybrid layer's tied shared-block copy to its block
        # owner's slot (the checkpoint may keep any one of the tied copies)
        from ...core.loading import WeightRule

        rules = []
        for bid, owner in self.model.block_owner.items():
            members = [li for g, li in enumerate(self.config.hybrid_layer_ids)
                       if g % self.config.num_mem_blocks == bid]
            pat = "|".join(str(li) for li in members)
            rules.append(WeightRule(
                pattern=rf"^model\.layers\.(?:{pat})\.(shared_transformer\..*)$",
                rename=rf"model.layers.{owner}.\g<1>"))
        return tuple(rules)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        cfg = self.config
        inter = int(cfg.mamba_expand * cfg.hidden_size)
        conv_dim = inter + 2 * cfg.mamba_ngroups * cfg.mamba_d_state
        block_types = ["parallel" if t == "hybrid" else "mamba"
                       for t in cfg.layers_block_type]
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=block_types,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.attention_head_dim,
            conv_shape=(conv_dim, cfg.mamba_d_conv),
            ssm_shape=(cfg.n_mamba_heads, cfg.mamba_headdim, cfg.mamba_d_state))


class Zamba2ModelStandalone(ZambaModelStandalone):
    config_class = Zamba2Config

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        ZambaPreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        self.model = Zamba2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
