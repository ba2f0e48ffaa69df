"""FalconH1: parallel Mamba2+attention hybrid decoder, TPU-native.

Semantics match reference src/transformers/models/falcon_h1/modeling_falcon_h1.py:
EVERY layer runs a Mamba2 mixer AND GQA attention on the same normed input,
summing the two outputs (:864-935 — ``mamba·ssm_out_mult +
attn·attn_out_mult``), with μP multipliers throughout: key_multiplier on K
(:219), attention_in (:922), ssm_in (:681), a 5-section μP vector scaling the
in_proj output [z|x|B|C|dt] (:946-978), MLP gate/down multipliers (:835-839),
embedding (:1060) and lm_head (:1168) multipliers. The mixer differs from
Mamba2 only in: custom ``mamba_d_ssm`` width, OPTIONAL gated RMSNorm
(``mamba_rms_norm``; plain silu gating otherwise) with grouped,
norm-before-gate semantics (:248-283). Rope on attention (theta 100000).

TPU-native: one `HybridCache` with BOTH kv buffers and conv/ssm states at
every index ("parallel" block type) — the whole layer jits as one program.
"""

from __future__ import annotations

from dataclasses import replace
from types import SimpleNamespace
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...cache_utils import HybridCache, init_hybrid_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..llama.modeling_llama import DECODER_TP_PLAN, LlamaAttention
from ..mamba2.modeling_mamba2 import Mamba2Mixer
from .configuration_falcon_h1 import FalconH1Config


def _mixer_view(config: FalconH1Config):
    """Mamba2Mixer attribute view over FalconH1's config names."""
    inter = (config.mamba_d_ssm if config.mamba_d_ssm is not None
             else int(config.mamba_expand * config.hidden_size))
    limit = getattr(config, "time_step_limit", None)
    return SimpleNamespace(
        hidden_size=config.hidden_size,
        num_heads=config.mamba_n_heads,
        head_dim=config.mamba_d_head,
        n_groups=config.mamba_n_groups,
        state_size=config.mamba_d_state,
        conv_kernel=config.mamba_d_conv,
        intermediate_size=inter,
        chunk_size=config.mamba_chunk_size,
        time_step_limit=tuple(limit) if limit else (0.0, float("inf")),
        layer_norm_epsilon=config.rms_norm_eps,
        use_bias=config.mamba_proj_bias,
        out_proj_bias=config.projectors_bias,
        use_conv_bias=config.mamba_conv_bias,
        hidden_act=config.hidden_act,
        initializer_range=config.initializer_range,
        use_gated_rms_norm=config.mamba_rms_norm,
        norm_before_gate=config.mamba_norm_before_gate,
        gated_norm_groups=config.mamba_n_groups,
        time_step_min=0.001, time_step_max=0.1, time_step_floor=1e-4,
    )


def compute_mup_vector(config: FalconH1Config) -> np.ndarray:
    """Section-wise μP multipliers over the in_proj output [z|x|B|C|dt]
    (reference :946-978)."""
    inter = (config.mamba_d_ssm if config.mamba_d_ssm is not None
             else int(config.mamba_expand * config.hidden_size))
    gts = config.mamba_n_groups * config.mamba_d_state
    m = config.ssm_multipliers
    vec = np.ones(2 * inter + 2 * gts + config.mamba_n_heads, np.float32)
    vec[:inter] *= m[0]
    vec[inter:2 * inter] *= m[1]
    vec[2 * inter:2 * inter + gts] *= m[2]
    vec[2 * inter + gts:2 * inter + 2 * gts] *= m[3]
    vec[2 * inter + 2 * gts:] *= m[4]
    return vec


class FalconH1Mixer(Mamba2Mixer):
    """Mamba2 mixer + ssm_in multiplier + μP in_proj vector (reference :588)."""

    def __init__(self, config: FalconH1Config, layer_idx, *, dtype, param_dtype):
        super().__init__(_mixer_view(config), layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.ssm_in_multiplier = config.ssm_in_multiplier
        self.mup_vector = compute_mup_vector(config)

    def project_in(self, params, hidden):
        hidden = hidden * jnp.asarray(self.ssm_in_multiplier, hidden.dtype)
        proj = self.in_proj(params["in_proj"], hidden)
        return proj * jnp.asarray(self.mup_vector, proj.dtype)[None, None, :]


class FalconH1Attention(LlamaAttention):
    """GQA with K multiplied by ``key_multiplier`` (reference :219)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.key_multiplier = config.key_multiplier

    def project_qkv(self, params, hidden):
        q, k, v = super().project_qkv(params, hidden)
        return q, k * jnp.asarray(self.key_multiplier, k.dtype), v


class FalconH1MLP(Module):
    """SwiGLU with gate/down μP multipliers (reference :825-839)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = getattr(config, "mlp_bias", False)
        self.gate_proj = Linear(config.hidden_size, config.intermediate_size, bias, **kw)
        self.up_proj = Linear(config.hidden_size, config.intermediate_size, bias, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size, bias, **kw)
        self.act = get_activation(config.hidden_act)
        self.gate_multiplier, self.down_multiplier = config.mlp_multipliers

    def __call__(self, params, x):
        gate = self.gate_proj(params["gate_proj"], x) * jnp.asarray(
            self.gate_multiplier, x.dtype)
        y = self.up_proj(params["up_proj"], x) * self.act(gate)
        return self.down_proj(params["down_proj"], y) * jnp.asarray(
            self.down_multiplier, x.dtype)


class FalconH1DecoderLayer(Module):
    """Parallel SSM+attention block (reference :864)."""

    def __init__(self, config, layer_idx: int, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.pre_ff_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.feed_forward = FalconH1MLP(config, **kw)
        self.mamba = FalconH1Mixer(config, layer_idx, **kw)
        self.self_attn = FalconH1Attention(config, layer_idx, **kw)
        self.attention_in_multiplier = config.attention_in_multiplier
        self.ssm_out_multiplier = config.ssm_out_multiplier
        self.attn_out_multiplier = config.attention_out_multiplier

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position,
                 mamba_mask):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        m_out, cache = self.mamba(params["mamba"], h, cache, mamba_mask)
        m_out = m_out * jnp.asarray(self.ssm_out_multiplier, m_out.dtype)
        a_in = h * jnp.asarray(self.attention_in_multiplier, h.dtype)
        a_out, cache = self.self_attn(params["self_attn"], a_in, cos, sin, attn_args,
                                      cache, cache_position)
        a_out = a_out * jnp.asarray(self.attn_out_multiplier, a_out.dtype)
        hidden = residual + m_out + a_out
        residual = hidden
        h = self.pre_ff_layernorm(params["pre_ff_layernorm"], hidden)
        h = self.feed_forward(params["feed_forward"], h)
        return residual + h, cache


class FalconH1Model(Module):
    """Reference FalconH1Model (:1015)."""

    decoder_layer_cls = FalconH1DecoderLayer

    def __init__(self, config: FalconH1Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [self.decoder_layer_cls(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.final_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[HybridCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
            inputs_embeds = inputs_embeds * jnp.asarray(
                self.config.embedding_multiplier, self.dtype)
        hidden = inputs_embeds
        b, s, _ = hidden.shape

        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(
                cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)

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
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                  attn_args, cache, cache_position, mamba_mask)
        hidden = self.final_layernorm(params["final_layernorm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class FalconH1PreTrainedModel(PreTrainedModel):
    config_class = FalconH1Config
    base_model_prefix = "model"


class FalconH1ForCausalLM(FalconH1PreTrainedModel, GenerationMixin):
    model_cls = FalconH1Model
    _tp_plan = DECODER_TP_PLAN

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "model.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

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
        logits = logits * jnp.asarray(self.config.lm_head_multiplier, logits.dtype)
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
        v = _mixer_view(cfg)
        conv_dim = v.intermediate_size + 2 * v.n_groups * v.state_size
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=["parallel"] * cfg.num_hidden_layers,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=getattr(cfg, "head_dim", None) or cfg.hidden_size // cfg.num_attention_heads,
            conv_shape=(conv_dim, v.conv_kernel),
            ssm_shape=(v.num_heads, v.head_dim, v.state_size))


class FalconH1ModelStandalone(FalconH1PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = FalconH1Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
