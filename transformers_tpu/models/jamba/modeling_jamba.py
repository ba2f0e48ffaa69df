"""Jamba: Mamba(v1)/attention hybrid MoE decoder, TPU-native.

Semantics match reference src/transformers/models/jamba/modeling_jamba.py:
Mamba1 mixers with *weighted* RMS norms on dt/B/C after the x_proj split
(:488-490, :558-560), rope-free GQA attention every ``attn_layer_period``-th
layer (:151), a sparse-MoE feed-forward (softmax-then-topk, NO renormalize,
:692-695) every ``expert_layer_period``-th layer, shared
``input_layernorm``/``pre_ff_layernorm`` pre-norm block (:707-780),
final_layernorm, untied lm_head. Checkpoint layout
``model.layers.N.{self_attn|mamba,feed_forward[.router/.experts.E]}``.

TPU-native: the Mamba math is the shared associative-scan mixer
(models/mamba), the MoE is the registry-dispatched dense/ragged grouped
matmul (ops/moe.py), and one `HybridCache` pytree carries KV buffers +
recurrent states so decode jits into a single program.
"""

from __future__ import annotations

from dataclasses import replace
from types import SimpleNamespace
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import HybridCache, init_hybrid_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.moe import get_experts_fn, topk_routing
from ..llama.modeling_llama import DECODER_TP_PLAN, LlamaAttention, LlamaMLP
from ..mamba.modeling_mamba import MambaMixer
from .configuration_jamba import JambaConfig


def mamba1_view_from_jamba(config):
    """Map Jamba's ``mamba_*`` config fields onto the MambaConfig names
    `MambaMixer` reads (reference configuration_jamba.py)."""
    return SimpleNamespace(
        hidden_size=config.hidden_size,
        intermediate_size=int(config.mamba_expand * config.hidden_size),
        state_size=config.mamba_d_state,
        conv_kernel=config.mamba_d_conv,
        time_step_rank=config.mamba_dt_rank,
        use_bias=config.mamba_proj_bias,
        use_conv_bias=config.mamba_conv_bias,
        hidden_act=config.hidden_act,
        initializer_range=config.initializer_range,
    )


class JambaMambaMixer(MambaMixer):
    """Mamba1 mixer + weighted dt/B/C RMS norms (reference :488-490)."""

    def __init__(self, config: JambaConfig, layer_idx, *, dtype, param_dtype):
        view = mamba1_view_from_jamba(config)
        super().__init__(view, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dt_layernorm = RMSNorm(config.mamba_dt_rank, config.rms_norm_eps, **kw)
        self.b_layernorm = RMSNorm(config.mamba_d_state, config.rms_norm_eps, **kw)
        self.c_layernorm = RMSNorm(config.mamba_d_state, config.rms_norm_eps, **kw)

    def normalize_dt_b_c(self, params, dt_in, B, C):
        return (self.dt_layernorm(params["dt_layernorm"], dt_in),
                self.b_layernorm(params["b_layernorm"], B),
                self.c_layernorm(params["c_layernorm"], C))


class JambaSparseMoeBlock(Module):
    """Softmax-then-topk router WITHOUT renormalization (reference :692-695);
    experts keep the ``experts.E.{gate,up,down}_proj`` checkpoint layout."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.top_k = config.num_experts_per_tok
        self.num_experts = config.num_experts
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.router = Linear(config.hidden_size, config.num_experts, False, **kw)
        self.experts = [LlamaMLP(config, dtype=dtype, param_dtype=param_dtype)
                        for _ in range(config.num_experts)]
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden):
        b, s, h = hidden.shape
        x = hidden.reshape(b * s, h)
        router_logits = self.router(params["router"], x)
        weights, idx = topk_routing(router_logits, self.top_k, renormalize=False)
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
        return out.reshape(b, s, h).astype(hidden.dtype)


class JambaDecoderLayer(Module):
    """Reference :707 (attention variant) / :745 (mamba variant)."""

    attention_cls = LlamaAttention

    def __init__(self, config, layer_idx: int, block_type: str, num_experts: int,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = block_type
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.pre_ff_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        if num_experts > 1:
            self.feed_forward = JambaSparseMoeBlock(config, **kw)
        else:
            self.feed_forward = LlamaMLP(config, **kw)
        if block_type == "attention":
            self.self_attn = self.attention_cls(config, layer_idx, **kw)
        else:
            self.mamba = JambaMambaMixer(config, layer_idx, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position,
                 mamba_mask):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        if self.block_type == "attention":
            h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                      cache, cache_position)
        else:
            h, cache = self.mamba(params["mamba"], h, cache, mamba_mask)
        hidden = residual + h
        residual = hidden
        h = self.pre_ff_layernorm(params["pre_ff_layernorm"], hidden)
        h = self.feed_forward(params["feed_forward"], h)
        return residual + h, cache


class JambaModel(Module):
    """Reference JambaModel — NOTE: no positional embeddings at all (the
    mamba layers carry position; attention is NoPE)."""

    decoder_layer_cls = JambaDecoderLayer

    def __init__(self, config: JambaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        blocks = config.layers_block_type
        n_exp = config.layers_num_experts
        self.layers = [
            self.decoder_layer_cls(config, i, blocks[i], n_exp[i], **kw)
            for i in range(config.num_hidden_layers)
        ]
        self.final_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[HybridCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = inputs_embeds
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
            hidden, cache = layer(params["layers"][str(i)], hidden, None, None,
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


class JambaPreTrainedModel(PreTrainedModel):
    config_class = JambaConfig
    base_model_prefix = "model"


class JambaForCausalLM(JambaPreTrainedModel, GenerationMixin):
    model_cls = JambaModel
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
        inter = int(cfg.mamba_expand * cfg.hidden_size)
        return init_hybrid_cache(
            batch_size=batch_size, max_len=max_len, dtype=dtype or self.dtype,
            block_types=cfg.layers_block_type,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.hidden_size // cfg.num_attention_heads,
            conv_shape=(inter, cfg.mamba_d_conv),
            ssm_shape=(inter, cfg.mamba_d_state))


class JambaModelStandalone(JambaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = JambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
