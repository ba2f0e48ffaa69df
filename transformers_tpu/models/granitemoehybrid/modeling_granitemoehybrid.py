"""GraniteMoeHybrid: GraniteMoe + Mamba2 hybrid decoder, TPU-native.

Semantics match reference
src/transformers/models/granitemoehybrid/modeling_granitemoehybrid.py:
per-layer Mamba2 mixer or GQA attention (:935-1000), granite scalar
multipliers (residual/embedding/logits/attention), per-layer MoE
(``block_sparse_moe``, stacked input/output_linear experts, top-k-then-
softmax router) PLUS an always-on fused-gate ``shared_mlp`` (:729-748) whose
outputs add (:995-997), optional NoPE (``position_embedding_type`` != "rope"
⇒ no rotary at all, :1049). Checkpoint layout
``model.layers.N.{mamba|self_attn,block_sparse_moe,shared_mlp}``.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import HybridCache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..bamba.modeling_bamba import mamba2_hybrid_cache
from ..granite.modeling_granite import GraniteAttention
from ..granitemoe.modeling_granitemoe import GraniteMoeMoE
from ..llama.modeling_llama import DECODER_TP_PLAN
from ..mamba2.modeling_mamba2 import Mamba2Mixer, mamba2_view_from_hybrid
from .configuration_granitemoehybrid import GraniteMoeHybridConfig


class GraniteMoeHybridSharedMLP(Module):
    """Fused-gate shared-expert MLP (reference :729-748)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.inter = config.shared_intermediate_size
        self.input_linear = Linear(config.hidden_size, 2 * self.inter, False, **kw)
        self.output_linear = Linear(self.inter, config.hidden_size, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        gate_up = self.input_linear(params["input_linear"], x)
        gate, up = gate_up[..., :self.inter], gate_up[..., self.inter:]
        return self.output_linear(params["output_linear"], self.act(gate) * up)


class GraniteMoeHybridDecoderLayer(Module):
    """Reference :935."""

    attention_cls = GraniteAttention

    def __init__(self, config, layer_idx: int, block_type: str, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = block_type
        self.residual_multiplier = config.residual_multiplier
        self.has_experts = getattr(config, "num_local_experts", 0) > 0
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.post_attention_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        if self.has_experts:
            self.block_sparse_moe = GraniteMoeMoE(config, **kw)
        self.shared_mlp = GraniteMoeHybridSharedMLP(config, **kw)
        if block_type == "attention":
            self.self_attn = self.attention_cls(config, layer_idx, **kw)
        else:
            self.mamba = Mamba2Mixer(mamba2_view_from_hybrid(config), layer_idx, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position,
                 mamba_mask):
        m = jnp.asarray(self.residual_multiplier, hidden.dtype)
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        if self.block_type == "attention":
            h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                      cache, cache_position)
        else:
            h, cache = self.mamba(params["mamba"], h, cache, mamba_mask)
        hidden = residual + h * m
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        if self.has_experts:
            h = (self.block_sparse_moe(params["block_sparse_moe"], h)
                 + self.shared_mlp(params["shared_mlp"], h))
        else:
            h = self.shared_mlp(params["shared_mlp"], h)
        return residual + h * m, cache


class GraniteMoeHybridModel(Module):
    """Reference GraniteMoeHybridModel (:1040)."""

    decoder_layer_cls = GraniteMoeHybridDecoderLayer

    def __init__(self, config: GraniteMoeHybridConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [
            self.decoder_layer_cls(config, i, config.layers_block_type[i], **kw)
            for i in range(config.num_hidden_layers)
        ]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.use_rope = config.position_embedding_type == "rope"
        if self.use_rope:
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

        cos = sin = None
        if self.use_rope:
            if position_ids is None:
                position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(
                    cache_position, jnp.int32)
                position_ids = jnp.broadcast_to(position_ids, (b, s))
            cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                       self.attention_scaling, dtype=self.dtype)

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
        hidden = self.norm(params["norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class GraniteMoeHybridPreTrainedModel(PreTrainedModel):
    config_class = GraniteMoeHybridConfig
    base_model_prefix = "model"


class GraniteMoeHybridForCausalLM(GraniteMoeHybridPreTrainedModel, GenerationMixin):
    model_cls = GraniteMoeHybridModel
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
        logits = logits / self.config.logits_scaling
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return mamba2_hybrid_cache(self.config, batch_size, max_len, dtype or self.dtype,
                                   self.config.layers_block_type,
                                   mamba2_view_from_hybrid(self.config))


class GraniteMoeHybridModelStandalone(GraniteMoeHybridPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = GraniteMoeHybridModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
