"""Bamba: Mamba2/attention hybrid decoder, TPU-native.

Semantics match reference src/transformers/models/bamba/modeling_bamba.py:
interleaved Mamba2 mixers and GQA attention layers selected per
``layers_block_type`` (:931), partial rotary (factor 0.5, :83-84), shared
pre-norm residual block with ``input_layernorm``/``pre_ff_layernorm`` and a
SwiGLU ``feed_forward`` (:835-894), final_layernorm (:944), untied lm_head.
The mixer math is exactly `Mamba2Mixer` (:581-796 — "differences vs
Mamba2Mixer" are cache plumbing only), reused here via the config adapter.

TPU-native: one `HybridCache` pytree carries preallocated KV buffers for the
attention layers and O(1) conv/ssm recurrent states for the mamba layers, so
the whole decode step — both layer kinds — jits into a single XLA program.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import HybridCache, StaticKVCache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..llama.modeling_llama import DECODER_TP_PLAN, LlamaAttention, LlamaMLP
from ..mamba2.modeling_mamba2 import Mamba2Mixer, mamba2_view_from_hybrid
from .configuration_bamba import BambaConfig


class BambaDecoderLayer(Module):
    """Reference modeling_bamba.py:835. ``block_type`` picks the mixer."""

    attention_cls = LlamaAttention
    mlp_cls = LlamaMLP

    def __init__(self, config, layer_idx: int, block_type: str, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_type = block_type
        self.input_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.pre_ff_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.feed_forward = self.mlp_cls(config, **kw)
        if block_type == "attention":
            self.self_attn = self.attention_cls(config, layer_idx, **kw)
        else:
            self.mamba = Mamba2Mixer(mamba2_view_from_hybrid(config), layer_idx, **kw)

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


class BambaModel(Module):
    """Reference modeling_bamba.py:922."""

    decoder_layer_cls = BambaDecoderLayer

    def __init__(self, config: BambaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [
            self.decoder_layer_cls(config, i, config.layers_block_type[i], **kw)
            for i in range(config.num_hidden_layers)
        ]
        self.final_layernorm = RMSNorm(config.hidden_size, config.rms_norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[HybridCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = inputs_embeds
        b, s, _ = hidden.shape

        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :] + jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)

        kv_len = past_key_values.max_len if past_key_values is not None else s
        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True, "sliding_window": None}

        # mamba layers index CURRENT tokens only (no kv-length concept)
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


def init_hybrid_cache(config, batch_size: int, max_len: int, dtype,
                      block_types, mamba_view) -> HybridCache:
    """HybridCache with KV buffers at attention indices and conv/ssm states
    at SSM indices (None elsewhere — absent pytree leaves cost nothing)."""
    num_kv = getattr(config, "num_key_value_heads", None) or config.num_attention_heads
    head_dim = getattr(config, "head_dim", None) or config.hidden_size // config.num_attention_heads
    v = mamba_view
    conv_dim = v.intermediate_size + 2 * v.n_groups * v.state_size
    keys, values, conv, ssm = [], [], [], []
    for t in block_types:
        if t == "attention":
            keys.append(jnp.zeros((batch_size, max_len, num_kv, head_dim), dtype))
            values.append(jnp.zeros((batch_size, max_len, num_kv, head_dim), dtype))
            conv.append(None)
            ssm.append(None)
        else:
            keys.append(None)
            values.append(None)
            conv.append(jnp.zeros((batch_size, conv_dim, v.conv_kernel), dtype))
            ssm.append(jnp.zeros((batch_size, v.num_heads, v.head_dim, v.state_size),
                                 jnp.float32))
    kv = StaticKVCache(keys=tuple(keys), values=tuple(values),
                       layer_windows=(None,) * len(block_types), max_len=max_len)
    return HybridCache(kv=kv, conv_states=tuple(conv), ssm_states=tuple(ssm),
                       initialized=False)


class BambaPreTrainedModel(PreTrainedModel):
    config_class = BambaConfig
    base_model_prefix = "model"


class BambaForCausalLM(BambaPreTrainedModel, GenerationMixin):
    model_cls = BambaModel
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
        return init_hybrid_cache(self.config, batch_size, max_len, dtype or self.dtype,
                                 self.config.layers_block_type,
                                 mamba2_view_from_hybrid(self.config))


class BambaModelStandalone(BambaPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = BambaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
