"""OPT decoder, TPU-native.

Semantics match reference src/transformers/models/opt/modeling_opt.py:
learned positional embeddings with the +2 offset (:45-70), mask-derived
default position ids (cumsum(mask)-1, :351-353), pre-LN (default) or
post-LN (opt-350m) layer wiring (:214-251), ReLU MLP (fc1/fc2), optional
word-embedding down-projection (project_in/project_out, :292-300), final
layer norm gated by ``_remove_final_layer_norm`` back-compat (:302-310),
tied lm_head. Checkpoint layout: ``model.decoder.*``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_opt import OPTConfig


class OPTLearnedPositionalEmbedding(Embedding):
    """Embedding with the metaseq +2 id offset (reference :45)."""

    offset = 2

    def __init__(self, num_embeddings, embedding_dim, **kw):
        super().__init__(num_embeddings + self.offset, embedding_dim, **kw)

    def __call__(self, params, position_ids):
        return super().__call__(params, position_ids + self.offset)


class OPTAttention(Module):
    def __init__(self, config: OPTConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        bias = config.enable_bias
        self.q_proj = Linear(config.hidden_size, config.hidden_size, bias, **kw)
        self.k_proj = Linear(config.hidden_size, config.hidden_size, bias, **kw)
        self.v_proj = Linear(config.hidden_size, config.hidden_size, bias, **kw)
        self.out_proj = Linear(config.hidden_size, config.hidden_size, bias, **kw)

    def __call__(self, params, hidden, attn_args, cache: Optional[StaticKVCache], cache_position):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if cache is not None:
            cache = cache.update(self.layer_idx, k, v, cache_position)
            k, v = cache.layer(self.layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class OPTDecoderLayer(Module):
    """Pre/post-LN wiring per ``do_layer_norm_before`` (reference :214)."""

    def __init__(self, config: OPTConfig, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.do_layer_norm_before = config.do_layer_norm_before
        self.self_attn = OPTAttention(config, layer_idx, **kw)
        self.self_attn_layer_norm = LayerNorm(config.hidden_size, **kw)
        self.fc1 = Linear(config.hidden_size, config.ffn_dim, config.enable_bias, dtype=dtype,
                          param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.fc2 = Linear(config.ffn_dim, config.hidden_size, config.enable_bias, dtype=dtype,
                          param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.final_layer_norm = LayerNorm(config.hidden_size, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args, cache, cache_position):
        residual = hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden) \
            if self.do_layer_norm_before else hidden
        h, cache = self.self_attn(params["self_attn"], h, attn_args, cache, cache_position)
        hidden = residual + h
        if not self.do_layer_norm_before:
            hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        residual = hidden
        h = self.final_layer_norm(params["final_layer_norm"], hidden) \
            if self.do_layer_norm_before else hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        hidden = residual + h
        if not self.do_layer_norm_before:
            hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        return hidden, cache


class OPTDecoder(Module):
    def __init__(self, config: OPTConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.word_embed_proj_dim,
                                      embedding_init=normal_init(config.init_std), **kw)
        self.embed_positions = OPTLearnedPositionalEmbedding(
            config.max_position_embeddings, config.hidden_size,
            embedding_init=normal_init(config.init_std), **kw)
        lkw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        if config.word_embed_proj_dim != config.hidden_size:
            self.project_in = Linear(config.word_embed_proj_dim, config.hidden_size, False, **lkw)
            self.project_out = Linear(config.hidden_size, config.word_embed_proj_dim, False, **lkw)
        else:
            self.project_in = None
            self.project_out = None
        if config.do_layer_norm_before and not config._remove_final_layer_norm:
            self.final_layer_norm = LayerNorm(config.hidden_size, **kw)
        else:
            self.final_layer_norm = None
        self.layers = [OPTDecoderLayer(config, i, **kw) for i in range(config.num_hidden_layers)]

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values: Optional[StaticKVCache] = None,
        cache_position=0,
        inputs_embeds=None,
        output_hidden_states: bool = False,
    ) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        b, s, _ = inputs_embeds.shape
        kv_len = past_key_values.max_len if past_key_values is not None else s
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        if position_ids is None:
            if past_key_values is None:
                # reference default (:351): mask-derived positions
                position_ids = (jnp.cumsum(kv_valid, axis=1) * kv_valid - 1)[:, :s]
            else:
                start = jnp.asarray(cache_position, jnp.int32)
                position_ids = jnp.broadcast_to(
                    jnp.arange(s, dtype=jnp.int32)[None, :] + start, (b, s))
        position_ids = jnp.maximum(position_ids, 0)

        pos_embeds = self.embed_positions(params["embed_positions"], position_ids)
        hidden = inputs_embeds
        if self.project_in is not None:
            hidden = self.project_in(params["project_in"], hidden)
        hidden = hidden + pos_embeds

        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, attn_args, cache, cache_position)
        if self.final_layer_norm is not None:
            hidden = self.final_layer_norm(params["final_layer_norm"], hidden)
        if self.project_out is not None:
            hidden = self.project_out(params["project_out"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class OPTModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = OPTDecoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.decoder(params["decoder"], *args, **kwargs)


class OPTPreTrainedModel(PreTrainedModel):
    config_class = OPTConfig
    base_model_prefix = "model"


class OPTForCausalLM(OPTPreTrainedModel, GenerationMixin):
    _tied_weights_keys = ("lm_head.weight",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = OPTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(
        self,
        params,
        input_ids=None,
        attention_mask=None,
        position_ids=None,
        past_key_values=None,
        cache_position=0,
        inputs_embeds=None,
        labels=None,
        logits_to_keep: int = 0,
        output_hidden_states: bool = False,
    ) -> CausalLMOutputWithPast:
        outputs = self.model(
            params["model"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states,
        )
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        # lm_head is ALWAYS tied to embed_tokens (reference :444)
        logits = self.model.decoder.embed_tokens.attend(
            params["model"]["decoder"]["embed_tokens"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states,
        )

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation)


class OPTModelStandalone(OPTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = OPTModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
