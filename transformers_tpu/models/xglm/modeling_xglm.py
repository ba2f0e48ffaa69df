"""XGLM, TPU-native.

Semantics match reference src/transformers/models/xglm/modeling_xglm.py:
fairseq pre-LN decoder (OPT layer wiring), weightless sinusoidal positions
with the +2 offset (fairseq table, XGLMSinusoidalPositionalEmbedding),
sqrt(d) embedding scale, final ``layer_norm``, tied lm_head. Checkpoint
prefix ``model.*``."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..m2m_100.modeling_m2m_100 import M2M100SinusoidalPositionalEmbedding
from ..opt.modeling_opt import OPTDecoderLayer
from .configuration_xglm import XGLMConfig


class XGLMModel(Module):
    """Reference XGLMModel."""

    def __init__(self, config: XGLMConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.d_model,
                                      embedding_init=normal_init(config.init_std), **kw)
        self.embed_positions = M2M100SinusoidalPositionalEmbedding(
            config.max_position_embeddings, config.d_model,
            padding_idx=config.pad_token_id, **kw)
        self.embed_scale = math.sqrt(config.d_model) if config.scale_embedding else 1.0
        self.layers = [OPTDecoderLayer(config, i, **kw)
                       for i in range(config.num_layers)]
        self.layer_norm = LayerNorm(config.d_model, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[StaticKVCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states: bool = False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        inputs_embeds = inputs_embeds * jnp.asarray(self.embed_scale, inputs_embeds.dtype)
        b, s, _ = inputs_embeds.shape
        kv_len = past_key_values.max_len if past_key_values is not None else s
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        if position_ids is None:
            start = jnp.asarray(cache_position, jnp.int32)
            position_ids = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :] + start, (b, s))
        position_ids = jnp.maximum(position_ids, 0)
        # fairseq table: +2 offset rows at the front
        pos = self.embed_positions(params, position_ids
                                   + M2M100SinusoidalPositionalEmbedding.OFFSET)
        hidden = inputs_embeds + pos.astype(inputs_embeds.dtype)

        q_positions = jnp.asarray(cache_position, jnp.int32) + jnp.arange(s, dtype=jnp.int32)[None, :]
        q_positions = jnp.broadcast_to(q_positions, (b, s))
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}

        all_hidden = [] if output_hidden_states else None
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, attn_args, cache, cache_position)
        hidden = self.layer_norm(params["layer_norm"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class XGLMPreTrainedModel(PreTrainedModel):
    config_class = XGLMConfig
    base_model_prefix = "model"


class XGLMForCausalLM(XGLMPreTrainedModel, GenerationMixin):
    _tied_weights_keys = ("lm_head.weight",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = XGLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.d_model, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.init_std))

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
        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation)


class XGLMModelStandalone(XGLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = XGLMModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.model(params["model"], *args, **kwargs)
