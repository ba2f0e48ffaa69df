"""BioGPT, TPU-native.

Semantics match reference src/transformers/models/biogpt/modeling_biogpt.py:
fairseq-style pre-LN decoder (the OPT layer wiring — self_attn_layer_norm /
fc1 / fc2 / final_layer_norm), learned positions with the +2 offset and
MASK-DERIVED ids (cumsum(mask)·mask − 1, BioGptLearnedPositionalEmbedding),
sqrt(d) embedding scale, final ``layer_norm``, tied ``output_projection``
head. Checkpoint prefix ``biogpt.*``."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, cache_from_config
from ...core.module import Embedding, LayerNorm, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..opt.modeling_opt import OPTDecoderLayer, OPTLearnedPositionalEmbedding
from .configuration_biogpt import BioGptConfig


class BioGptModel(Module):
    """Reference BioGptModel (decoder body)."""

    def __init__(self, config: BioGptConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.embed_positions = OPTLearnedPositionalEmbedding(
            config.max_position_embeddings, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        self.embed_scale = math.sqrt(config.hidden_size) if config.scale_embedding else 1.0
        self.layers = [OPTDecoderLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.layer_norm = LayerNorm(config.hidden_size, **kw)

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
            if past_key_values is None:
                position_ids = (jnp.cumsum(kv_valid, axis=1) * kv_valid - 1)[:, :s]
            else:
                start = jnp.asarray(cache_position, jnp.int32)
                position_ids = jnp.broadcast_to(
                    jnp.arange(s, dtype=jnp.int32)[None, :] + start, (b, s))
        position_ids = jnp.maximum(position_ids, 0)
        hidden = inputs_embeds + self.embed_positions(params["embed_positions"], position_ids)

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


class BioGptPreTrainedModel(PreTrainedModel):
    config_class = BioGptConfig
    base_model_prefix = "biogpt"


class BioGptForCausalLM(BioGptPreTrainedModel, GenerationMixin):
    _tied_weights_keys = ("output_projection.weight",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.biogpt = BioGptModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "biogpt.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states: bool = False) -> CausalLMOutputWithPast:
        outputs = self.biogpt(
            params["biogpt"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        # output_projection is ALWAYS tied to embed_tokens (reference)
        logits = self.biogpt.embed_tokens.attend(params["biogpt"]["embed_tokens"], hidden)
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


class BioGptModelStandalone(BioGptPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.biogpt = BioGptModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.biogpt(params["biogpt"], *args, **kwargs)
