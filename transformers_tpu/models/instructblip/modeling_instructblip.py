"""InstructBLIP (reference src/transformers/models/instructblip/modeling_instructblip.py).

BLIP-2 composition where the Q-Former ALSO reads the instruction text:
queries and qformer-tokenized instruction are concatenated for
self-attention, only the query positions cross-attend into the vision
features, and query/text positions use separate FF stacks
(``intermediate_query``/``output_query`` vs ``intermediate``/``output``).
The first ``num_query_tokens`` outputs project into the language model."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import BertIntermediate, BertOutput
from ..blip_2.modeling_blip_2 import (
    Blip2ForConditionalGeneration,
    Blip2VisionModel,
    _QFormerAttentionBlock,
)
from .configuration_instructblip import InstructBlipConfig, InstructBlipQFormerConfig


class InstructBlipQFormerEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **kw)
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, query_embeds):
        if input_ids is not None:
            s = input_ids.shape[1]
            pos = jnp.arange(s, dtype=jnp.int32)[None, :]
            emb = (self.word_embeddings(params["word_embeddings"], input_ids)
                   + self.position_embeddings(params["position_embeddings"], pos))
            if query_embeds is not None:
                emb = jnp.concatenate([query_embeds.astype(emb.dtype), emb], axis=1)
        else:
            emb = query_embeds
        return self.layernorm(params["layernorm"], emb)


class InstructBlipQFormerLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _QFormerAttentionBlock(config, False, **kw)
        self.has_cross = layer_idx % config.cross_attention_frequency == 0
        if self.has_cross:
            self.crossattention = _QFormerAttentionBlock(config, True, **kw)
        self.intermediate_query = BertIntermediate(config, **kw)
        self.output_query = BertOutput(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, encoder_hidden, self_valid, query_length):
        h = self.attention(params["attention"], hidden, hidden, self_valid)
        q_part = h[:, :query_length]
        if self.has_cross:
            q_part = self.crossattention(params["crossattention"], q_part, encoder_hidden)
        q_out = self.output_query(params["output_query"],
                                  self.intermediate_query(params["intermediate_query"], q_part),
                                  q_part)
        if h.shape[1] > query_length:
            t_part = h[:, query_length:]
            t_out = self.output(params["output"],
                                self.intermediate(params["intermediate"], t_part), t_part)
            return jnp.concatenate([q_out, t_out], axis=1)
        return q_out


class InstructBlipQFormerModel(Module):
    def __init__(self, config: InstructBlipQFormerConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = InstructBlipQFormerEmbeddings(config, **kw)
        self.encoder = _InstructBlipQFormerEncoder(config, **kw)

    def __call__(self, params, input_ids, attention_mask, query_embeds,
                 encoder_hidden_states):
        query_length = query_embeds.shape[1] if query_embeds is not None else 0
        hidden = self.embeddings(params["embeddings"], input_ids, query_embeds)
        b, s, _ = hidden.shape
        if attention_mask is None:
            self_valid = jnp.ones((b, s), jnp.int32)
        else:
            self_valid = jnp.concatenate(
                [jnp.ones((b, query_length), jnp.int32),
                 attention_mask.astype(jnp.int32)], axis=1)
        return self.encoder(params["encoder"], hidden, encoder_hidden_states,
                            self_valid, query_length)


class _InstructBlipQFormerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [InstructBlipQFormerLayer(config, i, dtype=dtype, param_dtype=param_dtype)
                      for i in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, encoder_hidden, self_valid, query_length):
        for i, layer in enumerate(self.layer):
            hidden = layer(params["layer"][str(i)], hidden, encoder_hidden,
                           self_valid, query_length)
        return hidden


class InstructBlipPreTrainedModel(PreTrainedModel):
    config_class = InstructBlipConfig
    base_model_prefix = ""


class InstructBlipForConditionalGeneration(Blip2ForConditionalGeneration):
    config_class = InstructBlipConfig
    _prefill_input_names = ("pixel_values", "qformer_input_ids", "qformer_attention_mask")

    def __init__(self, config: InstructBlipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = Blip2VisionModel(config.vision_config, **kw)
        self.qformer = InstructBlipQFormerModel(config.qformer_config, **kw)

    def get_image_features(self, params, pixel_values, qformer_input_ids=None,
                           qformer_attention_mask=None):
        vision_out = self.vision_model(params["vision_model"], pixel_values)
        queries = jnp.broadcast_to(
            params["query_tokens"].astype(self.dtype),
            (pixel_values.shape[0], self.num_query_tokens,
             self.config.qformer_config.hidden_size))
        q_out = self.qformer(params["qformer"], qformer_input_ids,
                             qformer_attention_mask, queries,
                             vision_out.last_hidden_state)
        q_out = q_out[:, : self.num_query_tokens]
        return self.language_projection(params["language_projection"], q_out)

    def _embed(self, params, input_ids, pixel_values, qformer_input_ids=None,
               qformer_attention_mask=None):
        lm = self.language_model
        embed_path = lm.get_input_embedding_path().split(".")[:-1]
        mod = lm
        sub = params["language_model"]
        for name in embed_path:
            mod = getattr(mod, name)
            sub = sub[name]
        safe_ids = jnp.where(input_ids == self.config.image_token_id, 0, input_ids)
        embeds = mod(sub, safe_ids)
        if pixel_values is None:
            return embeds
        feats = self.get_image_features(params, pixel_values, qformer_input_ids,
                                        qformer_attention_mask)
        flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
        mask = input_ids == self.config.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 qformer_input_ids=None, qformer_attention_mask=None,
                 attention_mask=None, position_ids=None, past_key_values=None,
                 cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states=False, **kwargs):
        if inputs_embeds is None:
            inputs_embeds = self._embed(params, input_ids, pixel_values,
                                        qformer_input_ids, qformer_attention_mask)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, labels, logits_to_keep,
            output_hidden_states)
