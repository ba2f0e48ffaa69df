"""Pop2Piano (reference models/pop2piano/modeling_pop2piano.py): audio-to-MIDI
generation — a T5 stack whose encoder consumes log-mel feature frames as
inputs_embeds, with a composer-token embedding prepended by the
mel_conditioner (:744). Everything else is the T5 seq2seq machinery."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, Module, normal_init
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ..t5.configuration_t5 import T5Config
from ..t5.modeling_t5 import T5ForConditionalGeneration


class Pop2PianoConfig(T5Config):
    model_type = "pop2piano"

    def __init__(self, vocab_size=2400, composer_vocab_size=21,
                 feed_forward_proj="gated-gelu", dense_act_fn="relu", **kwargs):
        self.composer_vocab_size = composer_vocab_size
        super().__init__(vocab_size=vocab_size,
                         feed_forward_proj=feed_forward_proj, **kwargs)
        # Pop2Piano quirk: dense_act_fn is an INDEPENDENT field (default
        # relu) — the gating comes from feed_forward_proj but the activation
        # does not (reference configuration_pop2piano.py:60)
        self.dense_act_fn = dense_act_fn


class Pop2PianoConcatEmbeddingToMel(Module):
    """reference :744 — prepend the composer embedding to the mel frames."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedding = Embedding(config.composer_vocab_size, config.d_model,
                                   embedding_init=normal_init(1.0),
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, feature, index_value, embedding_offset):
        composer = self.embedding(params["embedding"],
                                  index_value - embedding_offset)[:, None]
        return jnp.concatenate([composer, feature.astype(composer.dtype)], axis=1)


class Pop2PianoForConditionalGeneration(T5ForConditionalGeneration):
    config_class = Pop2PianoConfig
    main_input_name = "input_features"

    def __init__(self, config: Pop2PianoConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.mel_conditioner = Pop2PianoConcatEmbeddingToMel(
            config, dtype=self.dtype, param_dtype=self.param_dtype)

    def condition_features(self, params, input_features, composer_value,
                           embedding_offset, attention_mask=None):
        """reference prepare_inputs_for_generation helper (:812)."""
        embeds = self.mel_conditioner(params["mel_conditioner"],
                                      jnp.asarray(input_features),
                                      jnp.asarray(composer_value),
                                      embedding_offset)
        if attention_mask is not None:
            am = jnp.asarray(attention_mask)
            embeds = embeds * jnp.concatenate(
                [am[:, :1], am], axis=1)[..., None].astype(embeds.dtype)
            attention_mask = jnp.concatenate([am[:, :1], am], axis=1)
        return embeds, attention_mask

    def encode(self, params, input_ids=None, attention_mask=None,
               inputs_embeds=None) -> BaseModelOutput:
        if inputs_embeds is None:
            inputs_embeds = self.shared(params["shared"], input_ids)
        hidden, _ = self.encoder(params["encoder"], inputs_embeds,
                                 attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, input_features=None, labels=None,
                 **kwargs) -> Seq2SeqLMOutput:
        if input_features is not None and inputs_embeds is None:
            inputs_embeds = jnp.asarray(input_features)
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask,
                                          inputs_embeds)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype),
                 labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(
                decoder_input_ids == -100, self.config.pad_token_id,
                decoder_input_ids)
        cross_kv = self.precompute_cross_kv(
            params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(
            params, decoder_input_ids, cross_kv, past_key_values,
            cache_position, decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(
            loss=loss, logits=logits, past_key_values=cache,
            encoder_last_hidden_state=encoder_outputs.last_hidden_state)
