"""SpeechEncoderDecoderModel, TPU-native (reference
src/transformers/models/speech_encoder_decoder/modeling_speech_encoder_decoder.py).

Speech-to-text composition (Wav2Vec2-BERT "speech2text2" style warm starts):
a speech encoder consuming raw waveforms / features feeds the BERT-family
causal decoder from encoder_decoder. The encoder attention mask is dropped
after encoding (frame rate differs from sample rate); cross-attention runs
unmasked over encoder frames, as the reference does when no feature mask is
given."""

from __future__ import annotations

import jax.numpy as jnp

from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ..encoder_decoder.modeling_encoder_decoder import EncoderDecoderModel
from .configuration_speech_encoder_decoder import SpeechEncoderDecoderConfig


class SpeechEncoderDecoderModel(EncoderDecoderModel):
    config_class = SpeechEncoderDecoderConfig
    main_input_name = "input_values"
    encoder_input_name = "input_values"

    def encode(self, params, input_values, attention_mask=None) -> BaseModelOutput:
        out = self.encoder(params["encoder"], input_values, attention_mask)
        hidden = out.last_hidden_state
        if self.enc_to_dec_proj is not None:
            hidden = self.enc_to_dec_proj(params["enc_to_dec_proj"], hidden)
        return BaseModelOutput(last_hidden_state=hidden)

    def __call__(self, params, input_values=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, input_features=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            if input_values is None:
                input_values = input_features
            encoder_outputs = self.encode(params, input_values, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            pad = self.config.pad_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype),
                 labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100, pad,
                                          decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params,
                                            encoder_outputs.last_hidden_state)
        # encoder mask is in sample space, not frame space -> no cross mask
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, None)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.decoder.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)
