"""MusicGen Melody, TPU-native (reference
src/transformers/models/musicgen_melody/modeling_musicgen_melody.py).

Unlike MusicGen there is NO cross-attention: the conditioning signal — the
projected T5 text encoding concatenated after a projected chromagram
(:1493-1525) — is PREFIXED to the summed codebook embeddings, and the
decoder runs plain causal self-attention over [conditioning | codes]
(:489-502). Sinusoidal positions cover the full concatenated sequence.
Logits span the whole concat length (bsz*K, cond_len + seq_len, vocab).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from ..musicgen.modeling_musicgen import (_T5TextEncoder, _EncodecChild,
                                          _MGAttention,
                                          musicgen_sinusoid_table)
from .configuration_musicgen_melody import (MusicgenMelodyConfig,
                                            MusicgenMelodyDecoderConfig)


@dataclass
class MusicgenMelodyOutputWithPast(ModelOutput):
    loss: Any = None
    logits: Any = None
    encoder_hidden_states: Any = None


class MusicgenMelodyDecoderLayer(Module):
    """Pre-LN self-attention + FFN, no cross block (reference :299-365)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_factor))
        d = config.hidden_size
        self.self_attn = _MGAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, **kw)
        self.fc1 = Linear(d, config.ffn_dim, False, **lkw)
        self.fc2 = Linear(config.ffn_dim, d, False, **lkw)
        self.final_layer_norm = LayerNorm(d, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, causal_mask):
        residual = hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        hidden = residual + self.self_attn(params["self_attn"], h, h, causal_mask)
        residual = hidden
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        return residual + self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))


class MusicgenMelodyDecoder(Module):
    def __init__(self, config: MusicgenMelodyDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.embed_tokens = [
            Embedding(config.vocab_size + 1, d,
                      embedding_init=normal_init(config.initializer_factor), **kw)
            for _ in range(config.num_codebooks)]
        self.layers = [MusicgenMelodyDecoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.layer_norm = LayerNorm(d, **kw)
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0
        self.pos_table = musicgen_sinusoid_table(config.max_position_embeddings, d)

    def __call__(self, params, input_ids, cond_hidden=None, cond_valid=None,
                 attention_mask=None):
        k = self.config.num_codebooks
        bk, t = input_ids.shape
        ids = input_ids.reshape(bk // k, k, t)
        embeds = sum(self.embed_tokens[i](params["embed_tokens"][str(i)], ids[:, i])
                     for i in range(k)) * self.embed_scale
        neg = jnp.finfo(jnp.float32).min
        valid = (attention_mask.astype(bool) if attention_mask is not None
                 else jnp.ones(embeds.shape[:2], bool))
        if cond_hidden is not None:
            embeds = jnp.concatenate([cond_hidden.astype(embeds.dtype), embeds], axis=1)
            cv = (cond_valid.astype(bool) if cond_valid is not None
                  else jnp.ones(cond_hidden.shape[:2], bool))
            valid = jnp.concatenate([cv, valid], axis=1)
        total = embeds.shape[1]
        h = embeds + jnp.asarray(self.pos_table[:total], embeds.dtype)[None]
        causal = jnp.triu(jnp.full((total, total), neg, jnp.float32), k=1)[None, None]
        causal = causal + jnp.where(valid, 0.0, neg)[:, None, None, :]
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, causal)
        return self.layer_norm(params["layer_norm"], h)


class _MelodyModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = MusicgenMelodyDecoder(config, dtype=dtype, param_dtype=param_dtype)


class MusicgenMelodyForCausalLM(Module):
    def __init__(self, config: MusicgenMelodyDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.model = _MelodyModel(config, **kw)
        self.lm_heads = [
            Linear(config.hidden_size, config.vocab_size, False, dtype=dtype,
                   param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_factor))
            for _ in range(config.num_codebooks)]

    def __call__(self, params, input_ids, cond_hidden=None, cond_valid=None,
                 attention_mask=None):
        hidden = self.model.decoder(params["model"]["decoder"], input_ids,
                                    cond_hidden, cond_valid, attention_mask)
        logits = jnp.stack(
            [self.lm_heads[i](params["lm_heads"][str(i)], hidden)
             for i in range(self.config.num_codebooks)], axis=1)
        return logits.reshape(-1, *logits.shape[2:])


class MusicgenMelodyPreTrainedModel(PreTrainedModel):
    config_class = MusicgenMelodyConfig
    base_model_prefix = ""


class MusicgenMelodyForConditionalGeneration(MusicgenMelodyPreTrainedModel):
    def __init__(self, config: MusicgenMelodyConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_encoder = _T5TextEncoder(config.text_encoder, **kw)
        self.audio_encoder = _EncodecChild(config.audio_encoder, **kw)
        self.decoder = MusicgenMelodyForCausalLM(config.decoder, **kw)
        if config.text_encoder.d_model != config.decoder.hidden_size:
            self.enc_to_dec_proj = Linear(config.text_encoder.d_model,
                                          config.decoder.hidden_size, True, **kw)
        else:
            self.enc_to_dec_proj = None
        if config.num_chroma != config.decoder.hidden_size:
            self.audio_enc_to_dec_proj = Linear(config.num_chroma,
                                                config.decoder.hidden_size, True, **kw)
        else:
            self.audio_enc_to_dec_proj = None

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def _conditioning(self, params, input_ids, attention_mask, input_features):
        cfg = self.config
        enc_hidden = None
        if input_ids is not None:
            enc_hidden = self.text_encoder(params["text_encoder"], input_ids,
                                           attention_mask)
            if self.enc_to_dec_proj is not None:
                enc_hidden = self.enc_to_dec_proj(params["enc_to_dec_proj"], enc_hidden)
            if attention_mask is not None:
                enc_hidden = enc_hidden * attention_mask[..., None].astype(enc_hidden.dtype)
        # default chroma: one-hot on bin 0 (reference :1493-1499)
        if enc_hidden is not None and input_features is None:
            input_features = jnp.zeros((enc_hidden.shape[0], 1, cfg.num_chroma),
                                       enc_hidden.dtype).at[:, :, 0].set(1.0)
        audio_hidden = input_features
        if audio_hidden is not None:
            if self.audio_enc_to_dec_proj is not None:
                audio_hidden = self.audio_enc_to_dec_proj(
                    params["audio_enc_to_dec_proj"], audio_hidden)
            if audio_hidden.shape[1] < cfg.chroma_length:
                n_rep = math.ceil(cfg.chroma_length / audio_hidden.shape[1])
                audio_hidden = jnp.tile(audio_hidden, (1, n_rep, 1))
            audio_hidden = audio_hidden[:, :cfg.chroma_length]
            enc_hidden = (jnp.concatenate([audio_hidden, enc_hidden], axis=1)
                          if enc_hidden is not None else audio_hidden)
        return enc_hidden

    def __call__(self, params, input_ids=None, attention_mask=None,
                 input_features=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_hidden_states=None,
                 **kwargs) -> MusicgenMelodyOutputWithPast:
        if encoder_hidden_states is None:
            encoder_hidden_states = self._conditioning(params, input_ids,
                                                       attention_mask, input_features)
        logits = self.decoder(params["decoder"], decoder_input_ids,
                              encoder_hidden_states, None, decoder_attention_mask)
        return MusicgenMelodyOutputWithPast(
            logits=logits, encoder_hidden_states=encoder_hidden_states)
