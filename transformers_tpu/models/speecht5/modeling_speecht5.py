"""SpeechT5, TPU-native (reference src/transformers/models/speecht5/modeling_speecht5.py).

Unified speech/text encoder-decoder: modality "prenets" feed a shared
transformer (post-LN layers; the encoder adds a per-layer relative position
term q·PE_k, Shaw-style).  Task heads: speech→text (ASR, rides the shared
seq2seq decode loop), text→speech (TTS: autoregressive mel-frame decoder as
one jitted ``lax.while_loop`` with a static frame budget + stop-probability
threshold), speech→speech, and the HiFi-GAN vocoder.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import (BatchNorm, Conv, Embedding, LayerNorm, Linear,
                            Module, normal_init)
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.masks import to_additive
from ...utils.generic import ModelOutput
from ..bart.modeling_bart import BartAttention
from ..wav2vec2.modeling_wav2vec2 import (Wav2Vec2FeatureEncoder,
                                          Wav2Vec2FeatureProjection,
                                          Wav2Vec2PositionalConvEmbedding,
                                          feat_extract_output_lengths,
                                          feature_vector_attention_mask)
from .configuration_speecht5 import SpeechT5Config, SpeechT5HifiGanConfig


# ------------------------------------------------------------------ positions
def sinusoidal_table(num_embeddings: int, dim: int, padding_idx=None):
    """fairseq-style [sin | cos] half-concatenated table (reference
    SpeechT5SinusoidalPositionalEmbedding.get_embedding)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    ang = np.arange(num_embeddings, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return jnp.asarray(table, jnp.float32)


def interleaved_sincos_table(max_len: int, dim: int):
    """pe[:, 0::2]=sin, pe[:, 1::2]=cos (reference SpeechT5ScaledPositionalEncoding)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, jnp.float32)


def positions_from_input_ids(input_ids, padding_idx: int, past_len=0):
    """Non-pad tokens numbered from padding_idx+1; pads stay at padding_idx."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=1) + past_len) * mask + padding_idx


class SpeechT5ScaledPositionalEncoding(Module):
    """emb + alpha * pe (reference SpeechT5ScaledPositionalEncoding)."""

    def __init__(self, dim, max_len, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.table = interleaved_sincos_table(max_len, dim)

    def init(self, rng):
        return {"alpha": jnp.ones((), self.param_dtype)}

    def __call__(self, params, emb, offset=0):
        s = emb.shape[1]
        pe = jax.lax.dynamic_slice_in_dim(self.table, offset, s, 0) \
            if not isinstance(offset, int) or offset else self.table[:s]
        return emb + params["alpha"].astype(self.dtype) * pe[None].astype(self.dtype)


# ------------------------------------------------------------------ attention
class SpeechT5EncoderAttention(BartAttention):
    """Scaled MHA plus Shaw-style relative position term q·PE_k
    (reference SpeechT5Attention with position_bias)."""

    def __call__(self, params, hidden, kv_valid, rel_pe):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden) * self.scale
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k, v = self.kv(params, hidden)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores += jnp.einsum("bqhd,qkd->bhqk", q, rel_pe).astype(jnp.float32)
        scores += to_additive(kv_valid.astype(bool)[:, None, None, :], jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, e)
        return self.out_proj(params["out_proj"], out)


class SpeechT5FeedForward(Module):
    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.intermediate_dense = Linear(config.hidden_size, ffn_dim, True, **kw)
        self.output_dense = Linear(ffn_dim, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.output_dense(params["output_dense"],
                                 self.act(self.intermediate_dense(params["intermediate_dense"], x)))


class SpeechT5EncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.attention = SpeechT5EncoderAttention(d, config.encoder_attention_heads, config, **kw)
        self.layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.feed_forward = SpeechT5FeedForward(config, config.encoder_ffn_dim, **kw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, kv_valid, rel_pe):
        h = self.attention(params["attention"], hidden, kv_valid, rel_pe)
        hidden = self.layer_norm(params["layer_norm"], hidden + h)
        hidden = hidden + self.feed_forward(params["feed_forward"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class SpeechT5Encoder(Module):
    """Input LN, relative PE table shared by all layers (reference SpeechT5Encoder)."""

    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layer_norm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.layers = [SpeechT5EncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        head_dim = config.hidden_size // config.encoder_attention_heads
        self.embed_positions = _RelPosEmbed(
            head_dim, config.encoder_max_relative_position, **kw)

    def __call__(self, params, hidden, attention_mask=None):
        b, s, _ = hidden.shape
        hidden = self.layer_norm(params["layer_norm"], hidden)
        rel_pe = self.embed_positions(params["embed_positions"], s)
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, s), jnp.int32))
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, kv_valid, rel_pe)
        return hidden


class _RelPosEmbed(Module):
    """pe_k[clip(j-i)] table (reference SpeechT5RelativePositionalEncoding)."""

    def __init__(self, dim, max_length, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.max_length = max_length
        self.pe_k = Embedding(2 * max_length, dim, dtype=dtype,
                              param_dtype=param_dtype,
                              embedding_init=normal_init(0.02))

    def __call__(self, params, seq_len):
        pos = jnp.arange(seq_len, dtype=jnp.int32)
        rel = pos[:, None] - pos[None, :]
        rel = jnp.clip(rel, -self.max_length, self.max_length - 1) + self.max_length
        return jnp.take(params["pe_k"]["weight"].astype(self.dtype), rel, axis=0)


class SpeechT5DecoderLayer(Module):
    """Post-LN self + cross + FF (reference SpeechT5DecoderLayer)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        heads = config.decoder_attention_heads
        self.self_attn = BartAttention(d, heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.encoder_attn = BartAttention(d, heads, config, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)
        self.feed_forward = SpeechT5FeedForward(config, config.decoder_ffn_dim, **kw)
        self.final_layer_norm = LayerNorm(d, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache,
                 layer_idx, cache_position):
        h, cache = self.self_attn(params["self_attn"], hidden, attn_args,
                                  cache=cache, layer_idx=layer_idx,
                                  cache_position=cache_position)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h, _ = self.encoder_attn(params["encoder_attn"], hidden, cross_args,
                                 kv_precomputed=cross_kv)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden + h)
        hidden = hidden + self.feed_forward(params["feed_forward"], hidden)
        return self.final_layer_norm(params["final_layer_norm"], hidden), cache


class SpeechT5Decoder(Module):
    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layers = [SpeechT5DecoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.decoder_layers)]

    def __call__(self, params, hidden, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        b, s, _ = hidden.shape
        kv_len = cache.max_len if cache is not None else s
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, kv_len), jnp.int32))
        attn_args = {"q_positions": jnp.broadcast_to(positions[None, :], (b, s)),
                     "kv_valid": kv_valid, "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            hidden, cache = layer(params["layers"][str(i)], hidden, attn_args,
                                  cross_args, cross_kv[i], cache, i, cache_position)
        return hidden, cache


# -------------------------------------------------------------------- prenets
class SpeechT5SpeechEncoderPrenet(Module):
    """wav2vec2 conv feature encoder + projection + conv & sinusoidal
    positions (reference SpeechT5SpeechEncoderPrenet)."""

    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.feature_encoder = Wav2Vec2FeatureEncoder(config, **kw)
        self.feature_projection = Wav2Vec2FeatureProjection(config, **kw)
        self.pos_conv_embed = Wav2Vec2PositionalConvEmbedding(config, **kw)
        self.has_masked_embed = (config.mask_time_prob > 0.0
                                 or config.mask_feature_prob > 0.0)
        self.sin_table = sinusoidal_table(
            config.max_speech_positions + config.pad_token_id + 1 + 2,
            config.hidden_size, config.pad_token_id)

    def init(self, rng):
        params = super().init(rng)
        if self.has_masked_embed:
            params["masked_spec_embed"] = jax.random.uniform(
                rng, (self.config.hidden_size,), self.param_dtype)
        return params

    def __call__(self, params, input_values, attention_mask=None):
        feats = self.feature_encoder(params["feature_encoder"], input_values)
        feats = jnp.swapaxes(feats, 1, 2)
        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_vector_attention_mask(self.config, attention_mask,
                                                      feats.shape[1])
        hidden = self.feature_projection(params["feature_projection"], feats)
        hidden = hidden + self.pos_conv_embed(params["pos_conv_embed"], hidden)
        # sinusoidal positions keyed off the INVERTED mask (reference quirk:
        # padding_mask = attention_mask.ne(1) fed as "input_ids")
        if feat_mask is not None:
            padding_mask = 1 - feat_mask.astype(jnp.int32)
        else:
            padding_mask = jnp.zeros(hidden.shape[:2], jnp.int32)
        pos_ids = positions_from_input_ids(padding_mask, self.config.pad_token_id)
        hidden = hidden + jnp.take(self.sin_table, pos_ids, axis=0).astype(self.dtype)
        return hidden, feat_mask


class SpeechT5TextEncoderPrenet(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      dtype=dtype, param_dtype=param_dtype,
                                      embedding_init=normal_init(config.initializer_range))
        self.encode_positions = SpeechT5ScaledPositionalEncoding(
            config.hidden_size, config.max_text_positions,
            dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids):
        emb = self.embed_tokens(params["embed_tokens"], input_ids)
        return self.encode_positions(params["encode_positions"], emb)


class SpeechT5SpeechDecoderPrenet(Module):
    """Tacotron2-style always-on-dropout prenet (reference
    SpeechT5SpeechDecoderPrenet).  NOTE the reference keeps units with
    probability p (torch.bernoulli(x, p)), scaled by 1/(1-p)."""

    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        units = config.speech_decoder_prenet_units
        self.layers = [Linear(config.num_mel_bins if i == 0 else units, units, True, **kw)
                       for i in range(config.speech_decoder_prenet_layers)]
        self.final_layer = Linear(units, config.hidden_size, True, **kw)
        self.encode_positions = SpeechT5ScaledPositionalEncoding(
            config.hidden_size, config.max_speech_positions,
            dtype=dtype, param_dtype=param_dtype)
        self.speaker_embeds_layer = Linear(
            config.speaker_embedding_dim + config.hidden_size, config.hidden_size,
            True, **kw)

    def __call__(self, params, input_values, speaker_embeddings=None, *,
                 rng=None, pos_offset=0):
        h = input_values
        p = self.config.speech_decoder_prenet_dropout
        for i, layer in enumerate(self.layers):
            h = jax.nn.relu(layer(params["layers"][str(i)], h))
            if p > 0.0:
                if rng is None:
                    raise ValueError("speech decoder prenet needs an rng when "
                                     "speech_decoder_prenet_dropout > 0")
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, p, h.shape[1:])
                h = jnp.where(keep[None], h, 0.0) / (1.0 - p)
            else:
                h = jnp.zeros_like(h)
        h = self.final_layer(params["final_layer"], h)
        h = self.encode_positions(params["encode_positions"], h, pos_offset)
        if speaker_embeddings is not None:
            se = speaker_embeddings / jnp.maximum(
                jnp.linalg.norm(speaker_embeddings, axis=-1, keepdims=True), 1e-12)
            se = jnp.broadcast_to(se[:, None], (h.shape[0], h.shape[1], se.shape[-1]))
            h = jax.nn.relu(self.speaker_embeds_layer(
                params["speaker_embeds_layer"],
                jnp.concatenate([h, se.astype(h.dtype)], axis=-1)))
        return h


class SpeechT5TextDecoderPrenet(Module):
    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embed_scale = math.sqrt(config.hidden_size) if config.scale_embedding else 1.0
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      dtype=dtype, param_dtype=param_dtype,
                                      embedding_init=normal_init(config.initializer_range))
        self.sin_table = sinusoidal_table(
            config.max_text_positions + config.pad_token_id + 1 + 2,
            config.hidden_size, config.pad_token_id)

    def __call__(self, params, input_ids, past_len=0):
        pos_ids = positions_from_input_ids(input_ids, self.config.pad_token_id, past_len)
        emb = self.embed_tokens(params["embed_tokens"], input_ids) * self.embed_scale
        return emb + jnp.take(self.sin_table, pos_ids, axis=0).astype(self.dtype)


# ------------------------------------------------------------------- postnets
class SpeechT5BatchNormConvLayer(Module):
    def __init__(self, config, layer_id, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        units = config.speech_decoder_postnet_units
        in_dim = config.num_mel_bins if layer_id == 0 else units
        out_dim = (config.num_mel_bins
                   if layer_id == config.speech_decoder_postnet_layers - 1 else units)
        k = config.speech_decoder_postnet_kernel
        self.conv = Conv(in_dim, out_dim, k, padding=(k - 1) // 2, use_bias=False,
                         ndim=1, dtype=dtype, param_dtype=param_dtype)
        self.batch_norm = BatchNorm(out_dim, 1e-5, dtype=dtype, param_dtype=param_dtype)
        self.use_tanh = layer_id < config.speech_decoder_postnet_layers - 1

    def __call__(self, params, x):
        x = self.batch_norm(params["batch_norm"], self.conv(params["conv"], x))
        return jnp.tanh(x) if self.use_tanh else x


class SpeechT5SpeechDecoderPostnet(Module):
    def __init__(self, config: SpeechT5Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.feat_out = Linear(config.hidden_size,
                               config.num_mel_bins * config.reduction_factor, True, **kw)
        self.prob_out = Linear(config.hidden_size, config.reduction_factor, True, **kw)
        self.layers = [SpeechT5BatchNormConvLayer(config, i, dtype=dtype,
                                                  param_dtype=param_dtype)
                       for i in range(config.speech_decoder_postnet_layers)]

    def postnet(self, params, spectrogram):
        """Residual conv smoothing over [b, frames, mel]."""
        x = jnp.swapaxes(spectrogram, 1, 2)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x)
        return spectrogram + jnp.swapaxes(x, 1, 2)

    def __call__(self, params, hidden):
        b = hidden.shape[0]
        before = self.feat_out(params["feat_out"], hidden).reshape(
            b, -1, self.config.num_mel_bins)
        after = self.postnet(params, before)
        logits = self.prob_out(params["prob_out"], hidden).reshape(b, -1)
        return before, after, logits


class SpeechT5TextDecoderPostnet(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                              dtype=dtype, param_dtype=param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, hidden):
        return self.lm_head(params["lm_head"], hidden)


# ------------------------------------------------------- wrappers (checkpoint
# tree mirrors reference: {prenet, wrapped_encoder/wrapped_decoder})
class _EncoderWrapper(Module):
    def __init__(self, prenet, encoder, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        if prenet is not None:
            self.prenet = prenet
        self.wrapped_encoder = encoder


class _DecoderWrapper(Module):
    def __init__(self, prenet, decoder, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        if prenet is not None:
            self.prenet = prenet
        self.wrapped_decoder = decoder


class _SpeechT5Core(Module):
    def __init__(self, encoder_wrapper, decoder_wrapper, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.encoder = encoder_wrapper
        self.decoder = decoder_wrapper


class SpeechT5PreTrainedModel(PreTrainedModel):
    config_class = SpeechT5Config
    base_model_prefix = ""
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked$",)


def _mk_cross_kv(decoder: SpeechT5Decoder, params_decoder, encoder_hidden):
    out = []
    for i, layer in enumerate(decoder.layers):
        out.append(layer.encoder_attn.kv(
            params_decoder["wrapped_decoder"]["layers"][str(i)]["encoder_attn"],
            encoder_hidden))
    return tuple(out)


class SpeechT5ForSpeechToText(SpeechT5PreTrainedModel, EncoderDecoderGenerationMixin):
    """ASR: speech encoder prenet + text decoder (reference
    SpeechT5ForSpeechToText)."""

    encoder_input_name = "input_values"

    def __init__(self, config: SpeechT5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        enc = _EncoderWrapper(SpeechT5SpeechEncoderPrenet(config, **kw),
                              SpeechT5Encoder(config, **kw), **kw)
        dec = _DecoderWrapper(SpeechT5TextDecoderPrenet(config, **kw),
                              SpeechT5Decoder(config, **kw), **kw)
        self.speecht5 = _SpeechT5Core(enc, dec, **kw)
        if not config.tie_word_embeddings:
            self.text_decoder_postnet = SpeechT5TextDecoderPostnet(config, **kw)

    @property
    def _keys_to_ignore_on_load_unexpected(self):
        if self.config.tie_word_embeddings:
            return (r"^text_decoder_postnet\.",)
        return ()

    def get_input_embedding_path(self):
        return "speecht5.decoder.prenet.embed_tokens.weight"

    # ----------------------------------------------------------- s2s hooks
    def encode(self, params, input_values, attention_mask=None) -> BaseModelOutput:
        enc = self.speecht5.encoder
        hidden, feat_mask = enc.prenet(params["speecht5"]["encoder"]["prenet"],
                                       input_values, attention_mask)
        hidden = enc.wrapped_encoder(params["speecht5"]["encoder"]["wrapped_encoder"],
                                     hidden, feat_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def _feat_mask(self, encoder_mask, enc_len):
        if encoder_mask is None:
            return None
        if encoder_mask.shape[1] == enc_len:
            return encoder_mask
        return feature_vector_attention_mask(self.config, encoder_mask, enc_len)

    def precompute_cross_kv(self, params, encoder_hidden):
        return _mk_cross_kv(self.speecht5.decoder.wrapped_decoder,
                            params["speecht5"]["decoder"], encoder_hidden)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        dec = self.speecht5.decoder
        dp = params["speecht5"]["decoder"]
        embeds = dec.prenet(dp["prenet"], input_ids, past_len=cache_position)
        feat_mask = self._feat_mask(encoder_mask, cross_kv[0][0].shape[1])
        return dec.wrapped_decoder(dp["wrapped_decoder"], embeds, cross_kv, cache,
                                   cache_position, decoder_mask, feat_mask)

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            emb = self.speecht5.decoder.prenet.embed_tokens
            return emb.attend(params["speecht5"]["decoder"]["prenet"]["embed_tokens"],
                              hidden)
        return self.text_decoder_postnet(params["text_decoder_postnet"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(
            num_layers=c.decoder_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.decoder_attention_heads,
            head_dim=c.hidden_size // c.decoder_attention_heads,
            dtype=dtype or self.dtype)

    def __call__(self, params, input_values=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_values, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]],
                axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.pad_token_id, decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(
            loss=loss, logits=logits, past_key_values=cache,
            encoder_last_hidden_state=encoder_outputs.last_hidden_state)


@dataclass
class Seq2SeqSpectrogramOutput(ModelOutput):
    loss: object = None
    spectrogram: object = None
    past_key_values: object = None
    encoder_last_hidden_state: object = None


class SpeechT5ForTextToSpeech(SpeechT5PreTrainedModel):
    """TTS: text encoder prenet + speech decoder prenet/postnet (reference
    SpeechT5ForTextToSpeech)."""

    main_input_name = "input_ids"

    def __init__(self, config: SpeechT5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        enc = _EncoderWrapper(SpeechT5TextEncoderPrenet(config, **kw),
                              SpeechT5Encoder(config, **kw), **kw)
        dec = _DecoderWrapper(SpeechT5SpeechDecoderPrenet(config, **kw),
                              SpeechT5Decoder(config, **kw), **kw)
        self.speecht5 = _SpeechT5Core(enc, dec, **kw)
        self.speech_decoder_postnet = SpeechT5SpeechDecoderPostnet(config, **kw)

    def get_input_embedding_path(self):
        return "speecht5.encoder.prenet.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        enc = self.speecht5.encoder
        hidden = enc.prenet(params["speecht5"]["encoder"]["prenet"], input_ids)
        hidden = enc.wrapped_encoder(params["speecht5"]["encoder"]["wrapped_encoder"],
                                     hidden, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_values=None, decoder_attention_mask=None,
                 speaker_embeddings=None, encoder_outputs=None, labels=None,
                 prenet_rng=None, **kwargs) -> Seq2SeqSpectrogramOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
        if decoder_input_values is None and labels is not None:
            r = self.config.reduction_factor
            vals = labels[:, r - 1::r] if r > 1 else labels
            decoder_input_values = jnp.concatenate(
                [jnp.zeros_like(vals[:, :1]), vals[:, :-1]], axis=1)
            decoder_input_values = jnp.where(decoder_input_values == -100.0, 0.0,
                                             decoder_input_values)
            if decoder_attention_mask is not None and r > 1:
                decoder_attention_mask = decoder_attention_mask[:, r - 1::r]
        dec = self.speecht5.decoder
        dp = params["speecht5"]["decoder"]
        embeds = dec.prenet(dp["prenet"], decoder_input_values, speaker_embeddings,
                            rng=prenet_rng)
        cross_kv = _mk_cross_kv(dec.wrapped_decoder, dp,
                                encoder_outputs.last_hidden_state)
        hidden, _ = dec.wrapped_decoder(dp["wrapped_decoder"], embeds, cross_kv,
                                        None, 0, decoder_attention_mask,
                                        attention_mask)
        before, after, logits = self.speech_decoder_postnet(
            params["speech_decoder_postnet"], hidden)
        loss = None
        if labels is not None:
            valid = (labels != -100.0).all(-1, keepdims=True)
            l1 = jnp.abs(jnp.where(valid, before - labels, 0.0)).sum() \
                + jnp.abs(jnp.where(valid, after - labels, 0.0)).sum()
            loss = l1 / jnp.maximum(valid.sum() * labels.shape[-1] * 2, 1)
        return Seq2SeqSpectrogramOutput(
            loss=loss, spectrogram=after,
            encoder_last_hidden_state=encoder_outputs.last_hidden_state)

    # ------------------------------------------------------------- generation
    def generate(self, params=None, input_ids=None, attention_mask=None,
                 speaker_embeddings=None, threshold=0.5, minlenratio=0.0,
                 maxlenratio=20.0, vocoder=None, return_output_lengths=False,
                 prng_key=None, **kwargs):
        """Autoregressive mel-frame decode (reference _generate_speech):
        one jitted while_loop with a static maxlen frame budget; stops a
        sample when sigmoid(prob_out) sums past `threshold`."""
        params = params if params is not None else self.params
        input_ids = jnp.asarray(input_ids)
        b, src = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != self.config.pad_token_id).astype(jnp.int32)
        if speaker_embeddings is None:
            speaker_embeddings = jnp.zeros((b, self.config.speaker_embedding_dim),
                                           self.dtype)
        if speaker_embeddings.shape[0] != b:
            speaker_embeddings = jnp.broadcast_to(
                speaker_embeddings, (b,) + speaker_embeddings.shape[1:])
        if prng_key is None:
            prng_key = jax.random.key(0)
        r = self.config.reduction_factor
        maxlen = max(int(src * maxlenratio / r), 1)
        minlen = int(src * minlenratio / r)

        sig = (b, src, maxlen, minlen, float(threshold))
        store = getattr(self, "_tts_cache", None) or {}
        self._tts_cache = store
        if sig not in store:
            store[sig] = jax.jit(self._build_tts_fn(maxlen, minlen, float(threshold)))
        frames, lengths = store[sig](params, input_ids, attention_mask,
                                     speaker_embeddings, prng_key)
        # postnet per sample on its true length (reference applies the postnet
        # at each sample's finishing step — batch rows are independent)
        lengths = np.asarray(lengths)
        frames = np.asarray(frames)  # [b, maxlen*r, mel]
        posts = []
        for i in range(b):
            n = int(lengths[i]) * r
            post = self.speech_decoder_postnet.postnet(
                params["speech_decoder_postnet"], jnp.asarray(frames[i:i + 1, :n]))
            posts.append(np.asarray(post[0]))
        spec_lengths = [p.shape[0] for p in posts]
        maxn = max(spec_lengths)
        padded = np.stack([np.pad(p, ((0, maxn - p.shape[0]), (0, 0))) for p in posts])
        if not return_output_lengths:
            out = jnp.asarray(posts[0]) if b == 1 else jnp.asarray(padded)
            if vocoder is not None:
                return vocoder(out)
            return out
        outputs = jnp.asarray(padded)
        if vocoder is not None:
            waveforms = vocoder(outputs)
            wl = [int(waveforms.shape[1] / maxn) * n for n in spec_lengths]
            return waveforms, wl
        return outputs, spec_lengths

    generate_speech = generate

    def _build_tts_fn(self, maxlen, minlen, threshold):
        model = self
        cfg = self.config
        r = cfg.reduction_factor

        def fn(params, input_ids, attention_mask, speaker_embeddings, key):
            enc = model.encode(params, input_ids, attention_mask)
            dec = model.speecht5.decoder
            dp = params["speecht5"]["decoder"]
            pp = params["speech_decoder_postnet"]
            cross_kv = _mk_cross_kv(dec.wrapped_decoder, dp, enc.last_hidden_state)
            cache = init_static_cache(
                num_layers=cfg.decoder_layers, batch_size=input_ids.shape[0],
                max_len=maxlen, num_kv_heads=cfg.decoder_attention_heads,
                head_dim=cfg.hidden_size // cfg.decoder_attention_heads,
                dtype=model.dtype)
            b = input_ids.shape[0]
            mel = cfg.num_mel_bins
            frame0 = jnp.zeros((b, 1, mel), model.dtype)
            buf = jnp.zeros((b, maxlen, r, mel), model.dtype)
            done = jnp.zeros((b,), bool)
            lengths = jnp.full((b,), maxlen, jnp.int32)

            def cond(carry):
                step, _, _, _, done, _, _ = carry
                return (step < maxlen) & ~jnp.all(done)

            def body(carry):
                step, frame, cache, buf, done, lengths, key = carry
                key, sub = jax.random.split(key)
                embeds = dec.prenet(dp["prenet"], frame, speaker_embeddings,
                                    rng=sub, pos_offset=step)
                dec_mask = (jnp.arange(maxlen)[None, :] <= step).astype(jnp.int32)
                dec_mask = jnp.broadcast_to(dec_mask, (b, maxlen))
                hidden, new_cache = dec.wrapped_decoder(
                    dp["wrapped_decoder"], embeds, cross_kv, cache, step,
                    dec_mask, attention_mask)
                last = hidden[:, -1]
                spectrum = model.speech_decoder_postnet.feat_out(
                    pp["feat_out"], last).reshape(b, r, mel)
                buf = jax.lax.dynamic_update_slice(buf, spectrum[:, None],
                                                   (0, step, 0, 0))
                prob = jax.nn.sigmoid(model.speech_decoder_postnet.prob_out(
                    pp["prob_out"], last))
                finished = (prob.sum(-1) >= threshold) & (step + 1 >= minlen)
                newly = finished & ~done
                lengths = jnp.where(newly, step + 1, lengths)
                done = done | finished
                return (step + 1, spectrum[:, -1:], new_cache, buf, done, lengths, key)

            carry = (jnp.asarray(0), frame0, cache, buf, done, lengths, key)
            step, _, _, buf, done, lengths, _ = jax.lax.while_loop(cond, body, carry)
            return buf.reshape(b, maxlen * r, mel), lengths

        return fn


class SpeechT5ForSpeechToSpeech(SpeechT5PreTrainedModel):
    """Voice conversion: speech encoder prenet + speech decoder (reference
    SpeechT5ForSpeechToSpeech)."""

    main_input_name = "input_values"

    def __init__(self, config: SpeechT5Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        enc = _EncoderWrapper(SpeechT5SpeechEncoderPrenet(config, **kw),
                              SpeechT5Encoder(config, **kw), **kw)
        dec = _DecoderWrapper(SpeechT5SpeechDecoderPrenet(config, **kw),
                              SpeechT5Decoder(config, **kw), **kw)
        self.speecht5 = _SpeechT5Core(enc, dec, **kw)
        self.speech_decoder_postnet = SpeechT5SpeechDecoderPostnet(config, **kw)

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_values=None, attention_mask=None,
                 decoder_input_values=None, decoder_attention_mask=None,
                 speaker_embeddings=None, prenet_rng=None, **kwargs):
        enc = self.speecht5.encoder
        hidden, feat_mask = enc.prenet(params["speecht5"]["encoder"]["prenet"],
                                       input_values, attention_mask)
        hidden = enc.wrapped_encoder(params["speecht5"]["encoder"]["wrapped_encoder"],
                                     hidden, feat_mask)
        dec = self.speecht5.decoder
        dp = params["speecht5"]["decoder"]
        embeds = dec.prenet(dp["prenet"], decoder_input_values, speaker_embeddings,
                            rng=prenet_rng)
        cross_kv = _mk_cross_kv(dec.wrapped_decoder, dp, hidden)
        out, _ = dec.wrapped_decoder(dp["wrapped_decoder"], embeds, cross_kv, None, 0,
                                     decoder_attention_mask, feat_mask)
        before, after, logits = self.speech_decoder_postnet(
            params["speech_decoder_postnet"], out)
        return Seq2SeqSpectrogramOutput(spectrogram=after,
                                        encoder_last_hidden_state=hidden)


# ------------------------------------------------------------------- vocoder
class HifiGanResidualBlock(Module):
    def __init__(self, channels, kernel_size, dilations, slope, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.slope = slope
        self.convs1 = [Conv(channels, channels, kernel_size, padding=(kernel_size * d - d) // 2,
                            dilation=d, ndim=1, **kw) for d in dilations]
        self.convs2 = [Conv(channels, channels, kernel_size,
                            padding=(kernel_size - 1) // 2, ndim=1, **kw)
                       for _ in dilations]

    def __call__(self, params, x):
        for i in range(len(self.convs1)):
            res = x
            h = jax.nn.leaky_relu(x, self.slope)
            h = self.convs1[i](params["convs1"][str(i)], h)
            h = jax.nn.leaky_relu(h, self.slope)
            h = self.convs2[i](params["convs2"][str(i)], h)
            x = h + res
        return x


class SpeechT5HifiGan(PreTrainedModel):
    """HiFi-GAN vocoder (reference SpeechT5HifiGan): mel [.., frames, mel] →
    waveform.  Conv stacks are plain (weight-norm removed in released
    checkpoints); mean/scale spectrogram normalization buffers are params."""

    config_class = SpeechT5HifiGanConfig
    base_model_prefix = ""
    main_input_name = "spectrogram"

    def __init__(self, config: SpeechT5HifiGanConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_kernels = len(config.resblock_kernel_sizes)
        self.num_upsamples = len(config.upsample_rates)
        self.conv_pre = Conv(config.model_in_dim, config.upsample_initial_channel,
                             7, padding=3, ndim=1, **kw)
        ups = []
        for i, (rate, k) in enumerate(zip(config.upsample_rates,
                                          config.upsample_kernel_sizes)):
            ups.append(_ConvTranspose1d(
                config.upsample_initial_channel // (2 ** i),
                config.upsample_initial_channel // (2 ** (i + 1)),
                k, rate, (k - rate) // 2, **kw))
        self.upsampler = ups
        blocks = []
        for i in range(len(ups)):
            ch = config.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(config.resblock_kernel_sizes,
                            config.resblock_dilation_sizes):
                blocks.append(HifiGanResidualBlock(ch, k, d, config.leaky_relu_slope, **kw))
        self.resblocks = blocks
        self.conv_post = Conv(ch, 1, 7, padding=3, ndim=1, **kw)

    def init(self, rng):
        params = super().init(rng)
        d = self.config.model_in_dim
        params["mean"] = jnp.zeros((d,), self.param_dtype)
        params["scale"] = jnp.ones((d,), self.param_dtype)
        return params

    def __call__(self, params=None, spectrogram=None, **kwargs):
        if spectrogram is None:
            spectrogram = params
            params = self.params
        spectrogram = jnp.asarray(spectrogram, self.dtype)
        if self.config.normalize_before:
            spectrogram = (spectrogram - params["mean"].astype(self.dtype)) \
                / params["scale"].astype(self.dtype)
        batched = spectrogram.ndim == 3
        if not batched:
            spectrogram = spectrogram[None]
        x = jnp.swapaxes(spectrogram, 1, 2)
        x = self.conv_pre(params["conv_pre"], x)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, self.config.leaky_relu_slope)
            x = self.upsampler[i](params["upsampler"][str(i)], x)
            res = self.resblocks[i * self.num_kernels](
                params["resblocks"][str(i * self.num_kernels)], x)
            for j in range(1, self.num_kernels):
                res = res + self.resblocks[i * self.num_kernels + j](
                    params["resblocks"][str(i * self.num_kernels + j)], x)
            x = res / self.num_kernels
        x = jax.nn.leaky_relu(x, 0.01)
        x = jnp.tanh(self.conv_post(params["conv_post"], x))
        if not batched:
            return x[0, 0]
        return x[:, 0]


class _ConvTranspose1d(Module):
    """torch ConvTranspose1d with symmetric padding (weight [in, out, k])."""

    def __init__(self, in_ch, out_ch, kernel, stride, padding, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.in_ch, self.out_ch = in_ch, out_ch
        self.kernel, self.stride, self.pad = kernel, stride, padding

    def init(self, rng):
        kw, kb = jax.random.split(rng)
        fan_in = self.in_ch * self.kernel
        bound = 1.0 / math.sqrt(fan_in)
        return {"weight": jax.random.uniform(kw, (self.in_ch, self.out_ch, self.kernel),
                                             self.param_dtype, -bound, bound),
                "bias": jax.random.uniform(kb, (self.out_ch,), self.param_dtype,
                                           -bound, bound)}

    def __call__(self, params, x):
        w = params["weight"].astype(self.dtype)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), w, strides=(self.stride,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), transpose_kernel=True)
        y = y + params["bias"].astype(self.dtype)[None, :, None]
        if self.pad:
            y = y[..., self.pad:-self.pad]
        return y
