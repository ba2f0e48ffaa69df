"""Speech2Text, TPU-native (reference
src/transformers/models/speech_to_text/modeling_speech_to_text.py).

Fairseq S2T: log-mel features → stacked stride-2 Conv1d with GLU
(Conv1dSubsampler) → sqrt(d)-scaled + pad-aware sinusoidal positions →
pre-LN transformer encoder; pre-LN decoder with sinusoidal positions and a
tied lm_head. The cross-attention mask is the CONV-SUBSAMPLED feature mask
((len−1)//2+1 per conv layer)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Conv, Embedding, LayerNorm, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ..bart.modeling_bart import BartDecoder, BartEncoderLayer
from ..m2m_100.modeling_m2m_100 import (
    M2M100DecoderLayer,
    M2M100SinusoidalPositionalEmbedding,
)
from .configuration_speech_to_text import Speech2TextConfig


def conv_output_lengths(config, lengths):
    for _ in range(config.num_conv_layers):
        lengths = (lengths - 1) // 2 + 1
    return lengths


class Conv1dSubsampler(Module):
    """Stride-2 Conv1d stack with GLU activations (reference Conv1dSubsampler)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        in_ch = config.input_feat_per_channel * config.input_channels
        mid = config.conv_channels
        out = config.d_model
        n = config.num_conv_layers
        self.conv_layers = [
            Conv(in_ch if i == 0 else mid // 2,
                 mid if i < n - 1 else out * 2,
                 k, stride=2, padding=k // 2, use_bias=True, ndim=1,
                 dtype=dtype, param_dtype=param_dtype)
            for i, k in enumerate(config.conv_kernel_sizes)
        ]

    def __call__(self, params, input_features):  # [B, T, F]
        x = jnp.swapaxes(input_features, 1, 2)  # [B, F, T]
        for i, conv in enumerate(self.conv_layers):
            x = conv(params["conv_layers"][str(i)], x)
            a, b = jnp.split(x, 2, axis=1)
            x = a * jax.nn.sigmoid(b)
        return jnp.swapaxes(x, 1, 2)  # [B, T', d]


class Speech2TextEncoderLayer(BartEncoderLayer):
    pre_norm = True


class Speech2TextEncoder(Module):
    def __init__(self, config: Speech2TextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.conv = Conv1dSubsampler(config, **kw)
        self.embed_positions = M2M100SinusoidalPositionalEmbedding(
            config.max_source_positions, config.d_model,
            padding_idx=config.pad_token_id, **kw)
        self.layers = [Speech2TextEncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        self.layer_norm = LayerNorm(config.d_model, 1e-5, **kw)
        self.embed_scale = math.sqrt(config.d_model) if config.scale_embedding else 1.0

    def subsampled_mask(self, attention_mask, out_len):
        lengths = conv_output_lengths(self.config, attention_mask.sum(-1))
        return (jnp.arange(out_len)[None, :] < lengths[:, None]).astype(jnp.int32)

    def __call__(self, params, input_features, attention_mask=None):
        h = self.conv(params["conv"], jnp.asarray(input_features, self.dtype))
        h = h * self.embed_scale
        b, s, _ = h.shape
        if attention_mask is not None:
            feat_mask = self.subsampled_mask(attention_mask, s)
        else:
            feat_mask = jnp.ones((b, s), jnp.int32)
        pad = self.config.pad_token_id
        positions = jnp.cumsum(feat_mask, axis=-1) * feat_mask + pad
        h = h + self.embed_positions(params.get("embed_positions", {}), positions
                                     ).astype(h.dtype)
        attn_args = {"kv_valid": feat_mask, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        return self.layer_norm(params["layer_norm"], h), feat_mask


class Speech2TextDecoder(BartDecoder):
    layer_cls = M2M100DecoderLayer
    use_layernorm_embedding = False
    use_final_norm = True

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.d_model,
                                      embedding_init=normal_init(config.init_std),
                                      dtype=dtype, param_dtype=param_dtype)
        self.pos_start = config.pad_token_id + 1

    def make_positions(self, config, **kw):
        return M2M100SinusoidalPositionalEmbedding(
            config.max_target_positions, config.d_model,
            padding_idx=config.pad_token_id, **kw)


class Speech2TextModel(Module):
    def __init__(self, config: Speech2TextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = Speech2TextEncoder(config, **kw)
        self.decoder = Speech2TextDecoder(config, **kw)


class Speech2TextPreTrainedModel(PreTrainedModel):
    config_class = Speech2TextConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r"^lm_head\.weight$",)


class Speech2TextForConditionalGeneration(Speech2TextPreTrainedModel,
                                          EncoderDecoderGenerationMixin):
    encoder_input_name = "input_features"

    def __init__(self, config: Speech2TextConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = Speech2TextModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def encode(self, params, input_features, attention_mask=None) -> BaseModelOutput:
        hidden, _ = self.model.encoder(params["model"]["encoder"],
                                       input_features, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            out.append(layer.encoder_attn.kv(
                params["model"]["decoder"]["layers"][str(i)]["encoder_attn"],
                encoder_hidden))
        return tuple(out)

    def _encoder_feat_mask(self, encoder_mask, enc_len):
        if encoder_mask is None:
            return None
        if encoder_mask.shape[1] == enc_len:
            return encoder_mask
        return self.model.encoder.subsampled_mask(encoder_mask, enc_len)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        enc_len = cross_kv[0][0].shape[1]
        feat_mask = self._encoder_feat_mask(encoder_mask, enc_len)
        embeds = self.model.decoder.embed_tokens(
            params["model"]["decoder"]["embed_tokens"], input_ids)
        return self.model.decoder(params["model"]["decoder"], embeds, cross_kv, cache,
                                  cache_position, decoder_mask, feat_mask)

    def compute_logits(self, params, hidden):
        return self.model.decoder.embed_tokens.attend(
            params["model"]["decoder"]["embed_tokens"], hidden)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, input_features=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_features, attention_mask)
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
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)
