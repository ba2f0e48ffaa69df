"""MusicGen (reference src/transformers/models/musicgen/modeling_musicgen.py).

Text-to-music: T5 text encoder → pre-LN cross-attending decoder over
K parallel EnCodec codebook streams (per-codebook embeddings summed, one
lm_head per codebook, delay-pattern interleaving for generation), with the
EnCodec model decoding predicted codes back to a waveform. All decoder
projections are bias-free; positions are a weightless [cos | sin] sinusoid
table."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_musicgen import MusicgenConfig, MusicgenDecoderConfig


@dataclass
class MusicgenOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    encoder_last_hidden_state: Any = None


def musicgen_sinusoid_table(n, dim):
    """[cos | sin] concat layout (reference get_embedding — note cos FIRST)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    ang = np.arange(n, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n, 1))], axis=1)
    return table.astype(np.float32)


class _MGAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_factor))
        d = config.hidden_size
        self.q_proj = Linear(d, d, False, **kw)
        self.k_proj = Linear(d, d, False, **kw)
        self.v_proj = Linear(d, d, False, **kw)
        self.out_proj = Linear(d, d, False, **kw)

    def __call__(self, params, hidden, kv_hidden, additive_mask=None):
        b, s, d = hidden.shape
        t = kv_hidden.shape[1]
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], kv_hidden).reshape(b, t, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], kv_hidden).reshape(b, t, self.num_heads, self.head_dim)
        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (self.head_dim**-0.5)
        if additive_mask is not None:
            scores = scores + additive_mask
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
        return self.out_proj(params["out_proj"], out.reshape(b, s, d).astype(hidden.dtype))


class MusicgenDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_factor))
        d = config.hidden_size
        self.self_attn = _MGAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, **kw)
        self.encoder_attn = _MGAttention(config, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, **kw)
        self.fc1 = Linear(d, config.ffn_dim, False, **lkw)
        self.fc2 = Linear(config.ffn_dim, d, False, **lkw)
        self.final_layer_norm = LayerNorm(d, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, causal_mask, enc_hidden, enc_mask):
        residual = hidden
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h = self.self_attn(params["self_attn"], h, h, causal_mask)
        hidden = residual + h
        if enc_hidden is not None:
            residual = hidden
            h = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden)
            h = self.encoder_attn(params["encoder_attn"], h, enc_hidden, enc_mask)
            hidden = residual + h
        residual = hidden
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return residual + h


class MusicgenDecoder(Module):
    def __init__(self, config: MusicgenDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.embed_tokens = [
            Embedding(config.vocab_size + 1, d,
                      embedding_init=normal_init(config.initializer_factor), **kw)
            for _ in range(config.num_codebooks)]
        self.layers = [MusicgenDecoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.layer_norm = LayerNorm(d, **kw)
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0
        self.pos_table = musicgen_sinusoid_table(config.max_position_embeddings, d)

    def __call__(self, params, input_ids, enc_hidden=None, enc_valid=None,
                 attention_mask=None):
        # input_ids [B*K, T] -> [B, K, T]
        k = self.config.num_codebooks
        bk, t = input_ids.shape
        ids = input_ids.reshape(bk // k, k, t)
        embeds = sum(self.embed_tokens[i](params["embed_tokens"][str(i)], ids[:, i])
                     for i in range(k))
        h = embeds * self.embed_scale
        pos = jnp.asarray(self.pos_table[:t], h.dtype)[None]
        h = h + pos

        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((t, t), neg, jnp.float32), k=1)[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask.astype(bool), 0.0, neg)[:, None, None, :]
            causal = causal + pad
        enc_mask = None
        if enc_hidden is not None and enc_valid is not None:
            enc_mask = jnp.where(enc_valid.astype(bool), 0.0, neg)[:, None, None, :]
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, causal, enc_hidden, enc_mask)
        return self.layer_norm(params["layer_norm"], h)


class MusicgenPreTrainedModel(PreTrainedModel):
    config_class = MusicgenConfig
    base_model_prefix = ""


class MusicgenForCausalLM(Module):
    """decoder + per-codebook lm_heads (reference MusicgenForCausalLM)."""

    def __init__(self, config: MusicgenDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.model = _MGModel(config, **kw)
        self.lm_heads = [
            Linear(config.hidden_size, config.vocab_size, False, dtype=dtype,
                   param_dtype=param_dtype,
                   kernel_init=normal_init(config.initializer_factor))
            for _ in range(config.num_codebooks)]

    def __call__(self, params, input_ids, enc_hidden=None, enc_valid=None,
                 attention_mask=None):
        hidden = self.model.decoder(params["model"]["decoder"], input_ids, enc_hidden,
                                    enc_valid, attention_mask)
        logits = jnp.stack(
            [self.lm_heads[i](params["lm_heads"][str(i)], hidden)
             for i in range(self.config.num_codebooks)], axis=1)  # [B, K, T, V]
        return logits.reshape(-1, *logits.shape[2:])  # [B*K, T, V]


class _MGModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = MusicgenDecoder(config, dtype=dtype, param_dtype=param_dtype)


class MusicgenForConditionalGeneration(MusicgenPreTrainedModel):
    def __init__(self, config: MusicgenConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        from ..t5.modeling_t5 import T5Stack
        from ...core.module import Embedding as _Emb

        self.text_encoder = _T5TextEncoder(config.text_encoder, **kw)
        from ..encodec.modeling_encodec import EncodecModel

        self.audio_encoder = _EncodecChild(config.audio_encoder, **kw)
        self.decoder = MusicgenForCausalLM(config.decoder, **kw)
        if config.text_encoder.d_model != config.decoder.hidden_size:
            self.enc_to_dec_proj = Linear(config.text_encoder.d_model,
                                          config.decoder.hidden_size, True, **kw)
        else:
            self.enc_to_dec_proj = None

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, labels=None, **kwargs) -> MusicgenOutput:
        enc_hidden = self.text_encoder(params["text_encoder"], input_ids, attention_mask)
        if self.enc_to_dec_proj is not None:
            enc_hidden = self.enc_to_dec_proj(params["enc_to_dec_proj"], enc_hidden)
        logits = self.decoder(params["decoder"], decoder_input_ids, enc_hidden,
                              attention_mask)
        return MusicgenOutput(logits=logits, encoder_last_hidden_state=enc_hidden)


class _T5TextEncoder(Module):
    """T5 encoder stack + shared embedding under the text_encoder prefix."""

    def __init__(self, t5_config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ..t5.modeling_t5 import T5Stack

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.shared = Embedding(t5_config.vocab_size, t5_config.d_model,
                                embedding_init=normal_init(1.0), **kw)
        self.encoder = T5Stack(t5_config, False, t5_config.num_layers, **kw)

    def __call__(self, params, input_ids, attention_mask=None):
        embeds = self.shared(params["shared"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds, attention_mask=attention_mask)
        return hidden


class _EncodecChild(Module):
    """EnCodec submodel under the audio_encoder prefix."""

    def __init__(self, encodec_config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ..encodec.modeling_encodec import (
            EncodecQuantizer,
            build_decoder,
            build_encoder,
        )

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = encodec_config
        self.encoder = build_encoder(encodec_config, **kw)
        self.decoder = build_decoder(encodec_config, **kw)
        self.quantizer = EncodecQuantizer(encodec_config, **kw)

    def decode_codes(self, params, codes):
        emb = self.quantizer.decode(params["quantizer"], codes)
        return self.decoder(params["decoder"], emb)
