"""LED — Longformer-Encoder-Decoder (reference
src/transformers/models/led/modeling_led.py).

BART-style post-LN seq2seq whose ENCODER self-attention is the Longformer
sliding-window + global pattern (projections under
``self_attn.longformer_self_attn``, output proj ``self_attn.output``),
with zero-offset learned positions and prefix ``led``. As with our
Longformer, the windowed math runs as exact masked dense attention
(the reference's chunking is a CUDA memory layout, not different math)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bart.configuration_bart import BartConfig
from ..bart.modeling_bart import BartDecoder
from ..blenderbot.modeling_blenderbot import NoOffsetPositionalEmbedding
from ..longformer.modeling_longformer import LongformerSelfAttention
from .configuration_led import LEDConfig


class LEDEncoderAttention(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.longformer_self_attn = LongformerSelfAttention(
            config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.output = Linear(config.d_model, config.d_model, True, dtype=dtype,
                             param_dtype=param_dtype,
                             kernel_init=normal_init(config.init_std))

    def __call__(self, params, hidden, valid, is_global):
        out = self.longformer_self_attn(params["longformer_self_attn"], hidden,
                                        valid, is_global)
        return self.output(params["output"], out)


class LEDEncoderLayer(Module):
    """Post-LN (reference LEDEncoderLayer)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(dtype=dtype, param_dtype=param_dtype,
                   kernel_init=normal_init(config.init_std))
        self.self_attn = LEDEncoderAttention(config, layer_idx, **kw)
        self.self_attn_layer_norm = LayerNorm(config.d_model, 1e-5, **kw)
        self.fc1 = Linear(config.d_model, config.encoder_ffn_dim, True, **lkw)
        self.fc2 = Linear(config.encoder_ffn_dim, config.d_model, True, **lkw)
        self.final_layer_norm = LayerNorm(config.d_model, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, valid, is_global):
        residual = hidden
        h = self.self_attn(params["self_attn"], hidden, valid, is_global)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], residual + h)
        residual = hidden
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], residual + h)


class LEDEncoder(Module):
    def __init__(self, config: LEDConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_positions = NoOffsetPositionalEmbedding(
            config.max_encoder_position_embeddings, config.d_model,
            embedding_init=normal_init(config.init_std), **kw)
        self.layers = [LEDEncoderLayer(config, i, **kw)
                       for i in range(config.encoder_layers)]
        self.layernorm_embedding = LayerNorm(config.d_model, 1e-5, **kw)

    def __call__(self, params, inputs_embeds, attention_mask=None,
                 global_attention_mask=None):
        embeds = inputs_embeds
        b, s, _ = embeds.shape
        pos = self.embed_positions(params["embed_positions"],
                                   jnp.arange(s, dtype=jnp.int32)[None, :])
        h = self.layernorm_embedding(params["layernorm_embedding"], embeds + pos)
        valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        is_global = (global_attention_mask if global_attention_mask is not None
                     else jnp.zeros((b, s), jnp.int32))
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, valid, is_global)
        return h


class LEDDecoder(BartDecoder):
    pos_cls = NoOffsetPositionalEmbedding

    def make_positions(self, config, **kw):
        return self.pos_cls(config.max_decoder_position_embeddings, config.d_model,
                            embedding_init=normal_init(config.init_std), **kw)


class LEDModel(Module):
    def __init__(self, config: LEDConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(config.init_std), **kw)
        self.encoder = LEDEncoder(config, **kw)
        self.decoder = LEDDecoder(config, **kw)


class LEDPreTrainedModel(PreTrainedModel):
    config_class = LEDConfig
    base_model_prefix = "led"
    _keys_to_ignore_on_load_unexpected = (
        r"\.embed_tokens\.weight$", r"^lm_head\.weight$")


class LEDForConditionalGeneration(LEDPreTrainedModel, EncoderDecoderGenerationMixin):
    def __init__(self, config: LEDConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.led = LEDModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        params["final_logits_bias"] = jnp.zeros((1, self.vocab_size), self.param_dtype)
        return params

    def get_input_embedding_path(self):
        return "led.shared.weight"

    def encode(self, params, input_ids, attention_mask=None,
               global_attention_mask=None) -> BaseModelOutput:
        embeds = self.led.shared(params["led"]["shared"], input_ids)
        hidden = self.led.encoder(params["led"]["encoder"], embeds, attention_mask,
                                  global_attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.led.decoder.layers):
            out.append(layer.encoder_attn.kv(
                params["led"]["decoder"]["layers"][str(i)]["encoder_attn"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = self.led.shared(params["led"]["shared"], input_ids)
        return self.led.decoder(params["led"]["decoder"], embeds, cross_kv, cache,
                                cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        logits = self.led.shared.attend(params["led"]["shared"], hidden)
        return logits + params["final_logits_bias"].astype(logits.dtype)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 global_attention_mask=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None,
                 past_key_values=None, cache_position=0, labels=None,
                 **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask,
                                          global_attention_mask)
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
