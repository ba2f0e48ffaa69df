"""T5Gemma (reference models/t5gemma/modular_t5gemma.py): an encoder-decoder
built from Gemma2 blocks — sandwich norms, alternating sliding/full
self-attention, qk softcapping, sqrt(hidden) embedding scale — with
Whisper-style precomputed cross-attention K/V (the encoder runs once; each
decoder layer's cross K/V are constants threaded through the decode loop,
no is_updated bookkeeping)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...core.loading import WeightRule
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ...ops.rope import compute_cos_sin, rope_inv_freq
from ..gemma2.modeling_gemma2 import Gemma2Attention, Gemma2DecoderLayer, Gemma2MLP
from .configuration_t5gemma import T5GemmaConfig


class T5GemmaCrossAttention(Module):
    """Gemma2-scaled cross attention, K/V precomputed from the encoder
    (reference T5GemmaCrossAttention:179)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_key_value_heads
        self.head_dim = getattr(config, "head_dim", None) or \
            config.hidden_size // config.num_attention_heads
        scalar = getattr(config, "query_pre_attn_scalar", None)
        self.scale = (scalar ** -0.5) if scalar else self.head_dim ** -0.5
        self.logit_cap = getattr(config, "attn_logit_softcapping", None)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = getattr(config, "attention_bias", False)
        xdim = config.cross_attention_hidden_size or config.hidden_size
        self.q_proj = Linear(config.hidden_size, self.num_heads * self.head_dim, bias, **kw)
        self.k_proj = Linear(xdim, self.num_kv_heads * self.head_dim, bias, **kw)
        self.v_proj = Linear(xdim, self.num_kv_heads * self.head_dim, bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, config.hidden_size, bias, **kw)

    def kv(self, params, encoder_hidden):
        b, s, _ = encoder_hidden.shape
        k = self.k_proj(params["k_proj"], encoder_hidden).reshape(
            b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], encoder_hidden).reshape(
            b, s, self.num_kv_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, kv_precomputed, encoder_mask=None):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(
            b, s, self.num_heads, self.head_dim)
        k, v = kv_precomputed
        attn_fn = get_attention_fn(None)
        out = attn_fn(q, k, v, scale=self.scale, is_causal=False,
                      logit_cap=self.logit_cap,
                      kv_valid=None if encoder_mask is None
                      else jnp.asarray(encoder_mask))
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.o_proj(params["o_proj"], out)


class T5GemmaEncoderLayer(Gemma2DecoderLayer):
    """Bidirectional Gemma2 block (reference T5GemmaEncoderLayer:250)."""


class T5GemmaDecoderLayer(Gemma2DecoderLayer):
    """Gemma2 block + sandwiched cross attention (reference :302)."""

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.cross_attn = T5GemmaCrossAttention(config, **kw)
        self.pre_cross_attn_layernorm = self.make_norm(config, **kw)
        self.post_cross_attn_layernorm = self.make_norm(config, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache,
                 cache_position, cross_kv=None, encoder_mask=None):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args,
                                  cache, cache_position)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.pre_cross_attn_layernorm(params["pre_cross_attn_layernorm"], hidden)
        h = self.cross_attn(params["cross_attn"], h, cross_kv, encoder_mask)
        h = self.post_cross_attn_layernorm(params["post_cross_attn_layernorm"], h)
        hidden = residual + h
        residual = hidden
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], hidden)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        return residual + h, cache


class T5GemmaStack(Module):
    def __init__(self, config, is_decoder, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.is_decoder = is_decoder
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        cls = T5GemmaDecoderLayer if is_decoder else T5GemmaEncoderLayer
        self.layers = [cls(config, i, **kw)
                       for i in range(config.num_hidden_layers)]
        self.norm = RMSNorm(config.hidden_size, config.rms_norm_eps,
                            scale_offset=1.0, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, embeds, attention_mask=None, cross_kv=None,
                 encoder_mask=None, cache=None, cache_position=0,
                 position_ids=None):
        b, s, _ = embeds.shape
        hidden = embeds * (self.config.hidden_size ** 0.5)
        if position_ids is None:
            position_ids = (cache_position + jnp.arange(s))[None, :]
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=self.dtype)
        total = cache.max_len if cache is not None else s
        if attention_mask is not None:
            kv_valid = jnp.zeros((b, total), jnp.int32)
            kv_valid = kv_valid.at[:, :attention_mask.shape[1]].set(
                jnp.asarray(attention_mask, jnp.int32))
        elif cache is not None:
            kv_valid = (jnp.arange(total)[None, :]
                        < cache_position + s).astype(jnp.int32)
            kv_valid = jnp.broadcast_to(kv_valid, (b, total))
        else:
            kv_valid = None
        q_positions = jnp.broadcast_to(
            (cache_position + jnp.arange(s))[None, :], (b, s))
        for i, layer in enumerate(self.layers):
            attn_args = {"is_causal": self.is_decoder, "kv_valid": kv_valid,
                         "q_positions": q_positions,
                         "sliding_window": layer.self_attn.sliding_window}
            if self.is_decoder:
                hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                      attn_args, cache, cache_position,
                                      cross_kv=cross_kv[i],
                                      encoder_mask=encoder_mask)
            else:
                hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                      attn_args, None, 0)
        return self.norm(params["norm"], hidden), cache


class T5GemmaPreTrainedModel(PreTrainedModel):
    config_class = T5GemmaConfig
    base_model_prefix = "model"


T5GEMMA_WEIGHT_RULES = (
    WeightRule(pattern=r"^model\.encoder\.embed_tokens\.(.*)",
               rename=r"encoder_embed.\1"),
    WeightRule(pattern=r"^model\.decoder\.embed_tokens\.(.*)",
               rename=r"decoder_embed.\1"),
    WeightRule(pattern=r"^model\.(.*)", rename=r"\1"),
    WeightRule(pattern=r"(.*)\.pre_self_attn_layernorm\.(.*)",
               rename=r"\1.input_layernorm.\2"),
    WeightRule(pattern=r"(.*)\.post_self_attn_layernorm\.(.*)",
               rename=r"\1.post_attention_layernorm.\2"),
)


class T5GemmaForConditionalGeneration(T5GemmaPreTrainedModel,
                                      EncoderDecoderGenerationMixin):
    """Reference T5GemmaForConditionalGeneration:780."""

    _weight_rules = T5GEMMA_WEIGHT_RULES

    def __init__(self, config: T5GemmaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        enc, dec = config.encoder, config.decoder
        self.encoder_embed = Embedding(config.vocab_size, enc.hidden_size,
                                       embedding_init=normal_init(1.0), **kw)
        self.decoder_embed = Embedding(config.vocab_size, dec.hidden_size,
                                       embedding_init=normal_init(1.0), **kw)
        self.encoder = T5GemmaStack(enc, False, **kw)
        self.decoder = T5GemmaStack(dec, True, **kw)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(dec.hidden_size, config.vocab_size, False, **kw)

    tied_weights_keys = ()

    def get_input_embedding_path(self):
        return "encoder_embed.weight"

    # -------------------------------------------------------- seq2seq hooks
    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        embeds = self.encoder_embed(params["encoder_embed"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds,
                                 attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        return tuple(
            layer.cross_attn.kv(
                params["decoder"]["layers"][str(i)]["cross_attn"], encoder_hidden)
            for i, layer in enumerate(self.decoder.layers))

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = self.decoder_embed(params["decoder_embed"], input_ids)
        hidden, new_cache = self.decoder(
            params["decoder"], embeds, attention_mask=decoder_mask,
            cross_kv=cross_kv, encoder_mask=encoder_mask, cache=cache,
            cache_position=cache_position)
        return hidden, new_cache

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            logits = self.decoder_embed.attend(params["decoder_embed"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        cap = getattr(self.config.decoder, "final_logit_softcapping", None)
        if cap:
            logits = jnp.tanh(logits / cap) * cap
        return logits

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        dec = self.config.decoder
        head_dim = getattr(dec, "head_dim", None) or \
            dec.hidden_size // dec.num_attention_heads
        return init_static_cache(num_layers=dec.num_hidden_layers,
                                 batch_size=batch_size, max_len=max_len,
                                 num_kv_heads=dec.num_key_value_heads,
                                 head_dim=head_dim, dtype=dtype or self.dtype)

    # ---------------------------------------------------------- full forward
    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder.bos_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype),
                 labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(
                decoder_input_ids == -100,
                self.config.pad_token_id or 0, decoder_input_ids)
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
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class T5GemmaEncoderModel(T5GemmaPreTrainedModel):
    _weight_rules = T5GEMMA_WEIGHT_RULES
    _keys_to_ignore_on_load_unexpected = (r"^model\.decoder\.", r"^decoder\.")

    def __init__(self, config: T5GemmaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder_embed = Embedding(config.vocab_size,
                                       config.encoder.hidden_size,
                                       embedding_init=normal_init(1.0), **kw)
        self.encoder = T5GemmaStack(config.encoder, False, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, **kwargs):
        embeds = self.encoder_embed(params["encoder_embed"], input_ids)
        hidden, _ = self.encoder(params["encoder"], embeds,
                                 attention_mask=attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)
