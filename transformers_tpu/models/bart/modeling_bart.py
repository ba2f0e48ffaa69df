"""BART, TPU-native (reference src/transformers/models/bart/modeling_bart.py).

Post-LN encoder-decoder with learned positions (offset +2), shared
embeddings, tied lm_head + final_logits_bias. Decode via the shared seq2seq
mixin (precomputed cross K/V + static self-attn cache).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import (BaseModelOutput,
                                 QuestionAnsweringModelOutput,
                                 Seq2SeqLMOutput, SequenceClassifierOutput)
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_bart import BartConfig


class BartLearnedPositionalEmbedding(Embedding):
    """Positions offset by 2 (reference BartLearnedPositionalEmbedding)."""

    OFFSET = 2

    def __init__(self, num_positions, features, **kw):
        super().__init__(num_positions + self.OFFSET, features, **kw)

    def __call__(self, params, positions):
        return super().__call__(params, positions + self.OFFSET)


class BartAttention(Module):
    def __init__(self, embed_dim, num_heads, config, *, use_bias=True,
                 dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.q_proj = Linear(embed_dim, embed_dim, use_bias, **kw)
        self.k_proj = Linear(embed_dim, embed_dim, use_bias, **kw)
        self.v_proj = Linear(embed_dim, embed_dim, use_bias, **kw)
        self.out_proj = Linear(embed_dim, embed_dim, use_bias, **kw)

    def kv(self, params, hidden):
        b, s, _ = hidden.shape
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, attn_args, kv_precomputed=None,
                 cache: Optional[StaticKVCache] = None, layer_idx: int = 0, cache_position=0):
        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        return self.out_proj(params["out_proj"], out.reshape(b, s, e)), cache


class BartEncoderLayer(Module):
    # pre_norm=True is the mBART/Pegasus/M2M100 layout (norm before the
    # sublayer); False is BART/Marian post-LN.
    pre_norm = False

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = BartAttention(d, config.encoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.encoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.encoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args):
        if self.pre_norm:
            h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
            h, _ = self.self_attn(params["self_attn"], h, attn_args)
            hidden = hidden + h
            h = self.final_layer_norm(params["final_layer_norm"], hidden)
            h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
            return hidden + h
        h, _ = self.self_attn(params["self_attn"], hidden, attn_args)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h)


class BartDecoderLayer(Module):
    pre_norm = False

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = BartAttention(d, config.decoder_attention_heads, config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.encoder_attn = BartAttention(d, config.decoder_attention_heads, config, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache, layer_idx, cache_position):
        if self.pre_norm:
            h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
            h, cache = self.self_attn(params["self_attn"], h, attn_args,
                                      cache=cache, layer_idx=layer_idx, cache_position=cache_position)
            hidden = hidden + h
            h = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden)
            h, _ = self.encoder_attn(params["encoder_attn"], h, cross_args, kv_precomputed=cross_kv)
            hidden = hidden + h
            h = self.final_layer_norm(params["final_layer_norm"], hidden)
            h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
            return hidden + h, cache
        h, cache = self.self_attn(params["self_attn"], hidden, attn_args,
                                  cache=cache, layer_idx=layer_idx, cache_position=cache_position)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h, _ = self.encoder_attn(params["encoder_attn"], hidden, cross_args, kv_precomputed=cross_kv)
        hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h), cache


class BartEncoder(Module):
    layer_cls = BartEncoderLayer
    pos_cls = BartLearnedPositionalEmbedding
    use_layernorm_embedding = True
    use_final_norm = False
    # first real position index (M2M100 overrides to padding_idx + 1)
    pos_start = 0

    def __init__(self, config: BartConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_positions = self.make_positions(config, **kw)
        self.layers = [self.layer_cls(config, **kw) for _ in range(config.encoder_layers)]
        if self.use_layernorm_embedding:
            self.layernorm_embedding = LayerNorm(d, 1e-5, **kw)
        if self.use_final_norm:
            self.layer_norm = LayerNorm(d, 1e-5, **kw)
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0

    def make_positions(self, config, **kw):
        return self.pos_cls(config.max_position_embeddings, config.d_model, **kw)

    def encoder_positions(self, b, s, attention_mask):
        return jnp.arange(s, dtype=jnp.int32)[None, :] + self.pos_start

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = self.encoder_positions(b, s, attention_mask)
        h = inputs_embeds * self.embed_scale + self.embed_positions(params.get("embed_positions", {}), positions)
        if self.use_layernorm_embedding:
            h = self.layernorm_embedding(params["layernorm_embedding"], h)
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args)
        if self.use_final_norm:
            h = self.layer_norm(params["layer_norm"], h)
        return h


class BartDecoder(Module):
    layer_cls = BartDecoderLayer
    pos_cls = BartLearnedPositionalEmbedding
    use_layernorm_embedding = True
    use_final_norm = False
    pos_start = 0
    # BlenderbotSmall: layernorm_embedding on the embeds BEFORE adding positions
    ln_embed_before_positions = False

    def __init__(self, config: BartConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_positions = self.make_positions(config, **kw)
        self.layers = [self.layer_cls(config, **kw) for _ in range(config.decoder_layers)]
        if self.use_layernorm_embedding:
            self.layernorm_embedding = LayerNorm(d, 1e-5, **kw)
        if self.use_final_norm:
            self.layer_norm = LayerNorm(d, 1e-5, **kw)
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0

    def make_positions(self, config, **kw):
        return self.pos_cls(config.max_position_embeddings, config.d_model, **kw)

    def __call__(self, params, inputs_embeds, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        b, s, _ = inputs_embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        pos_embeds = self.embed_positions(
            params.get("embed_positions", {}), positions[None, :] + self.pos_start)
        h = inputs_embeds * self.embed_scale
        if self.use_layernorm_embedding and self.ln_embed_before_positions:
            h = self.layernorm_embedding(params["layernorm_embedding"], h) + pos_embeds
        else:
            h = h + pos_embeds
            if self.use_layernorm_embedding:
                h = self.layernorm_embedding(params["layernorm_embedding"], h)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, attn_args, cross_args,
                             cross_kv[i], cache, i, cache_position)
        if self.use_final_norm:
            h = self.layer_norm(params["layer_norm"], h)
        return h, cache


class BartModel(Module):
    encoder_cls = BartEncoder
    decoder_cls = BartDecoder

    def __init__(self, config: BartConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(config.init_std), **kw)
        self.encoder = self.encoder_cls(config, **kw)
        self.decoder = self.decoder_cls(config, **kw)


class BartPreTrainedModel(PreTrainedModel):
    config_class = BartConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (
        r"\.embed_tokens\.weight$", r"^lm_head\.weight$")


class BartForConditionalGeneration(BartPreTrainedModel, EncoderDecoderGenerationMixin):
    model_cls = BartModel
    use_final_logits_bias = True

    def __init__(self, config: BartConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = self.model_cls(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.vocab_size = config.vocab_size

    def init(self, rng):
        params = super().init(rng)
        if self.use_final_logits_bias:
            params["final_logits_bias"] = jnp.zeros((1, self.vocab_size), self.param_dtype)
        return params

    def get_input_embedding_path(self):
        return "model.shared.weight"

    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        embeds = self.model.shared(params["model"]["shared"], input_ids)
        hidden = self.model.encoder(params["model"]["encoder"], embeds, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            out.append(layer.encoder_attn.kv(
                params["model"]["decoder"]["layers"][str(i)]["encoder_attn"], encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        embeds = self.model.shared(params["model"]["shared"], input_ids)
        return self.model.decoder(params["model"]["decoder"], embeds, cross_kv, cache,
                                  cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        logits = self.model.shared.attend(params["model"]["shared"], hidden)
        if self.use_final_logits_bias:
            logits = logits + params["final_logits_bias"].astype(logits.dtype)
        return logits

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None, past_key_values=None,
                 cache_position=0, labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
        if decoder_input_ids is None and labels is not None:
            # reference shift_tokens_right: start token then labels[:-1]
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100, self.config.pad_token_id,
                                          decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv, past_key_values,
                                         cache_position, decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


def shift_tokens_right(input_ids, pad_token_id, decoder_start_token_id):
    """Reference modeling_bart.py shift_tokens_right: prepend start token,
    drop last, replace -100 with pad."""
    shifted = jnp.concatenate(
        [jnp.full((input_ids.shape[0], 1), decoder_start_token_id, input_ids.dtype),
         input_ids[:, :-1]], axis=1)
    return jnp.where(shifted == -100, pad_token_id, shifted)


class BartClassificationHead(Module):
    """dense -> tanh -> out_proj (reference BartClassificationHead)."""

    def __init__(self, input_dim, inner_dim, num_classes, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(input_dim, inner_dim, True, **kw)
        self.out_proj = Linear(inner_dim, num_classes, True, **kw)

    def __call__(self, params, x):
        return self.out_proj(params["out_proj"],
                             jnp.tanh(self.dense(params["dense"], x)))


class _BartSeq2SeqBackbone(Module):
    """Shared forward for the classification/QA heads: full encoder-decoder
    pass with decoder_input_ids defaulting to shift_tokens_right(input_ids)
    (reference BartModel.forward)."""

    def run(self, params, model, config, input_ids, attention_mask,
            decoder_input_ids, decoder_attention_mask):
        if decoder_input_ids is None:
            decoder_input_ids = shift_tokens_right(
                input_ids, config.pad_token_id, config.decoder_start_token_id)
        embeds = model.shared(params["model"]["shared"], input_ids)
        enc = model.encoder(params["model"]["encoder"], embeds, attention_mask)
        cross_kv = []
        for i, layer in enumerate(model.decoder.layers):
            cross_kv.append(layer.encoder_attn.kv(
                params["model"]["decoder"]["layers"][str(i)]["encoder_attn"], enc))
        dec_embeds = model.shared(params["model"]["shared"], decoder_input_ids)
        hidden, _ = model.decoder(params["model"]["decoder"], dec_embeds,
                                  tuple(cross_kv), None, 0,
                                  decoder_attention_mask, attention_mask)
        return hidden


class BartForSequenceClassification(BartPreTrainedModel, _BartSeq2SeqBackbone):
    """Pools the decoder hidden state at the LAST eos token
    (reference BartForSequenceClassification)."""

    model_cls = BartModel

    def __init__(self, config: BartConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = self.model_cls(config, **kw)
        self.classification_head = BartClassificationHead(
            config.d_model, config.d_model, config.num_labels, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 labels=None, **kwargs):
        hidden = self.run(params, self.model, self.config, input_ids,
                          attention_mask, decoder_input_ids,
                          decoder_attention_mask)
        ids = decoder_input_ids if decoder_input_ids is not None else input_ids
        eos_mask = ids == self.config.eos_token_id
        s = ids.shape[1]
        last_eos = jnp.where(eos_mask, jnp.arange(s)[None, :], -1).max(axis=1)
        pooled = jnp.take_along_axis(
            hidden, last_eos[:, None, None].clip(0), axis=1)[:, 0]
        logits = self.classification_head(params["classification_head"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)


class BartForQuestionAnswering(BartPreTrainedModel, _BartSeq2SeqBackbone):
    """Span head over the decoder output (reference BartForQuestionAnswering)."""

    model_cls = BartModel

    def __init__(self, config: BartConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = self.model_cls(config, **kw)
        self.qa_outputs = Linear(config.d_model, 2, True, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 start_positions=None, end_positions=None, **kwargs):
        hidden = self.run(params, self.model, self.config, input_ids,
                          attention_mask, decoder_input_ids,
                          decoder_attention_mask)
        logits = self.qa_outputs(params["qa_outputs"], hidden)
        start_logits = logits[..., 0]
        end_logits = logits[..., 1]
        loss = None
        if start_positions is not None and end_positions is not None:
            from ...loss import for_question_answering_loss

            loss = for_question_answering_loss(start_logits, end_logits,
                                               start_positions, end_positions)
        return QuestionAnsweringModelOutput(loss=loss, start_logits=start_logits,
                                            end_logits=end_logits)
