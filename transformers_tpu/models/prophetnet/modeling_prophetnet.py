"""ProphetNet — future n-gram prediction seq2seq, TPU-native (reference
src/transformers/models/prophetnet/modeling_prophetnet.py).

The decoder runs 1 main stream + ``ngram`` predict streams concatenated on
the sequence axis (ProphetNetNgramSelfAttention :526). LM logits come from
the FIRST predict stream (reference :1588 ``predict_logits[:, 0]``), not the
main stream. Relative position buckets replicate the reference's buffered
full-length-then-slice computation bit for bit (compute_buffered_relative
_buckets :1280), including its second-half offset quirk. Greedy generation
re-runs the full (jitted, per-length) decoder — the predict-stream geometry
changes every step, so a KV-cache buys little for this 2020-era family.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ..bart.modeling_bart import get_activation
from .configuration_prophetnet import ProphetNetConfig

NEG_INF = jnp.finfo(jnp.float32).min


@dataclass
class ProphetNetSeq2SeqModelOutput(ModelOutput):
    last_hidden_state: Optional[jnp.ndarray] = None
    last_hidden_state_ngram: Optional[jnp.ndarray] = None
    encoder_last_hidden_state: Optional[jnp.ndarray] = None


@dataclass
class ProphetNetSeq2SeqLMOutput(ModelOutput):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    logits_ngram: Optional[jnp.ndarray] = None
    encoder_last_hidden_state: Optional[jnp.ndarray] = None


def compute_relative_buckets(num_buckets, max_distance, relative_positions):
    """Unidirectional bucket map (reference :66)."""
    inv = jnp.maximum(-relative_positions, 0)
    max_exact = num_buckets // 2
    is_small = inv < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(inv, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact))
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1).astype(jnp.int32)
    return jnp.where(is_small, inv.astype(jnp.int32), val_if_large)


def compute_all_stream_relative_buckets(num_buckets, max_distance, position_ids):
    """Main + predict buckets (reference :93)."""
    main_rel = position_ids[:, None, :] - position_ids[:, :, None]
    predict_pos = jnp.concatenate([position_ids - 1, position_ids], axis=-1)
    predict_rel = predict_pos[:, None, :] - position_ids[:, :, None]
    return (compute_relative_buckets(num_buckets, max_distance, main_rel),
            compute_relative_buckets(num_buckets, max_distance, predict_rel))


def ngram_attention_bias(sequence_length, ngram):
    """Predict-stream causal bias [ngram, S, 2S] (reference :44)."""
    rows = jnp.arange(sequence_length)[None, :, None]
    cols = jnp.arange(sequence_length)[None, None, :]
    offsets = (1 - jnp.arange(ngram))[:, None, None]
    left = jnp.where((cols - rows >= offsets) & (cols != 0), NEG_INF, 0.0)
    right = jnp.where(jnp.broadcast_to(rows != cols, (ngram, sequence_length,
                                                      sequence_length)), NEG_INF, 0.0)
    return jnp.concatenate([left, right], axis=2)


class ProphetNetPositionalEmbeddings(Embedding):
    """Learned positions offset by padding_idx (reference :342)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config.max_position_embeddings, config.hidden_size,
                         dtype=dtype, param_dtype=param_dtype,
                         embedding_init=normal_init(config.init_std))
        self.max_length = config.max_position_embeddings
        self.padding_idx = config.pad_token_id

    def position_ids(self, shape, attention_mask=None):
        b, s = shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        ids = jnp.cumsum(attention_mask, axis=1) * attention_mask + self.padding_idx
        return jnp.clip(ids, 0, self.max_length - 1).astype(jnp.int32)


class ProphetNetAttention(Module):
    """Plain MHA, q pre-scaled, f32 softmax (reference :385)."""

    def __init__(self, config, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.num_heads = num_heads
        self.head_dim = h // num_heads
        self.key_proj = Linear(h, h, **kw)
        self.value_proj = Linear(h, h, **kw)
        self.query_proj = Linear(h, h, **kw)
        self.out_proj = Linear(h, h, **kw)

    def _split(self, x, b):
        return jnp.swapaxes(x.reshape(b, -1, self.num_heads, self.head_dim), 1, 2)

    def __call__(self, params, hidden, key_value_states=None, attn_bias=None):
        b, t, h = hidden.shape
        src = key_value_states if key_value_states is not None else hidden
        q = self._split(self.query_proj(params["query_proj"], hidden)
                        / self.head_dim**0.5, b)
        k = self._split(self.key_proj(params["key_proj"], src), b)
        v = self._split(self.value_proj(params["value_proj"], src), b)
        w = jnp.einsum("bhtc,bhsc->bhts", q, k)
        if attn_bias is not None:
            w = w + attn_bias
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        out = jnp.einsum("bhts,bhsc->bhtc", p, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, t, h)
        return self.out_proj(params["out_proj"], out)


class ProphetNetFeedForward(Module):
    def __init__(self, config, ffn_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.intermediate = Linear(config.hidden_size, ffn_dim, **kw)
        self.output = Linear(ffn_dim, config.hidden_size, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.output(params["output"],
                           self.act(self.intermediate(params["intermediate"], x)))


class ProphetNetNgramSelfAttention(Module):
    """Main + predict stream attention (reference :526), full-forward form."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.config = config
        self.num_heads = config.num_decoder_attention_heads
        self.head_dim = h // self.num_heads
        self.ngram = config.ngram
        self.num_buckets = config.num_buckets
        self.key_proj = Linear(h, h, **kw)
        self.value_proj = Linear(h, h, **kw)
        self.query_proj = Linear(h, h, **kw)
        self.out_proj = Linear(h, h, **kw)
        self.relative_pos_embeddings = Linear(h, config.num_buckets * self.num_heads, **kw)

    def _split(self, x, b):
        return jnp.swapaxes(x.reshape(b, -1, self.num_heads, self.head_dim), 1, 2)

    def _main_rel_pos(self, params, hidden, buckets):
        """reference get_main_relative_pos_embeddings :727."""
        b, s, _ = hidden.shape
        rel = self.relative_pos_embeddings(params["relative_pos_embeddings"], hidden)
        rel = rel.reshape(b, s, self.num_buckets, self.num_heads)
        rel = jnp.transpose(rel, (0, 3, 1, 2))  # [B, H, S, buckets]
        idx = jnp.broadcast_to(buckets[:, None, :, :],
                               (b, self.num_heads) + buckets.shape[1:])
        return jnp.take_along_axis(rel, idx, axis=-1)

    def _predict_rel_pos(self, params, hidden_predict, buckets):
        """reference get_predict_relative_pos_embeddings :774 — replicated
        reshape-for-reshape including the flat-row pairing."""
        b, s = hidden_predict.shape[:2]
        n, heads = self.ngram, self.num_heads
        hp = jnp.swapaxes(hidden_predict, 1, 2)  # [B, n, S, H]
        rel = self.relative_pos_embeddings(params["relative_pos_embeddings"], hp)
        rel = rel.reshape(b, n, s, self.num_buckets, heads)
        rel = jnp.transpose(rel, (0, 2, 1, 4, 3)).reshape(-1, self.num_buckets)
        idx = jnp.broadcast_to(buckets[None, :, None, :, :],
                               (n, b, heads, s, buckets.shape[-1]))
        idx = idx.reshape(-1, idx.shape[-1])
        out = jnp.take_along_axis(rel, idx, axis=1)
        return out.reshape(b, n, heads, s, -1)

    def __call__(self, params, hidden, main_mask, predict_mask, position_ids,
                 main_buckets, predict_buckets):
        b, total, h = hidden.shape
        s = total // (1 + self.ngram)
        q = self._split(self.query_proj(params["query_proj"], hidden)
                        / self.head_dim**0.5, b)
        k = self._split(self.key_proj(params["key_proj"], hidden), b)
        v = self._split(self.value_proj(params["value_proj"], hidden), b)

        hs = jnp.split(hidden, 1 + self.ngram, axis=1)
        qs = jnp.split(q, 1 + self.ngram, axis=2)
        ks = jnp.split(k, 1 + self.ngram, axis=2)
        vs = jnp.split(v, 1 + self.ngram, axis=2)

        # MAIN stream
        w = jnp.einsum("bhtc,bhsc->bhts", qs[0], ks[0])
        w = w + self._main_rel_pos(params, hs[0], main_buckets)
        if main_mask is not None:
            w = w + main_mask
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        main_out = jnp.einsum("bhts,bhsc->bhtc", p, vs[0])
        main_out = jnp.swapaxes(main_out, 1, 2).reshape(b, 1, s, h)
        main_out = self.out_proj(params["out_proj"], main_out)

        # PREDICT streams
        pq = jnp.stack(qs[1:], 1)  # [B, n, H, S, d]
        pk = jnp.stack([jnp.concatenate([ks[0], kg], 2) for kg in ks[1:]], 1)
        pv = jnp.stack([jnp.concatenate([vs[0], vg], 2) for vg in vs[1:]], 1)
        hidden_predict = jnp.stack(hs[1:], 2)  # [B, S, n, H]
        w = jnp.einsum("bnhtc,bnhsc->bnhts", pq, pk)
        w = w + self._predict_rel_pos(params, hidden_predict, predict_buckets)
        if predict_mask is not None:
            # [B, n, H, S, 2S] (reference permutes from [B, H, n, S, 2S])
            w = w + jnp.transpose(predict_mask, (0, 2, 1, 3, 4))
        p = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        pred_out = jnp.einsum("bnhts,bnhsc->bnhtc", p, pv)
        pred_out = jnp.swapaxes(pred_out, 2, 3).reshape(b, self.ngram, s, h)
        pred_out = self.out_proj(params["out_proj"], pred_out)

        return jnp.concatenate([main_out, pred_out], 1).reshape(b, -1, h)


class ProphetNetEncoderLayer(Module):
    """Post-LN (reference :832)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = ProphetNetAttention(config, config.num_encoder_attention_heads, **kw)
        self.self_attn_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.feed_forward = ProphetNetFeedForward(config, config.encoder_ffn_dim, **kw)
        self.feed_forward_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, hidden, attn_bias):
        h = self.self_attn(params["self_attn"], hidden, attn_bias=attn_bias)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        h = self.feed_forward(params["feed_forward"], hidden)
        return self.feed_forward_layer_norm(params["feed_forward_layer_norm"], hidden + h)


class ProphetNetDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = ProphetNetNgramSelfAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)
        if config.add_cross_attention:
            self.cross_attn = ProphetNetAttention(config, config.num_decoder_attention_heads, **kw)
            self.cross_attn_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.feed_forward = ProphetNetFeedForward(config, config.decoder_ffn_dim, **kw)
        self.feed_forward_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, hidden, main_mask, predict_mask, position_ids,
                 main_buckets, predict_buckets, encoder_hidden, encoder_bias):
        h = self.self_attn(params["self_attn"], hidden, main_mask, predict_mask,
                           position_ids, main_buckets, predict_buckets)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        if encoder_hidden is not None:
            h = self.cross_attn(params["cross_attn"], hidden,
                                key_value_states=encoder_hidden, attn_bias=encoder_bias)
            hidden = self.cross_attn_layer_norm(params["cross_attn_layer_norm"], hidden + h)
        h = self.feed_forward(params["feed_forward"], hidden)
        return self.feed_forward_layer_norm(params["feed_forward_layer_norm"], hidden + h)


class ProphetNetEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.position_embeddings = ProphetNetPositionalEmbeddings(config, **kw)
        self.embeddings_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.layers = [ProphetNetEncoderLayer(config, **kw)
                       for _ in range(config.num_encoder_layers)]

    def __call__(self, params, inputs_embeds, attention_mask=None):
        b, s, _ = inputs_embeds.shape
        pos_ids = self.position_embeddings.position_ids((b, s), attention_mask)
        h = inputs_embeds + self.position_embeddings(params["position_embeddings"], pos_ids)
        h = self.embeddings_layer_norm(params["embeddings_layer_norm"], h)
        bias = None
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, bias)
        return h


class ProphetNetDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.ngram = config.ngram
        self.max_target_positions = config.max_position_embeddings
        self.position_embeddings = ProphetNetPositionalEmbeddings(config, **kw)
        self.ngram_embeddings = Embedding(config.ngram, config.hidden_size,
                                          embedding_init=normal_init(config.init_std), **kw)
        self.layers = [ProphetNetDecoderLayer(config, **kw)
                       for _ in range(config.num_decoder_layers)]
        self.embeddings_layer_norm = LayerNorm(config.hidden_size, 1e-5, **kw)

    def _buffered_buckets(self, b, s):
        """reference compute_buffered_relative_buckets :1280 — full length
        then slice, preserving its second-half indexing."""
        cfg = self.config
        pos = jnp.arange(1, self.max_target_positions)[None, :]
        main, predict = compute_all_stream_relative_buckets(
            cfg.num_buckets, cfg.relative_max_distance, pos)
        main = jnp.broadcast_to(main[:, :s, :s], (b, s, s))
        predict = jnp.concatenate(
            [predict[:, :s, :s],
             predict[:, :s, self.max_target_positions : self.max_target_positions + s]],
            axis=2)
        return main, jnp.broadcast_to(predict, (b, s, 2 * s))

    def __call__(self, params, inputs_embeds, encoder_hidden=None,
                 attention_mask=None, encoder_attention_mask=None):
        cfg = self.config
        b, s, h_dim = inputs_embeds.shape
        pos_ids = self.position_embeddings.position_ids((b, s), attention_mask)
        main_pos = self.position_embeddings(params["position_embeddings"], pos_ids)
        predict_pos = self.position_embeddings(params["position_embeddings"], pos_ids + 1)
        main_buckets, predict_buckets = self._buffered_buckets(b, s)

        h = inputs_embeds + main_pos
        ngram_w = params["ngram_embeddings"]["weight"].astype(self.dtype)
        # stream g uses ngram_embeddings[g - 1] (reference :1176; stream 0 of
        # the predict list is ngram_embeddings[-1] per the reference loop)
        streams = [ngram_w[g - 1][None, None, :] + predict_pos
                   for g in range(self.ngram)]

        # main causal mask [B, H, S, S]
        causal = jnp.where(jnp.triu(jnp.ones((s, s), bool), 1), NEG_INF, 0.0)
        main_mask = causal[None, None]
        if attention_mask is not None:
            pad = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * NEG_INF
            main_mask = main_mask + pad
        main_mask = jnp.broadcast_to(
            main_mask, (b, cfg.num_decoder_attention_heads, s, s))

        # predict mask [B, H, n, S, 2S] (reference prepare_predict_attention_mask)
        pred_causal = ngram_attention_bias(self.max_target_positions, self.ngram)
        pred_causal = jnp.concatenate(
            [pred_causal[:, :s, :s],
             pred_causal[:, :s, self.max_target_positions : self.max_target_positions + s]],
            axis=-1)
        predict_mask = jnp.broadcast_to(
            pred_causal[None, None],
            (b, cfg.num_decoder_attention_heads, self.ngram, s, 2 * s))
        if attention_mask is not None:
            pad = (1.0 - attention_mask[:, None, None, None, :].astype(jnp.float32)) * NEG_INF
            pad = jnp.broadcast_to(
                pad, (b, cfg.num_decoder_attention_heads, self.ngram, s, s))
            pad = jnp.concatenate([pad, jnp.zeros_like(pad)], axis=-1)
            predict_mask = predict_mask + pad

        enc_bias = None
        if encoder_attention_mask is not None:
            enc_bias = (1.0 - encoder_attention_mask[:, None, None, :]
                        .astype(jnp.float32)) * NEG_INF

        h = jnp.concatenate([h] + streams, axis=1)
        h = self.embeddings_layer_norm(params["embeddings_layer_norm"], h)
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, main_mask, predict_mask,
                      pos_ids, main_buckets, predict_buckets,
                      encoder_hidden, enc_bias)
        return h[:, :s], h[:, s:]


class ProphetNetPreTrainedModel(PreTrainedModel):
    config_class = ProphetNetConfig
    base_model_prefix = "prophetnet"
    _keys_to_ignore_on_load_unexpected = (
        r"encoder\.word_embeddings\.weight$", r"decoder\.word_embeddings\.weight$",
        r"^lm_head\.weight$")


class ProphetNetModelCore(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size,
                                         embedding_init=normal_init(config.init_std), **kw)
        self.encoder = ProphetNetEncoder(config, **kw)
        self.decoder = ProphetNetDecoder(config, **kw)


class ProphetNetModel(ProphetNetPreTrainedModel):
    def __init__(self, config: ProphetNetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.prophetnet = ProphetNetModelCore(config, dtype=self.dtype,
                                              param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "prophetnet.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, **kwargs):
        core = params["prophetnet"]
        net = self.prophetnet
        if encoder_outputs is None:
            embeds = net.word_embeddings(core["word_embeddings"], input_ids)
            encoder_outputs = net.encoder(core["encoder"], embeds, attention_mask)
        dec_embeds = net.word_embeddings(core["word_embeddings"], decoder_input_ids)
        main, ngram = net.decoder(core["decoder"], dec_embeds, encoder_outputs,
                                  decoder_attention_mask, attention_mask)
        return ProphetNetSeq2SeqModelOutput(
            last_hidden_state=main, last_hidden_state_ngram=ngram,
            encoder_last_hidden_state=encoder_outputs)


class ProphetNetForConditionalGeneration(ProphetNetPreTrainedModel):
    def __init__(self, config: ProphetNetConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.prophetnet = ProphetNetModelCore(config, dtype=self.dtype,
                                              param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "prophetnet.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 labels=None, **kwargs):
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]],
                axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.pad_token_id, decoder_input_ids)
        core = params["prophetnet"]
        net = self.prophetnet
        embeds = net.word_embeddings(core["word_embeddings"], input_ids)
        encoder_hidden = net.encoder(core["encoder"], embeds, attention_mask)
        dec_embeds = net.word_embeddings(core["word_embeddings"], decoder_input_ids)
        _, ngram_hidden = net.decoder(core["decoder"], dec_embeds, encoder_hidden,
                                      decoder_attention_mask, attention_mask)
        b, s = decoder_input_ids.shape
        streams = ngram_hidden.reshape(b, self.config.ngram, s, -1)
        predict_logits = net.word_embeddings.attend(core["word_embeddings"], streams)
        logits = predict_logits[:, 0]
        logits_ngram = predict_logits[:, 1:] if self.config.ngram > 1 else None
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return ProphetNetSeq2SeqLMOutput(loss=loss, logits=logits,
                                         logits_ngram=logits_ngram,
                                         encoder_last_hidden_state=encoder_hidden)

    def generate(self, params=None, input_ids=None, attention_mask=None,
                 max_new_tokens=20, do_sample=False, **kwargs):
        """Greedy decode by full re-forward per step (jitted per length)."""
        params = params if params is not None else self.params
        if do_sample:
            raise NotImplementedError("ProphetNet generate: greedy only")
        b = input_ids.shape[0]
        start = self.config.decoder_start_token_id
        eos = self.config.eos_token_id
        dec = np.full((b, 1), start, np.int32)
        finished = np.zeros((b,), bool)
        fwd = jax.jit(lambda p, i, am, d: self(p, input_ids=i, attention_mask=am,
                                               decoder_input_ids=d).logits)
        for _ in range(max_new_tokens):
            logits = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask)
                         if attention_mask is not None else None, jnp.asarray(dec))
            nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1)).astype(np.int32)
            nxt = np.where(finished, self.config.pad_token_id, nxt)
            dec = np.concatenate([dec, nxt[:, None]], axis=1)
            finished |= nxt == eos
            if finished.all():
                break
        return jnp.asarray(dec)
