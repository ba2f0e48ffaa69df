"""BLIP text tower, TPU-native.

Semantics match reference src/transformers/models/blip/modeling_blip_text.py
(a BERT-style post-LN stack from the BLIP "med" design): word+position
embeddings with LayerNorm (:46-90); per-layer self-attention and — in decoder
mode — cross-attention whose key/value projections read the vision width
(``encoder_hidden_size``, :93-118); the LM head reuses the BERT
``cls.predictions`` shape with logits tied to the word embeddings (:406-431);
the LM loss is next-token shifted with optional label smoothing (:676-683).

Decode-time design: the cross-attention K/V over the (fixed) encoder sequence
are projected once per layer (``precompute_cross_kv``) and threaded as
constants through a jitted ``lax.while_loop``; the self-attention uses a
preallocated StaticKVCache — the reference's EncoderDecoderCache
(cache_utils.py:1940) collapses to (static self cache, cross K/V tuple).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, CausalLMOutput
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import BertLMPredictionHead, BertPooler
from .configuration_blip import BlipTextConfig


class BlipTextEmbeddings(Module):
    """Word + absolute position embeddings, LayerNorm (no token types)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, cache_position=0):
        h = self.word_embeddings(params["word_embeddings"], input_ids)
        positions = jnp.arange(input_ids.shape[1], dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        h = h + self.position_embeddings(params["position_embeddings"], positions)[None]
        return self.LayerNorm(params["LayerNorm"], h)


class BlipTextSelfAttention(Module):
    """query/key/value; the cross variant's K/V read ``encoder_hidden_size``."""

    def __init__(self, config, is_cross_attention, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kv_in = config.encoder_hidden_size if is_cross_attention else config.hidden_size
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(kv_in, config.hidden_size, True, **kw)
        self.value = Linear(kv_in, config.hidden_size, True, **kw)

    def kv(self, params, states):
        b, s, _ = states.shape
        k = self.key(params["key"], states).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], states).reshape(b, s, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, attn_args, kv_hidden=None, kv_precomputed=None,
                 cache: Optional[StaticKVCache] = None, layer_idx: int = 0, cache_position=0):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, kv_hidden if kv_hidden is not None else hidden)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return out.reshape(b, s, e), cache


class BlipTextSelfOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.dense = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], hidden) + residual)


class BlipTextAttention(Module):
    def __init__(self, config, is_cross_attention=False, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = BlipTextSelfAttention(config, is_cross_attention, dtype=dtype, param_dtype=param_dtype)
        self.output = BlipTextSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args, **kw):
        out, cache = self.self(params["self"], hidden, attn_args, **kw)
        return self.output(params["output"], out, hidden), cache


class BlipTextIntermediate(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ...ops.activations import get_activation

        self.dense = Linear(config.hidden_size, config.intermediate_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.act(self.dense(params["dense"], x))


class BlipTextOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(config.intermediate_size, config.hidden_size, True, dtype=dtype,
                            param_dtype=param_dtype, kernel_init=normal_init(config.initializer_range))
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], hidden) + residual)


class BlipTextLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = BlipTextAttention(config, **kw)
        if config.is_decoder:
            self.crossattention = BlipTextAttention(config, is_cross_attention=True, **kw)
        self.intermediate = BlipTextIntermediate(config, **kw)
        self.output = BlipTextOutput(config, **kw)

    def __call__(self, params, hidden, attn_args, cross_kv=None, cross_args=None,
                 cache=None, layer_idx=0, cache_position=0):
        h, cache = self.attention(params["attention"], hidden, attn_args,
                                  cache=cache, layer_idx=layer_idx, cache_position=cache_position)
        if cross_kv is not None:
            h, _ = self.crossattention(params["crossattention"], h, cross_args,
                                       kv_precomputed=cross_kv)
        inter = self.intermediate(params["intermediate"], h)
        return self.output(params["output"], inter, h), cache


class BlipTextEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [BlipTextLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, attn_args, cross_kv=None, cross_args=None,
                 cache=None, cache_position=0):
        for i, layer in enumerate(self.layer):
            hidden, cache = layer(params["layer"][str(i)], hidden, attn_args,
                                  None if cross_kv is None else cross_kv[i], cross_args,
                                  cache, i, cache_position)
        return hidden, cache


class BlipTextModel(Module):
    """Encoder (bidirectional) or decoder (causal + cross-attention) stack."""

    def __init__(self, config: BlipTextConfig, add_pooling_layer=True, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BlipTextEmbeddings(config, **kw)
        self.encoder = BlipTextEncoder(config, **kw)
        if add_pooling_layer:
            self.pooler = BertPooler(config, **kw)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.encoder.layer):
            out.append(layer.crossattention.self.kv(
                params["encoder"]["layer"][str(i)]["crossattention"]["self"], encoder_hidden))
        return tuple(out)

    def __call__(self, params, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, is_decoder=False, cross_kv=None,
                 cache: Optional[StaticKVCache] = None, cache_position=0):
        b, s = input_ids.shape
        h = self.embeddings(params["embeddings"], input_ids, cache_position)
        if cross_kv is None and encoder_hidden_states is not None:
            cross_kv = self.precompute_cross_kv(params, encoder_hidden_states.astype(self.dtype))
        if is_decoder:
            kv_len = cache.max_len if cache is not None else s
            positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
            kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
            attn_args = {"q_positions": jnp.broadcast_to(positions[None], (b, s)),
                         "kv_valid": kv_valid, "is_causal": True}
        else:
            attn_args = {"is_causal": False}
            if attention_mask is not None:
                attn_args["kv_valid"] = attention_mask
        cross_args = None
        if cross_kv is not None:
            cross_args = {"is_causal": False}
            if encoder_attention_mask is not None:
                cross_args["kv_valid"] = encoder_attention_mask
        h, cache = self.encoder(params["encoder"], h, attn_args, cross_kv, cross_args,
                                cache, cache_position)
        pooled = None
        if "pooler" in self._children:
            pooled = self.pooler(params["pooler"], h)
        return BaseModelOutputWithPooling(last_hidden_state=h, pooler_output=pooled,
                                          past_key_values=cache)


class BlipTextLMHeadModel(Module):
    """bert + cls.predictions head; next-token-shifted LM loss (reference :676)."""

    def __init__(self, config: BlipTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.bert = BlipTextModel(config, add_pooling_layer=False, **kw)
        cls = Module(**kw)
        cls.predictions = BertLMPredictionHead(config, **kw)
        self.cls = cls

    def compute_logits(self, params, hidden):
        table = params["bert"]["embeddings"]["word_embeddings"]["weight"]
        return self.cls.predictions(params["cls"]["predictions"], hidden, table)

    def init_cache(self, batch_size, max_len, dtype=None):
        c = self.config
        return init_static_cache(
            num_layers=c.num_hidden_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.num_attention_heads,
            head_dim=c.hidden_size // c.num_attention_heads, dtype=dtype or self.dtype)

    def __call__(self, params, input_ids, attention_mask=None, encoder_hidden_states=None,
                 encoder_attention_mask=None, labels=None, is_decoder=True,
                 cache=None, cache_position=0, reduction="mean", **kwargs) -> CausalLMOutput:
        out = self.bert(params["bert"], input_ids, attention_mask,
                        encoder_hidden_states, encoder_attention_mask,
                        is_decoder=is_decoder, cache=cache, cache_position=cache_position)
        logits = self.compute_logits(params, out.last_hidden_state)
        loss = None
        if labels is not None:
            loss = _shifted_lm_loss(logits, labels, self.config.label_smoothing, reduction)
        return CausalLMOutput(loss=loss, logits=logits, past_key_values=out.past_key_values)


def _shifted_lm_loss(logits, labels, label_smoothing=0.0, reduction="mean"):
    """Next-token CE: logits[:, :-1] vs labels[:, 1:], -100 ignored; matches
    torch CrossEntropyLoss(label_smoothing=...) (reference :676-683).
    ``reduction='none'`` returns the per-sequence SUM (reference :683)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll.sum(axis=-1)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def build_cross_decode_loop(model: BlipTextLMHeadModel, *, prompt_len, max_new,
                            eos_id, pad_id, do_sample, temperature):
    """Jitted prompt-prefill + while_loop greedy/sample decode against fixed
    cross-attention states (the reference's GenerationMixin loop over
    BlipTextLMHeadModel, specialized to the encoder-states-as-constants case)."""
    total_len = prompt_len + max_new

    def step_sample(logits, key):
        logits = logits.astype(jnp.float32)
        if do_sample:
            return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def fn(params, prompt_ids, prompt_mask, encoder_hidden, encoder_mask, key):
        b = prompt_ids.shape[0]
        cross_kv = model.bert.precompute_cross_kv(params["bert"], encoder_hidden.astype(model.dtype))
        cache = model.init_cache(b, total_len)
        ids = jnp.full((b, total_len), pad_id, jnp.int32)
        ids = jax.lax.dynamic_update_slice(ids, prompt_ids, (0, 0))
        mask = jnp.zeros((b, total_len), jnp.int32).at[:, :prompt_len].set(prompt_mask)

        out = model.bert(params["bert"], prompt_ids, mask, encoder_attention_mask=encoder_mask,
                         is_decoder=True, cross_kv=cross_kv, cache=cache, cache_position=0)
        cache = out.past_key_values
        key, k0 = jax.random.split(key)
        logits = model.compute_logits(params, out.last_hidden_state[:, -1:])[:, 0]
        next_tok = step_sample(logits, k0)
        finished = next_tok == eos_id

        def cond(carry):
            ids, mask, cache, g, key, tok, fin = carry
            return (g < max_new) & ~jnp.all(fin)

        def body(carry):
            ids, mask, cache, g, key, tok, fin = carry
            slot = prompt_len + g - 1
            ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, slot))
            mask = jax.lax.dynamic_update_slice(mask, jnp.ones((tok.shape[0], 1), jnp.int32), (0, slot))
            out = model.bert(params["bert"], tok[:, None], mask,
                             encoder_attention_mask=encoder_mask, is_decoder=True,
                             cross_kv=cross_kv, cache=cache, cache_position=slot)
            key, k = jax.random.split(key)
            logits = model.compute_logits(params, out.last_hidden_state[:, -1:])[:, 0]
            sampled = step_sample(logits, k)
            new_tok = jnp.where(fin, jnp.asarray(pad_id, jnp.int32), sampled)
            fin = fin | (sampled == eos_id)
            return (ids, mask, out.past_key_values, g + 1, key, new_tok, fin)

        carry = (ids, mask, cache, jnp.asarray(1, jnp.int32), key, next_tok, finished)
        ids, mask, cache, g, key, tok, fin = jax.lax.while_loop(cond, body, carry)
        ids = jax.lax.dynamic_update_slice(ids, tok[:, None], (0, prompt_len + g - 1))
        return ids

    return jax.jit(fn)
