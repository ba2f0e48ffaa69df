"""EncoderDecoderModel, TPU-native (reference
src/transformers/models/encoder_decoder/modeling_encoder_decoder.py).

Generic text2text composition ("bert2bert", warm-starting seq2seq from
encoder-only checkpoints): any registered AutoModel encoder feeding a
BERT-family causal decoder whose layers grow a ``crossattention`` block
(reference modeling_bert.py BertLayer with ``add_cross_attention``), plus an
``enc_to_dec_proj`` when hidden sizes differ. Decoding runs through the
shared one-program seq2seq mixin (prefill + while_loop) with a static KV
cache for decoder self-attention and precomputed cross K/V.
"""

from __future__ import annotations

import importlib

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.attention import get_attention_fn
from ..bert.modeling_bert import (BertEmbeddings, BertIntermediate,
                                  BertOutput, BertSelfOutput,
                                  _BertOnlyMLMHead)
from .configuration_encoder_decoder import EncoderDecoderConfig


def _encoder_model(config, **kw):
    from ..auto.modeling_auto import MODEL_MAPPING_NAMES

    module_name, class_name = MODEL_MAPPING_NAMES[config.model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    cls = getattr(module, class_name)
    standalone = cls(config, **kw)
    children = standalone.children
    return next(iter(children.values())), cls


class _AttnCore(Module):
    """query/key/value linears with a precomputable K/V path (the
    checkpoint's ``...attention.self`` module)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def kv(self, params, hidden):
        b, s, _ = hidden.shape
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, attn_args, kv_precomputed=None,
                 cache: StaticKVCache = None, layer_idx: int = 0,
                 cache_position=0):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
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
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args)
        return out.reshape(b, s, e), cache


class _DecoderAttnBlock(Module):
    """.self + .output, the ``attention`` / ``crossattention`` unit."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = _AttnCore(config, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, attn_args, kv_precomputed=None,
                 cache=None, layer_idx=0, cache_position=0):
        out, cache = self.self(params["self"], hidden, attn_args, kv_precomputed,
                               cache, layer_idx, cache_position)
        return self.output(params["output"], out, hidden), cache


class _BertDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _DecoderAttnBlock(config, **kw)
        self.crossattention = _DecoderAttnBlock(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache,
                 layer_idx, cache_position):
        hidden, cache = self.attention(params["attention"], hidden, attn_args,
                                       None, cache, layer_idx, cache_position)
        if cross_kv is not None:
            hidden, _ = self.crossattention(params["crossattention"], hidden,
                                            cross_args, cross_kv)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden), cache


class _BertCausalDecoder(Module):
    """bert.{embeddings,encoder.layer[i]} of a BertLMHeadModel decoder."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BertEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [_BertDecoderLayer(config, **kw)
                         for _ in range(config.num_hidden_layers)]
        self.encoder = encoder

    def __call__(self, params, input_ids, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        b, s = input_ids.shape
        positions = (jnp.arange(s, dtype=jnp.int32)
                     + jnp.asarray(cache_position, jnp.int32))[None, :]
        h = self.embeddings(params["embeddings"], input_ids,
                            position_ids=positions)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions, (b, s))
        kv_valid = (attention_mask if attention_mask is not None
                    else jnp.ones((b, kv_len), jnp.int32))
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid,
                     "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.encoder.layer):
            kv = cross_kv[i] if cross_kv is not None else None
            h, cache = layer(params["encoder"]["layer"][str(i)], h, attn_args,
                             cross_args, kv, cache, i, cache_position)
        return h, cache


class _BertLMHeadDecoder(Module):
    """BertLMHeadModel layout: ``bert`` + ``cls`` (reference
    modeling_bert.py BertLMHeadModel)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.bert = _BertCausalDecoder(config, **kw)
        self.cls = _BertOnlyMLMHead(config, **kw)

    def compute_logits(self, params, hidden):
        table = params["bert"]["embeddings"]["word_embeddings"]["weight"]
        return self.cls(params["cls"], hidden, table)


class EncoderDecoderModel(PreTrainedModel, EncoderDecoderGenerationMixin):
    config_class = EncoderDecoderConfig
    base_model_prefix = ""
    main_input_name = "input_ids"
    encoder_input_name = "input_ids"
    _keys_to_ignore_on_load_unexpected = (
        r"\.position_ids$", r"cls\.predictions\.decoder\.", r"\.pooler\.")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if config.decoder.model_type not in ("bert", "roberta", "electra"):
            raise NotImplementedError(
                f"EncoderDecoder decoder {config.decoder.model_type!r} not "
                "supported yet (bert-family)")
        self.encoder, enc_cls = _encoder_model(config.encoder, **kw)
        self.decoder = _BertLMHeadDecoder(config.decoder, **kw)
        if (config.encoder.hidden_size != config.decoder.hidden_size
                and getattr(config.decoder, "cross_attention_hidden_size", None) is None):
            self.enc_to_dec_proj = Linear(config.encoder.hidden_size,
                                          config.decoder.hidden_size, True,
                                          kernel_init=normal_init(0.02), **kw)
        else:
            self.enc_to_dec_proj = None
        self._weight_rules = tuple(getattr(enc_cls, "_weight_rules", ()))
        self._keys_to_ignore_on_load_unexpected = (
            tuple(getattr(enc_cls, "_keys_to_ignore_on_load_unexpected", ()))
            + type(self)._keys_to_ignore_on_load_unexpected)

    # ---------------------------------------------- seq2seq mixin contract
    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        out = self.encoder(params["encoder"], input_ids, attention_mask)
        hidden = out.last_hidden_state
        if self.enc_to_dec_proj is not None:
            hidden = self.enc_to_dec_proj(params["enc_to_dec_proj"], hidden)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        dec = self.decoder.bert
        for i, layer in enumerate(dec.encoder.layer):
            out.append(layer.crossattention.self.kv(
                params["decoder"]["bert"]["encoder"]["layer"][str(i)]
                ["crossattention"]["self"], encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        return self.decoder.bert(params["decoder"]["bert"], input_ids, cross_kv,
                                 cache, cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        return self.decoder.compute_logits(params["decoder"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None):
        c = self.config.decoder
        return init_static_cache(
            num_layers=c.num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=c.num_attention_heads,
            head_dim=c.hidden_size // c.num_attention_heads,
            dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
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
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.decoder.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)

    def generate(self, params=None, **kwargs):
        if kwargs.get("decoder_start_token_id") is None and self.config.decoder_start_token_id is None:
            kwargs["decoder_start_token_id"] = (self.config.decoder.bos_token_id
                                                or self.config.decoder.pad_token_id)
        if self.config.pad_token_id is None and kwargs.get("pad_token_id") is None:
            kwargs["pad_token_id"] = self.config.decoder.pad_token_id
        return super().generate(params, **kwargs)
