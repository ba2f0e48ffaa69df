"""TrOCR decoder (reference src/transformers/models/trocr/modeling_trocr.py).

Post-LN BART-style decoder with learned offset-2 positions (:37-63),
scaled word embeddings, optional layernorm_embedding, cross-attention to a
vision encoder (kdim = ``cross_attention_hidden_size`` or d_model), tied
``output_projection``. Checkpoint layout ``model.decoder.{embed_tokens,
embed_positions,layernorm_embedding,layers.N}`` + ``output_projection``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bart.modeling_bart import BartLearnedPositionalEmbedding
from .configuration_trocr import TrOCRConfig


class TrOCRAttention(Module):
    def __init__(self, config, kdim=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        d = config.d_model
        kdim = kdim or d
        self.num_heads = config.decoder_attention_heads
        self.head_dim = d // self.num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(config.init_std))
        self.q_proj = Linear(d, d, True, **kw)
        self.k_proj = Linear(kdim, d, True, **kw)
        self.v_proj = Linear(kdim, d, True, **kw)
        self.out_proj = Linear(d, d, True, **kw)

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


class TrOCRDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.self_attn = TrOCRAttention(config, **kw)
        self.self_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.encoder_attn = TrOCRAttention(config, kdim=config.cross_attention_hidden_size, **kw)
        self.encoder_attn_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.fc1 = Linear(d, config.decoder_ffn_dim, True, **kw)
        self.fc2 = Linear(config.decoder_ffn_dim, d, True, **kw)
        self.final_layer_norm = LayerNorm(d, 1e-5, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, hidden, attn_args, cross_args, cross_kv, cache, layer_idx, cache_position):
        h, cache = self.self_attn(params["self_attn"], hidden, attn_args,
                                  cache=cache, layer_idx=layer_idx, cache_position=cache_position)
        hidden = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden + h)
        if cross_kv is not None:
            h, _ = self.encoder_attn(params["encoder_attn"], hidden, cross_args,
                                     kv_precomputed=cross_kv)
            hidden = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden + h)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], hidden)))
        return self.final_layer_norm(params["final_layer_norm"], hidden + h), cache


class TrOCRDecoder(Module):
    def __init__(self, config: TrOCRConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.d_model
        self.embed_tokens = Embedding(config.vocab_size, d,
                                      embedding_init=normal_init(config.init_std), **kw)
        self.embed_positions = BartLearnedPositionalEmbedding(config.max_position_embeddings, d, **kw)
        if config.layernorm_embedding:
            self.layernorm_embedding = LayerNorm(d, 1e-5, **kw)
        self.layers = [TrOCRDecoderLayer(config, **kw) for _ in range(config.decoder_layers)]
        self.embed_scale = math.sqrt(d) if config.scale_embedding else 1.0

    def __call__(self, params, input_ids, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        embeds = self.embed_tokens(params["embed_tokens"], input_ids) * self.embed_scale
        b, s, _ = embeds.shape
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        h = embeds + self.embed_positions(params["embed_positions"], positions[None, :])
        if self.config.layernorm_embedding:
            h = self.layernorm_embedding(params["layernorm_embedding"], h)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            kv = cross_kv[i] if cross_kv is not None else None
            h, cache = layer(params["layers"][str(i)], h, attn_args, cross_args, kv,
                             cache, i, cache_position)
        return h, cache


class TrOCRPreTrainedModel(PreTrainedModel):
    config_class = TrOCRConfig
    base_model_prefix = "model"


class TrOCRForCausalLM(TrOCRPreTrainedModel):
    """Decoder LM wrapper: ``model.decoder`` + tied ``output_projection``."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = _TrOCRWrapper(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.output_projection = Linear(config.d_model, config.vocab_size, False,
                                            dtype=self.dtype, param_dtype=self.param_dtype,
                                            kernel_init=normal_init(config.init_std))

    @property
    def decoder(self):
        return self.model.decoder

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            return self.model.decoder.embed_tokens.attend(
                params["model"]["decoder"]["embed_tokens"], hidden)
        return self.output_projection(params["output_projection"], hidden)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)


class _TrOCRWrapper(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.decoder = TrOCRDecoder(config, dtype=dtype, param_dtype=param_dtype)
