"""Moonshine ASR, TPU-native (reference src/transformers/models/moonshine/modeling_moonshine.py).

Raw-waveform encoder-decoder: a 3-conv stem (tanh / gelu, GroupNorm after
conv1) downsamples audio 384x, then pre-norm rotary transformer layers
(bias-free LayerNorms, partial rotary factor 0.9). The decoder is a rotary
pre-norm stack with cross-attention and a SwiGLU-style MLP
(reference MoonshineDecoderMLP, modeling_moonshine.py:84); lm head is tied to
the decoder embeddings.

The reference optionally zero-pads head_dim for flash kernels
(pad_head_dim_to_multiple_of); zero-padding q/k/v is numerically identity, so
we skip it and keep the true head_dim (XLA tiles it fine).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import (Conv, Embedding, GroupNorm, LayerNorm, Linear,
                            Module, normal_init)
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ...ops.rope import (_default_inv_freq,
                         apply_rotary_pos_emb_interleaved,
                         compute_cos_sin_interleaved)
from .configuration_moonshine import MoonshineConfig


class MoonshineAttention(Module):
    """BSHD attention with optional rotary + GQA (reference
    modeling_moonshine.py:243)."""

    def __init__(self, config, num_heads, num_kv_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        d = config.hidden_size
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = d // num_heads
        self.scale = self.head_dim ** -0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = config.attention_bias
        self.q_proj = Linear(d, num_heads * self.head_dim, bias, **kw)
        self.k_proj = Linear(d, num_kv_heads * self.head_dim, bias, **kw)
        self.v_proj = Linear(d, num_kv_heads * self.head_dim, bias, **kw)
        self.o_proj = Linear(num_heads * self.head_dim, d, False, **kw)

    def kv(self, params, hidden):
        b, s, _ = hidden.shape
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        return k, v

    def __call__(self, params, hidden, attn_args, cos_sin=None,
                 kv_precomputed=None, cache: Optional[StaticKVCache] = None,
                 layer_idx: int = 0, cache_position=0):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
        else:
            k, v = self.kv(params, hidden)
            if cos_sin is not None:
                q, k = apply_rotary_pos_emb_interleaved(q, k, *cos_sin)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.scale, **attn_args)
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        return self.o_proj(params["o_proj"], out), cache


class MoonshineEncoderMLP(Module):
    def __init__(self, config, hidden_act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class MoonshineDecoderMLP(Module):
    """fc1 emits [hidden ; gate]; out = fc2(act(gate) * hidden)
    (reference modeling_moonshine.py:84)."""

    def __init__(self, config, hidden_act, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size * 2, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(hidden_act)

    def __call__(self, params, x):
        h = self.fc1(params["fc1"], x)
        hidden, gate = jnp.split(h, 2, axis=-1)
        return self.fc2(params["fc2"], self.act(gate) * hidden)


class MoonshineEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = MoonshineAttention(
            config, config.encoder_num_attention_heads,
            config.encoder_num_key_value_heads, **kw)
        self.mlp = MoonshineEncoderMLP(config, config.encoder_hidden_act, **kw)
        self.input_layernorm = LayerNorm(config.hidden_size, 1e-5, False, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, 1e-5, False, **kw)

    def __call__(self, params, hidden, attn_args, cos_sin):
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h, attn_args, cos_sin=cos_sin)
        hidden = hidden + h
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        return hidden + self.mlp(params["mlp"], h)


class MoonshineDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        heads = config.decoder_num_attention_heads
        kvh = config.decoder_num_key_value_heads
        self.self_attn = MoonshineAttention(config, heads, kvh, **kw)
        self.encoder_attn = MoonshineAttention(config, heads, kvh, **kw)
        self.mlp = MoonshineDecoderMLP(config, config.decoder_hidden_act, **kw)
        self.input_layernorm = LayerNorm(config.hidden_size, 1e-5, False, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, 1e-5, False, **kw)
        self.final_layernorm = LayerNorm(config.hidden_size, 1e-5, False, **kw)

    def __call__(self, params, hidden, attn_args, cross_args, cos_sin, cross_kv,
                 cache, layer_idx, cache_position):
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, attn_args,
                                  cos_sin=cos_sin, cache=cache,
                                  layer_idx=layer_idx,
                                  cache_position=cache_position)
        hidden = hidden + h
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h, _ = self.encoder_attn(params["encoder_attn"], h, cross_args,
                                 kv_precomputed=cross_kv)
        hidden = hidden + h
        h = self.final_layernorm(params["final_layernorm"], hidden)
        return hidden + self.mlp(params["mlp"], h), cache


class MoonshineEncoder(Module):
    """Conv stem (127/64 -> 7/3 -> 3/2, VALID) + rotary pre-norm stack
    (reference modeling_moonshine.py:511)."""

    def __init__(self, config: MoonshineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.conv1 = Conv(1, d, 127, stride=64, use_bias=False, ndim=1, **kw)
        self.conv2 = Conv(d, 2 * d, 7, stride=3, ndim=1, **kw)
        self.conv3 = Conv(2 * d, d, 3, stride=2, ndim=1, **kw)
        self.groupnorm = GroupNorm(1, d, 1e-5, **kw)
        self.layers = [MoonshineEncoderLayer(config, **kw)
                       for _ in range(config.encoder_num_hidden_layers)]
        self.layer_norm = LayerNorm(d, 1e-5, False, **kw)
        head_dim = d // config.encoder_num_attention_heads
        self.inv_freq = _default_inv_freq(config, head_dim=head_dim)

    def __call__(self, params, input_values, attention_mask=None):
        x = jnp.asarray(input_values, self.dtype)[:, None, :]  # [B, 1, T]
        h = jnp.tanh(self.conv1(params["conv1"], x))
        h = self.groupnorm(params["groupnorm"], h)
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = jax.nn.gelu(self.conv3(params["conv3"], h), approximate=False)
        h = h.transpose(0, 2, 1)  # [B, S, D]
        b, s, _ = h.shape
        if attention_mask is not None:
            # reference downsampling: stride-384 subsample, crop to out len
            attention_mask = attention_mask[..., ::64 * 3 * 2][..., :s]
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        cos_sin = compute_cos_sin_interleaved(positions, self.inv_freq, dtype=self.dtype)
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, attn_args, cos_sin)
        h = self.layer_norm(params["layer_norm"], h)
        return h, attention_mask


class MoonshineDecoder(Module):
    def __init__(self, config: MoonshineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embed_tokens = Embedding(config.vocab_size, config.hidden_size,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [MoonshineDecoderLayer(config, **kw)
                       for _ in range(config.decoder_num_hidden_layers)]
        self.norm = LayerNorm(config.hidden_size, 1e-5, False, **kw)
        head_dim = config.hidden_size // config.decoder_num_attention_heads
        self.inv_freq = _default_inv_freq(config, head_dim=head_dim)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.layers):
            out.append(layer.encoder_attn.kv(
                params["layers"][str(i)]["encoder_attn"], encoder_hidden))
        return tuple(out)

    def __call__(self, params, input_ids, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        h = self.embed_tokens(params["embed_tokens"], input_ids)
        b, s, _ = h.shape
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        positions = jnp.broadcast_to(positions[None], (b, s))
        cos_sin = compute_cos_sin_interleaved(positions, self.inv_freq, dtype=self.dtype)
        kv_len = cache.max_len if cache is not None else s
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": positions, "kv_valid": kv_valid, "is_causal": True}
        cross_args = {"is_causal": False}
        if encoder_mask is not None:
            cross_args["kv_valid"] = encoder_mask
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, attn_args, cross_args,
                             cos_sin, cross_kv[i], cache, i, cache_position)
        return self.norm(params["norm"], h), cache


class MoonshineModel(Module):
    def __init__(self, config: MoonshineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = MoonshineEncoder(config, **kw)
        self.decoder = MoonshineDecoder(config, **kw)


class MoonshinePreTrainedModel(PreTrainedModel):
    config_class = MoonshineConfig
    base_model_prefix = "model"
    main_input_name = "input_values"


class MoonshineForConditionalGeneration(MoonshinePreTrainedModel,
                                        EncoderDecoderGenerationMixin):
    """Reference modeling_moonshine.py:836; proj_out tied to decoder embeds."""

    encoder_input_name = "input_values"
    _keys_to_ignore_on_load_unexpected = (r"^proj_out\.weight$",)

    def __init__(self, config: MoonshineConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = MoonshineModel(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self._enc_mask = None

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    def encode(self, params, input_values, attention_mask=None) -> BaseModelOutput:
        hidden, _ = self.model.encoder(params["model"]["encoder"], input_values,
                                       attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        return self.model.decoder.precompute_cross_kv(
            params["model"]["decoder"], encoder_hidden)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        if encoder_mask is not None:
            # mask arrives at raw-audio resolution; downsample like the stem
            s = cross_kv[0][0].shape[1]
            encoder_mask = encoder_mask[..., ::64 * 3 * 2][..., :s]
        return self.model.decoder(params["model"]["decoder"], input_ids,
                                  cross_kv, cache, cache_position,
                                  decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        table = params["model"]["decoder"]["embed_tokens"]["weight"]
        return jnp.dot(hidden.astype(self.dtype), table.astype(self.dtype).T)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(
            num_layers=c.decoder_num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=c.decoder_num_key_value_heads,
            head_dim=c.hidden_size // c.decoder_num_attention_heads,
            dtype=dtype or self.dtype)

    def __call__(self, params, input_values=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        enc_mask = None
        if encoder_outputs is None:
            hidden, enc_mask = self.model.encoder(
                params["model"]["encoder"], input_values, attention_mask)
            encoder_outputs = BaseModelOutput(last_hidden_state=hidden)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype),
                 labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(
                decoder_input_ids == -100,
                self.config.pad_token_id if self.config.pad_token_id is not None else 0,
                decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.model.decoder(
            params["model"]["decoder"], decoder_input_ids, cross_kv,
            past_key_values, cache_position, decoder_attention_mask, enc_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)
