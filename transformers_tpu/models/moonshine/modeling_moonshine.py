"""Moonshine ASR (reference models/moonshine/modeling_moonshine.py): raw-wave
conv frontend (tanh conv k127/s64 -> groupnorm -> gelu k7/s3 -> gelu k3/s2),
rotary-attention encoder/decoder (partial INTERLEAVED rope :100 — cos/sin
halved then repeat_interleave(2), applied to the first rotary_dim channels),
bias-free LayerNorms, SwiGLU decoder MLP, proj_out tied to the decoder
embedding (:836)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Conv, Embedding, GroupNorm, LayerNorm, Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from .configuration_moonshine import MoonshineConfig


def _interleaved_rope_tables(rot_dim: int, theta: float, positions: jnp.ndarray):
    """cos/sin [S, rot_dim] in Moonshine's interleaved layout:
    freqs f0..f{r/2-1} -> [c0, c0, c1, c1, ...] (reference
    apply_rotary_pos_emb's repeat_interleave of the first half)."""
    inv = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    ang = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv, jnp.float32)[None, :]
    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)
    return cos, sin


def _apply_interleaved_rope(x: jnp.ndarray, cos, sin):
    """x [B, S, H, D]; rotate the first rot_dim channels with rotate_half."""
    rot = cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    half = rot // 2
    rotated = jnp.concatenate([-x_rot[..., half:], x_rot[..., :half]], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x_rot * c + rotated * s, x_pass], axis=-1)


class MoonshineAttention(Module):
    """reference :243 — optional qkv bias, bias-free o_proj, optional head-dim
    zero-padding to a multiple (scaling uses the original head_dim)."""

    def __init__(self, config, num_heads, num_kv_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        d = config.hidden_size
        self.head_dim = d // num_heads
        self.scale = self.head_dim ** -0.5
        m = config.pad_head_dim_to_multiple_of
        self.pad = (0 if not m else
                    m * ((self.head_dim + m - 1) // m) - self.head_dim)
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

    def _maybe_pad(self, x):
        if self.pad:
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, self.pad)))
        return x

    def __call__(self, params, hidden, rope=None, kv_hidden=None,
                 kv_precomputed=None, attn_args=None,
                 cache: Optional[StaticKVCache] = None, layer_idx: int = 0,
                 cache_position=0):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        if kv_precomputed is not None:
            k, v = kv_precomputed
            if rope is not None:
                q = _apply_interleaved_rope(q, *rope)
        else:
            k, v = self.kv(params, kv_hidden if kv_hidden is not None else hidden)
            if rope is not None:
                q = _apply_interleaved_rope(q, *rope)
                k = _apply_interleaved_rope(k, *rope)
            if cache is not None:
                cache = cache.update(layer_idx, k, v, cache_position)
                k, v = cache.layer(layer_idx)
                k = k.astype(self.dtype)
                v = v.astype(self.dtype)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(self._maybe_pad(q), self._maybe_pad(k), self._maybe_pad(v),
                      scale=self.scale, **(attn_args or {"is_causal": False}))
        out = out[..., : self.head_dim]
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1)), cache


class MoonshineEncoderMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.encoder_hidden_act)

    def __call__(self, params, h):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))


class MoonshineDecoderMLP(Module):
    """SwiGLU: fc1 emits 2x intermediate, chunked into (value, gate)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(config.hidden_size, config.intermediate_size * 2, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.decoder_hidden_act)

    def __call__(self, params, h):
        h = self.fc1(params["fc1"], h)
        value, gate = jnp.split(h, 2, axis=-1)
        return self.fc2(params["fc2"], self.act(gate) * value)


class MoonshineEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.self_attn = MoonshineAttention(config, config.encoder_num_attention_heads,
                                            config.encoder_num_key_value_heads, **kw)
        self.input_layernorm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        self.post_attention_layernorm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        self.mlp = MoonshineEncoderMLP(config, **kw)

    def __call__(self, params, hidden, rope, attn_args=None):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, _ = self.self_attn(params["self_attn"], h, rope=rope,
                              attn_args=attn_args or {"is_causal": False})
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        return residual + self.mlp(params["mlp"], h)


class MoonshineEncoder(Module):
    """reference :511 — raw-wave conv frontend + rotary encoder."""

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
        self.layer_norm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        head_dim = d // config.encoder_num_attention_heads
        self.rot_dim = int(head_dim * config.partial_rotary_factor)

    def __call__(self, params, input_values) -> BaseModelOutput:
        # input_values [B, T] raw waveform
        h = input_values.astype(self.dtype)[:, None, :]
        h = jnp.tanh(self.conv1(params["conv1"], h))
        h = self.groupnorm(params["groupnorm"], h)
        h = jax.nn.gelu(self.conv2(params["conv2"], h), approximate=False)
        h = jax.nn.gelu(self.conv3(params["conv3"], h), approximate=False)
        h = h.transpose(0, 2, 1)  # [B, S, d]
        rope = _interleaved_rope_tables(self.rot_dim, self.config.rope_theta,
                                        jnp.arange(h.shape[1]))
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][str(i)], h, rope)
        h = self.layer_norm(params["layer_norm"], h)
        return BaseModelOutput(last_hidden_state=h)


class MoonshineDecoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        heads = config.decoder_num_attention_heads
        kvh = config.decoder_num_key_value_heads
        self.self_attn = MoonshineAttention(config, heads, kvh, **kw)
        self.encoder_attn = MoonshineAttention(config, heads, kvh, **kw)
        self.input_layernorm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        self.post_attention_layernorm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        self.final_layernorm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        self.mlp = MoonshineDecoderMLP(config, **kw)

    def __call__(self, params, hidden, rope, cross_kv, attn_args, cache,
                 layer_idx, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, rope=rope,
                                  attn_args=attn_args, cache=cache,
                                  layer_idx=layer_idx, cache_position=cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h, _ = self.encoder_attn(params["encoder_attn"], h, kv_precomputed=cross_kv,
                                 attn_args={"is_causal": False})
        hidden = residual + h
        residual = hidden
        h = self.final_layernorm(params["final_layernorm"], hidden)
        return residual + self.mlp(params["mlp"], h), cache


class MoonshineDecoder(Module):
    def __init__(self, config: MoonshineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_size
        self.embed_tokens = Embedding(config.vocab_size, d,
                                      embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [MoonshineDecoderLayer(config, **kw)
                       for _ in range(config.decoder_num_hidden_layers)]
        self.norm = LayerNorm(d, 1e-5, use_bias=False, **kw)
        head_dim = d // config.decoder_num_attention_heads
        self.rot_dim = int(head_dim * config.partial_rotary_factor)

    def precompute_cross_kv(self, params, encoder_hidden, encoder_mask=None):
        return tuple(
            layer.encoder_attn.kv(params["layers"][str(i)]["encoder_attn"], encoder_hidden)
            for i, layer in enumerate(self.layers))

    def __call__(self, params, input_ids, cross_kv,
                 cache: Optional[StaticKVCache] = None, cache_position=0,
                 attention_mask=None):
        b, s = input_ids.shape
        h = self.embed_tokens(params["embed_tokens"], input_ids)
        positions = jnp.arange(s, dtype=jnp.int32) + jnp.asarray(cache_position, jnp.int32)
        rope = _interleaved_rope_tables(self.rot_dim, self.config.rope_theta, positions)
        kv_len = cache.max_len if cache is not None else s
        q_positions = jnp.broadcast_to(positions[None, :], (b, s))
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, kv_len), jnp.int32)
        attn_args = {"q_positions": q_positions, "kv_valid": kv_valid, "is_causal": True}
        for i, layer in enumerate(self.layers):
            h, cache = layer(params["layers"][str(i)], h, rope, cross_kv[i],
                             attn_args, cache, i, cache_position)
        h = self.norm(params["norm"], h)
        return h, cache


class MoonshineModel(Module):
    def __init__(self, config: MoonshineConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = MoonshineEncoder(config, dtype=dtype, param_dtype=param_dtype)
        self.decoder = MoonshineDecoder(config, dtype=dtype, param_dtype=param_dtype)


class MoonshinePreTrainedModel(PreTrainedModel):
    config_class = MoonshineConfig
    base_model_prefix = "model"
    main_input_name = "input_values"


class MoonshineForConditionalGeneration(MoonshinePreTrainedModel,
                                        EncoderDecoderGenerationMixin):
    """reference :836 — proj_out tied to decoder embeddings."""

    _keys_to_ignore_on_load_unexpected = (r"proj_out\.weight",)
    encoder_input_name = "input_values"

    def __init__(self, config: MoonshineConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = MoonshineModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    def encode(self, params, input_values=None, attention_mask=None) -> BaseModelOutput:
        return self.model.encoder(params["model"]["encoder"], jnp.asarray(input_values))

    def precompute_cross_kv(self, params, encoder_hidden, encoder_mask=None):
        return self.model.decoder.precompute_cross_kv(
            params["model"]["decoder"], encoder_hidden, encoder_mask)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask=None, encoder_mask=None):
        return self.model.decoder(params["model"]["decoder"], input_ids,
                                  cross_kv, cache, cache_position, decoder_mask)

    def compute_logits(self, params, hidden):
        table = params["model"]["decoder"]["embed_tokens"]["weight"]
        return jnp.dot(hidden.astype(self.dtype), table.astype(self.dtype).T)

    def init_decoder_cache(self, batch_size: int, max_len: int, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(
            num_layers=c.decoder_num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=c.decoder_num_key_value_heads,
            head_dim=c.hidden_size // c.decoder_num_attention_heads,
            dtype=dtype or self.dtype)

    def __call__(self, params, input_values=None, attention_mask=None,
                 decoder_input_ids=None, encoder_outputs=None,
                 past_key_values=None, cache_position=0,
                 decoder_attention_mask=None, labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_values)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(
                decoder_input_ids == -100,
                self.config.pad_token_id or 0, decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.model.decoder(
            params["model"]["decoder"], decoder_input_ids, cross_kv,
            past_key_values, cache_position, decoder_attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)
