"""Moonshine Streaming (reference models/moonshine_streaming/modular_moonshine_streaming.py).

Moonshine seq2seq ASR with a STREAMING raw-wave encoder:
- embedder: frame the waveform (frame_ms), per-frame CMVN, learned asinh
  compression (exp(log_k) scale), linear frame→hidden, silu, then two
  LEFT-PADDED causal convs (stride 2 each) — 4× time reduction (:70-190)
- encoder layers: NoPE attention under per-layer ASYMMETRIC sliding windows
  (left history, right lookahead — (16,4)/(16,0) pattern) with
  zero-centered-gamma LayerNorms (normed × (1 + gamma), no bias) (:200-270)
- decoder: the Moonshine rotary decoder; encoder states get a learned
  position embedding and an optional width projection before cross-attention
  (:280-320)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput
from ..moonshine.modeling_moonshine import (
    MoonshineDecoder,
    MoonshineEncoderMLP,
    MoonshineForConditionalGeneration,
    MoonshineModel,
    MoonshinePreTrainedModel,
)
from .configuration_moonshine_streaming import MoonshineStreamingConfig


class MoonshineStreamingLayerNorm(Module):
    """LN without affine, then × (1 + gamma), gamma zero-init (reference :96)."""

    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim = dim

    def init(self, rng):
        return {"gamma": jnp.zeros((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, -1, keepdims=True)
        normed = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
        return (normed * (1.0 + params["gamma"].astype(jnp.float32))).astype(x.dtype)


class MoonshineStreamingEncoderAttention(Module):
    """NoPE GQA over the encoder width (reference :108-160)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        d = config.encoder_hidden_size
        self.num_heads = config.encoder_num_attention_heads
        self.num_kv_heads = config.encoder_num_key_value_heads
        self.head_dim = d // self.num_heads
        self.scale = self.head_dim**-0.5
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        bias = config.attention_bias
        self.q_proj = Linear(d, self.num_heads * self.head_dim, bias, **kw)
        self.k_proj = Linear(d, self.num_kv_heads * self.head_dim, bias, **kw)
        self.v_proj = Linear(d, self.num_kv_heads * self.head_dim, bias, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, d, bias, **kw)

    def __call__(self, params, hidden, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv_heads, self.head_dim)
        r = self.num_heads // self.num_kv_heads
        if r > 1:
            k = jnp.repeat(k, r, axis=2)
            v = jnp.repeat(v, r, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * self.scale
        probs = jax.nn.softmax(logits + bias, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class MoonshineStreamingEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.encoder_hidden_size
        self.self_attn = MoonshineStreamingEncoderAttention(config, **kw)
        import copy

        enc_cfg = copy.copy(config)
        enc_cfg.hidden_size = d
        self.mlp = MoonshineEncoderMLP(enc_cfg, **kw)
        self.input_layernorm = MoonshineStreamingLayerNorm(d, **kw)
        self.post_attention_layernorm = MoonshineStreamingLayerNorm(d, **kw)

    def __call__(self, params, hidden, bias):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h = self.self_attn(params["self_attn"], h, bias)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        return residual + self.mlp(params["mlp"], h)


class MoonshineStreamingEncoderEmbedder(Module):
    """CMVN → asinh compression → frame linear → two causal convs (:163)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.encoder_hidden_size
        self.frame_len = int(round(config.sample_rate * config.frame_ms / 1000.0))
        # left-padded causal convs: padding applied manually in __call__
        self.conv1 = Conv(d, 2 * d, 5, stride=2, ndim=1, **kw)
        self.conv2 = Conv(2 * d, d, 5, stride=2, ndim=1, **kw)
        self.linear = Linear(self.frame_len, d, False, dtype=dtype,
                             param_dtype=param_dtype,
                             kernel_init=normal_init(config.initializer_range))

    def init(self, rng):
        params = super().init(rng)
        params["comp"] = {"log_k": jnp.log(jnp.asarray(0.75, jnp.float32))}
        return params

    def __call__(self, params, input_values):
        b = input_values.shape[0]
        frames = input_values.reshape(b, -1, self.frame_len).astype(jnp.float32)
        mean = frames.mean(-1, keepdims=True)
        centered = frames - mean
        rms = jnp.sqrt(jnp.mean(centered**2, -1, keepdims=True) + 1e-6)
        h = centered / rms
        h = jnp.arcsinh(jnp.exp(params["comp"]["log_k"]) * h)
        h = jax.nn.silu(self.linear(params["linear"], h.astype(self.dtype)))
        h = jnp.swapaxes(h, 1, 2)  # [B, C, T]
        h = jnp.pad(h, ((0, 0), (0, 0), (4, 0)))
        h = jax.nn.silu(self.conv1(params["conv1"], h))
        h = jnp.pad(h, ((0, 0), (0, 0), (4, 0)))
        h = self.conv2(params["conv2"], h)
        return jnp.swapaxes(h, 1, 2)  # [B, S, C]


class MoonshineStreamingEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedder = MoonshineStreamingEncoderEmbedder(config, **kw)
        self.layers = [MoonshineStreamingEncoderLayer(config, **kw)
                       for _ in range(config.encoder_num_hidden_layers)]
        self.final_norm = MoonshineStreamingLayerNorm(
            config.encoder_hidden_size, **kw)

    def _window_bias(self, s, left, right):
        q = jnp.arange(s)[:, None]
        k = jnp.arange(s)[None, :]
        dist = q - k
        allowed = ((dist >= 0) & (dist < left)) | ((dist < 0) & (-dist < right))
        neg = jnp.finfo(jnp.float32).min
        return jnp.where(allowed, 0.0, neg)[None, None]

    def __call__(self, params, input_values) -> BaseModelOutput:
        h = self.embedder(params["embedder"], jnp.asarray(input_values))
        s = h.shape[1]
        for i, layer in enumerate(self.layers):
            left, right = self.config.sliding_windows[i]
            h = layer(params["layers"][str(i)], h,
                      self._window_bias(s, left, right))
        h = self.final_norm(params["final_norm"], h)
        return BaseModelOutput(last_hidden_state=h)


class MoonshineStreamingDecoder(MoonshineDecoder):
    """Moonshine decoder + encoder-state pos_emb and width proj (:280)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Embedding

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.pos_emb = Embedding(config.max_position_embeddings,
                                 config.encoder_hidden_size,
                                 embedding_init=normal_init(config.initializer_range),
                                 **kw)
        if config.encoder_hidden_size != config.hidden_size:
            self.proj = Linear(config.encoder_hidden_size, config.hidden_size,
                               False, kernel_init=normal_init(config.initializer_range),
                               **kw)
        else:
            self.proj = None

    def prepare_encoder_states(self, params, enc):
        pos = self.pos_emb(params["pos_emb"],
                           jnp.arange(enc.shape[1], dtype=jnp.int32))
        enc = enc + pos[None].astype(enc.dtype)
        if self.proj is not None:
            enc = self.proj(params["proj"], enc)
        return enc

    def precompute_cross_kv(self, params, encoder_hidden, encoder_mask=None):
        encoder_hidden = self.prepare_encoder_states(params, encoder_hidden)
        return super().precompute_cross_kv(params, encoder_hidden, encoder_mask)


class MoonshineStreamingModel(MoonshineModel):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = MoonshineStreamingEncoder(config, **kw)
        self.decoder = MoonshineStreamingDecoder(config, **kw)


class MoonshineStreamingForConditionalGeneration(MoonshineForConditionalGeneration):
    config_class = MoonshineStreamingConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        MoonshinePreTrainedModel.__init__(self, config, dtype=dtype,
                                          param_dtype=param_dtype)
        self.model = MoonshineStreamingModel(config, dtype=self.dtype,
                                             param_dtype=self.param_dtype)
