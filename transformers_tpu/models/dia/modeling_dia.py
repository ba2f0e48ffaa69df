"""Dia (reference models/dia/modeling_dia.py): dialogue TTS — a byte-level
text encoder and a multi-channel audio decoder. All attention is UNSCALED
(scaling=1, :276/:365), MLPs are fused gate_up, norms are RMS, and the
decoder embeds a frame as the SUM of its per-channel codebook embeddings
from one offset table (:72). The head projects to num_channels*vocab and
reports logits flattened to (B*C, T, V) (:835)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import StaticKVCache, init_static_cache
from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...modeling_outputs import ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import apply_rotary_pos_emb, compute_cos_sin, rope_inv_freq
from .configuration_dia import DiaConfig, DiaDecoderConfig, DiaEncoderConfig

NEG = float(np.finfo(np.float32).min)


@dataclass
class DiaSeq2SeqOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    past_key_values: Any = None
    encoder_last_hidden_state: Any = None


class DiaMLP(Module):
    """reference :102 — fused gate_up projection."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.gate_up_proj = Linear(config.hidden_size,
                                   2 * config.intermediate_size, False, **kw)
        self.down_proj = Linear(config.intermediate_size, config.hidden_size,
                                False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        gate, up = jnp.split(self.gate_up_proj(params["gate_up_proj"], x), 2, -1)
        return self.down_proj(params["down_proj"], up * self.act(gate))


def _attn(q, k, v, bias, n_rep):
    """Unscaled GQA attention; q/k/v [B, S, H (or KVH), D]."""
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class DiaSelfAttention(Module):
    """reference :269 — GQA with rope, scaling fixed to 1."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.num_kv = config.num_key_value_heads
        self.head_dim = config.head_dim
        self.q_proj = Linear(d, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(d, self.num_kv * self.head_dim, False, **kw)
        self.v_proj = Linear(d, self.num_kv * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, d, False, **kw)

    def __call__(self, params, hidden, cos, sin, bias, cache=None,
                 layer_idx=0, cache_position=0):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_kv, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_kv, self.head_dim)
        q, k = apply_rotary_pos_emb(q, k, cos, sin)
        if cache is not None:
            cache = cache.update(layer_idx, k, v, cache_position)
            k, v = cache.layer(layer_idx)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        out = _attn(q, k, v, bias, self.num_heads // self.num_kv)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1)), cache


class DiaCrossAttention(Module):
    """reference :331 — no rope, encoder-width K/V, scaling 1."""

    def __init__(self, config: DiaDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        d = config.hidden_size
        self.num_heads = config.cross_num_attention_heads
        self.num_kv = config.cross_num_key_value_heads
        self.head_dim = config.cross_head_dim
        self.q_proj = Linear(d, self.num_heads * self.head_dim, False, **kw)
        self.k_proj = Linear(config.cross_hidden_size,
                             self.num_kv * self.head_dim, False, **kw)
        self.v_proj = Linear(config.cross_hidden_size,
                             self.num_kv * self.head_dim, False, **kw)
        self.o_proj = Linear(self.num_heads * self.head_dim, d, False, **kw)

    def kv(self, params, encoder_hidden):
        b, n, _ = encoder_hidden.shape
        k = self.k_proj(params["k_proj"], encoder_hidden).reshape(
            b, n, self.num_kv, self.head_dim)
        v = self.v_proj(params["v_proj"], encoder_hidden).reshape(
            b, n, self.num_kv, self.head_dim)
        return k, v

    def __call__(self, params, hidden, k, v, bias):
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(
            b, s, self.num_heads, self.head_dim)
        out = _attn(q, k, v, bias, self.num_heads // self.num_kv)
        return self.o_proj(params["o_proj"], out.reshape(b, s, -1))


class DiaEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.pre_sa_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.self_attention = DiaSelfAttention(config, **kw)
        self.post_sa_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.mlp = DiaMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, bias):
        h, _ = self.self_attention(
            params["self_attention"],
            self.pre_sa_norm(params["pre_sa_norm"], hidden), cos, sin, bias)
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.post_sa_norm(params["post_sa_norm"], hidden))
        return hidden + h


class DiaEncoder(Module):
    def __init__(self, config: DiaEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embedding = Embedding(config.vocab_size, config.hidden_size,
                                   embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [DiaEncoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids, attention_mask=None):
        hidden = self.embedding(params["embedding"], input_ids)
        b, s, _ = hidden.shape
        pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = compute_cos_sin(pos, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)
        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :].astype(bool),
                             0.0, NEG)
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, cos, sin, bias)
        return self.norm(params["norm"], hidden)


class DiaMultiChannelEmbedding(Module):
    """reference :72."""

    def __init__(self, config: DiaDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embed = Embedding(config.vocab_size * config.num_channels,
                               config.hidden_size,
                               embedding_init=normal_init(config.initializer_range),
                               dtype=dtype, param_dtype=param_dtype)
        self.offsets = jnp.arange(config.num_channels) * config.vocab_size

    def __call__(self, params, audio_codes):  # [B, T, C]
        embeds = self.embed(params["embed"], audio_codes + self.offsets)
        return embeds.sum(axis=2)


class DiaDecoderLayer(Module):
    def __init__(self, config: DiaDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attention = DiaSelfAttention(config, **kw)
        self.cross_attention = DiaCrossAttention(config, **kw)
        self.pre_sa_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.pre_ca_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.pre_mlp_norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.mlp = DiaMLP(config, **kw)

    def __call__(self, params, hidden, cos, sin, self_bias, cross_kv,
                 cross_bias, cache, layer_idx, cache_position):
        h, cache = self.self_attention(
            params["self_attention"],
            self.pre_sa_norm(params["pre_sa_norm"], hidden), cos, sin,
            self_bias, cache, layer_idx, cache_position)
        hidden = hidden + h
        h = self.cross_attention(
            params["cross_attention"],
            self.pre_ca_norm(params["pre_ca_norm"], hidden),
            cross_kv[0], cross_kv[1], cross_bias)
        hidden = hidden + h
        h = self.mlp(params["mlp"], self.pre_mlp_norm(params["pre_mlp_norm"], hidden))
        return hidden + h, cache


class DiaDecoder(Module):
    def __init__(self, config: DiaDecoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = DiaMultiChannelEmbedding(config, **kw)
        self.layers = [DiaDecoderLayer(config, **kw)
                       for _ in range(config.num_hidden_layers)]
        self.norm = RMSNorm(config.hidden_size, config.norm_eps, **kw)
        self.inv_freq, self.attention_scaling = rope_inv_freq(config)

    def __call__(self, params, input_ids, encoder_hidden,
                 encoder_attention_mask=None, attention_mask=None,
                 past_key_values: Optional[StaticKVCache] = None,
                 cache_position=0):
        hidden = self.embeddings(params["embeddings"], input_ids)
        b, s, _ = hidden.shape
        pos = jnp.arange(s, dtype=jnp.int32)[None] + jnp.asarray(cache_position, jnp.int32)
        pos = jnp.broadcast_to(pos, (b, s))
        cos, sin = compute_cos_sin(pos, self.inv_freq, self.attention_scaling,
                                   dtype=self.dtype)
        kv_len = past_key_values.max_len if past_key_values is not None else s
        kv_valid = attention_mask if attention_mask is not None \
            else jnp.ones((b, kv_len), jnp.int32)
        kv_pos = jnp.arange(kv_len)[None, None, None, :]
        self_bias = jnp.where(
            (kv_pos <= pos[:, None, :, None]) & kv_valid[:, None, None, :].astype(bool),
            0.0, NEG)
        cross_bias = None
        if encoder_attention_mask is not None:
            cross_bias = jnp.where(
                encoder_attention_mask[:, None, None, :].astype(bool), 0.0, NEG)
        cache = past_key_values
        for i, layer in enumerate(self.layers):
            kv = layer.cross_attention.kv(
                params["layers"][str(i)]["cross_attention"], encoder_hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, cos, sin,
                                  self_bias, kv, cross_bias, cache, i,
                                  cache_position)
        return self.norm(params["norm"], hidden), cache


class DiaModel(Module):
    def __init__(self, config: DiaConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = DiaEncoder(config.encoder_config, **kw)
        self.decoder = DiaDecoder(config.decoder_config, **kw)


class DiaPreTrainedModel(PreTrainedModel):
    config_class = DiaConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r".*rotary_emb\..*",)


class DiaForConditionalGeneration(DiaPreTrainedModel):
    """reference :760."""

    main_input_name = "input_ids"

    def __init__(self, config: DiaConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = DiaModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        dc = config.decoder_config
        self.num_channels = dc.num_channels
        self.vocab_size = dc.vocab_size
        self.logits_dense = Linear(dc.hidden_size,
                                   dc.num_channels * dc.vocab_size, False,
                                   dtype=self.dtype, param_dtype=self.param_dtype,
                                   kernel_init=normal_init(0.02))

    def init_cache(self, batch_size, max_len, dtype=None):
        dc = self.config.decoder_config
        return init_static_cache(
            num_layers=dc.num_hidden_layers, batch_size=batch_size,
            max_len=max_len, num_kv_heads=dc.num_key_value_heads,
            head_dim=dc.head_dim, dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> DiaSeq2SeqOutput:
        if encoder_outputs is None:
            encoder_outputs = self.model.encoder(
                params["model"]["encoder"], jnp.asarray(input_ids),
                attention_mask)
        b = encoder_outputs.shape[0]
        c = self.num_channels
        if decoder_input_ids is None:
            decoder_input_ids = jnp.full(
                (b, 1, c), self.config.decoder_config.bos_token_id, jnp.int32)
        decoder_input_ids = jnp.asarray(decoder_input_ids)
        if decoder_input_ids.ndim == 2:  # (B*C, T) -> (B, T, C)
            decoder_input_ids = decoder_input_ids.reshape(b, c, -1).transpose(0, 2, 1)
        hidden, cache = self.model.decoder(
            params["model"]["decoder"], decoder_input_ids, encoder_outputs,
            attention_mask, decoder_attention_mask, past_key_values,
            cache_position)
        logits = self.logits_dense(params["logits_dense"], hidden)
        t = logits.shape[1]
        logits = logits.reshape(b, t, c, self.vocab_size)
        logits = logits.transpose(0, 2, 1, 3).reshape(b * c, t, self.vocab_size)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.vocab_size)
        return DiaSeq2SeqOutput(loss=loss, logits=logits,
                                past_key_values=cache,
                                encoder_last_hidden_state=encoder_outputs)

    def generate_codes(self, params, input_ids, attention_mask=None,
                       max_new_frames=32):
        """Greedy frame-by-frame decode (reference DiaGenerationMixin greedy
        path, channel-delay handling left to the processor)."""
        cfg = self.config.decoder_config
        enc = self.model.encoder(params["model"]["encoder"],
                                 jnp.asarray(input_ids), attention_mask)
        b = enc.shape[0]
        cache = self.init_cache(b, max_new_frames + 1)
        frame = jnp.full((b, 1, self.num_channels), cfg.bos_token_id, jnp.int32)
        out_frames = []
        for t in range(max_new_frames):
            step = self(params, encoder_outputs=enc,
                        attention_mask=attention_mask,
                        decoder_input_ids=frame, past_key_values=cache,
                        cache_position=t)
            cache = step.past_key_values
            logits = step.logits[:, -1].reshape(b, self.num_channels, -1)
            frame = jnp.argmax(logits, -1).astype(jnp.int32)[:, None, :]
            out_frames.append(np.asarray(frame[:, 0]))
            if int(np.asarray(frame[0, 0, 0])) == cfg.eos_token_id:
                break
        return np.stack(out_frames, axis=1)
