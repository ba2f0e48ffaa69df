"""CLAP (contrastive language-audio pretraining), TPU-native.

Semantics match reference src/transformers/models/clap/modeling_clap.py:
- audio branch: HTSAT — eval-mode BatchNorm over mel bins (:253),
  ``reshape_mel2img`` 4-crop spectrogram-to-image fold (:758-783), conv
  patch embed with padding (:224-322, non-fusion path), Swin stages with
  relative-position windowed attention and shifted windows (:323-718),
  frequency-grouped average pooling (:877-895);
- text branch: RoBERTa encoder (pad-offset positions) + tanh pooler;
- two-layer relu projections on both towers (:905-922), separate learned
  audio/text logit scales (:1452-1455).

Checkpoint layout mirrors torch exactly (attention.self.query / intermediate
/ output naming on the audio Swin blocks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, ModelOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..roberta.modeling_roberta import RobertaEmbeddings
from ..bert.modeling_bert import BertEncoder, BertPooler
from ..swin.modeling_swin import relative_position_index, shift_attn_mask, window_partition, window_reverse
from .configuration_clap import ClapAudioConfig, ClapConfig, ClapTextConfig


@dataclass
class ClapOutput(ModelOutput):
    logits_per_audio: jnp.ndarray = None
    logits_per_text: jnp.ndarray = None
    text_embeds: jnp.ndarray = None
    audio_embeds: jnp.ndarray = None


class ClapProjectionLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.linear1 = Linear(config.hidden_size, config.projection_dim, True, **kw)
        self.linear2 = Linear(config.projection_dim, config.projection_dim, True, **kw)
        self.act = get_activation(config.projection_hidden_act)

    def __call__(self, params, x):
        return self.linear2(params["linear2"], self.act(self.linear1(params["linear1"], x)))


# ------------------------------------------------------------ audio branch
class ClapAudioSelfAttention(Module):
    """Swin window attention, torch classic naming (query/key/value)."""

    def __init__(self, config, dim, num_heads, ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.ws = ws
        self.index = relative_position_index(ws).reshape(-1)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.query = Linear(dim, dim, config.qkv_bias, **kw)
        self.key = Linear(dim, dim, config.qkv_bias, **kw)
        self.value = Linear(dim, dim, config.qkv_bias, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["relative_position_bias_table"] = jnp.zeros(
            ((2 * self.ws - 1) ** 2, self.num_heads), self.param_dtype)
        return params

    def __call__(self, params, windows, attn_bias):
        bw, n, c = windows.shape
        q = self.query(params["query"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        k = self.key(params["key"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        v = self.value(params["value"], windows).reshape(bw, n, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * self.scale
        table = params["relative_position_bias_table"].astype(jnp.float32)
        bias = jnp.take(table, jnp.asarray(self.index), axis=0).reshape(n, n, self.num_heads)
        scores = scores + bias.transpose(2, 0, 1)[None]
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bw, n, c)


class ClapAudioLayer(Module):
    def __init__(self, config, dim, input_resolution, num_heads, shift_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.window_size = config.window_size
        self.shift_size = shift_size
        if min(input_resolution) <= self.window_size:
            self.shift_size = 0
            self.window_size = min(input_resolution)
        self.input_resolution = input_resolution
        self.num_heads = num_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.layernorm_before = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.attention = _ClapAttnWrap(config, dim, num_heads, self.window_size, **kw)
        self.layernorm_after = LayerNorm(dim, config.layer_norm_eps, **kw)
        self.intermediate = _ClapDense(dim, int(config.mlp_ratio * dim), config.hidden_act, **lkw)
        self.output = _ClapDense(int(config.mlp_ratio * dim), dim, None, **lkw)

    def __call__(self, params, hidden):
        height, width = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        b, _, c = hidden.shape
        shortcut = hidden
        h = self.layernorm_before(params["layernorm_before"], hidden)
        h = h.reshape(b, height, width, c)
        pad_r = (ws - width % ws) % ws
        pad_b = (ws - height % ws) % ws
        if pad_r or pad_b:
            h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = height + pad_b, width + pad_r
        if shift > 0:
            h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(h, ws)
        n = ws * ws
        nw = (hp // ws) * (wp // ws)
        bias = None
        if shift > 0:
            mask = jnp.asarray(shift_attn_mask(hp, wp, ws, shift))  # [nW, N, N]
            bias = jnp.broadcast_to(mask[None, :, None], (b, nw, 1, n, n))
            bias = bias.reshape(b * nw, 1, n, n)
        attn = self.attention(params["attention"], windows, bias)
        attn = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            attn = jnp.roll(attn, shift=(shift, shift), axis=(1, 2))
        if pad_r or pad_b:
            attn = attn[:, :height, :width]
        hidden = shortcut + attn.reshape(b, height * width, c)
        h = self.layernorm_after(params["layernorm_after"], hidden)
        h = self.intermediate(params["intermediate"], h)
        h = self.output(params["output"], h)
        return hidden + h


class _ClapAttnWrap(Module):
    """matches torch's nested attention.{self, output} path."""

    def __init__(self, config, dim, num_heads, ws, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = ClapAudioSelfAttention(config, dim, num_heads, ws,
                                           dtype=dtype, param_dtype=param_dtype)
        self.output = _ClapDense(dim, dim, None, dtype=dtype, param_dtype=param_dtype,
                                 kernel_init=normal_init(0.02))

    def __call__(self, params, windows, bias):
        return self.output(params["output"], self.self(params["self"], windows, bias))


class _ClapDense(Module):
    def __init__(self, in_dim, out_dim, act, *, dtype, param_dtype, kernel_init=None):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dense = Linear(in_dim, out_dim, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=kernel_init or normal_init(0.02))
        self.act = get_activation(act) if act else None

    def __call__(self, params, x):
        x = self.dense(params["dense"], x)
        return self.act(x) if self.act else x


class ClapAudioPatchMerging(Module):
    def __init__(self, dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.reduction = Linear(4 * dim, 2 * dim, False, kernel_init=normal_init(0.02), **kw)
        self.norm = LayerNorm(4 * dim, 1e-5, **kw)

    def __call__(self, params, x, dims):
        height, width = dims
        b, _, c = x.shape
        x = x.reshape(b, height, width, c)
        if height % 2 or width % 2:
            x = jnp.pad(x, ((0, 0), (0, height % 2), (0, width % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, row::2, col::2, :] for col in range(2) for row in range(2)], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        return self.reduction(params["reduction"], self.norm(params["norm"], x))


class ClapAudioStage(Module):
    def __init__(self, config, dim, input_resolution, depth, num_heads, has_downsample,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.blocks = [
            ClapAudioLayer(config, dim, input_resolution, num_heads,
                           shift_size=0 if i % 2 == 0 else config.window_size // 2, **kw)
            for i in range(depth)
        ]
        self.input_resolution = input_resolution
        self.downsample = ClapAudioPatchMerging(dim, **kw) if has_downsample else None

    def __call__(self, params, hidden):
        for i, block in enumerate(self.blocks):
            hidden = block(params["blocks"][str(i)], hidden)
        if self.downsample is not None:
            hidden = self.downsample(params["downsample"], hidden, self.input_resolution)
        return hidden


class ClapAudioPatchEmbed(Module):
    """Non-fusion conv patch embed (:224-322)."""

    def __init__(self, config: ClapAudioConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        ps = config.patch_size if isinstance(config.patch_size, (list, tuple)) else (config.patch_size,) * 2
        st = tuple(config.patch_stride)
        padding = ((ps[0] - st[0]) // 2, (ps[1] - st[1]) // 2)
        self.proj = Conv(config.patch_embed_input_channels, config.patch_embeds_hidden_size,
                         ps, stride=st, padding=padding, use_bias=True, ndim=2,
                         dtype=dtype, param_dtype=param_dtype)
        self.norm = (LayerNorm(config.patch_embeds_hidden_size, 1e-5, dtype=dtype,
                               param_dtype=param_dtype)
                     if config.enable_patch_layer_norm else None)
        self.grid_size = (config.spec_size // st[0], config.spec_size // st[1])

    def __call__(self, params, x):
        x = self.proj(params["proj"], x)  # [B, C, H, W]
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        if self.norm is not None:
            x = self.norm(params["norm"], x)
        return x


class ClapAudioEncoder(Module):
    def __init__(self, config: ClapAudioConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.patch_embed = ClapAudioPatchEmbed(config, **kw)
        self.freq_ratio = config.spec_size // config.num_mel_bins
        self.spec_size = config.spec_size
        n = len(config.depths)
        grid = self.patch_embed.grid_size
        self.input_resolutions = [(grid[0] // (2**i), grid[1] // (2**i)) for i in range(n)]
        self.layers = [
            ClapAudioStage(config, int(config.patch_embeds_hidden_size * 2**i),
                           self.input_resolutions[i], config.depths[i],
                           config.num_attention_heads[i], i < n - 1, **kw)
            for i in range(n)
        ]
        self.num_features = int(config.patch_embeds_hidden_size * 2 ** (n - 1))
        self.norm = LayerNorm(self.num_features, 1e-5, **kw)
        self.num_mel_bins = config.num_mel_bins

    def init(self, rng):
        params = super().init(rng)
        m = self.num_mel_bins
        params["batch_norm"] = {"weight": jnp.ones((m,), self.param_dtype),
                                "bias": jnp.zeros((m,), self.param_dtype),
                                "running_mean": jnp.zeros((m,), self.param_dtype),
                                "running_var": jnp.ones((m,), self.param_dtype),
                                "num_batches_tracked": jnp.zeros((), jnp.int32)}
        return params

    def reshape_mel2img(self, x):
        """[B, 1, T, mel] -> [B, 1, mel*freq_ratio, T//freq_ratio] (:758-783).
        T must equal spec_size*freq_ratio and mel == spec_size//freq_ratio
        (interpolation fallback is not lowered — pad on host)."""
        b, c, t, f = x.shape
        x = x.reshape(b, c * self.freq_ratio, t // self.freq_ratio, f)
        x = x.transpose(0, 1, 3, 2)
        return x.reshape(b, c, f * self.freq_ratio, t // self.freq_ratio)

    def __call__(self, params, input_features) -> BaseModelOutputWithPooling:
        # eval-mode BatchNorm over the mel dim (reference transposes to put
        # mel in the channel slot)
        bn = params["batch_norm"]
        x = input_features.astype(jnp.float32)
        mean = bn["running_mean"].astype(jnp.float32)[None, None, None, :]
        var = bn["running_var"].astype(jnp.float32)[None, None, None, :]
        w = bn["weight"].astype(jnp.float32)[None, None, None, :]
        b_ = bn["bias"].astype(jnp.float32)[None, None, None, :]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * w + b_
        x = self.reshape_mel2img(x.astype(self.dtype))
        frames_num = x.shape[2]
        h = self.patch_embed(params["patch_embed"], x)
        for i, stage in enumerate(self.layers):
            h = stage(params["layers"][str(i)], h)
        h = self.norm(params["norm"], h)

        b, _, c = h.shape
        n = len(self.config.depths)
        freq_shape = frames_num // (2 ** (n - 1)) // self.config.patch_stride[0]
        temporal_shape = h.shape[1] // freq_shape
        h = h.transpose(0, 2, 1).reshape(b, c, freq_shape, temporal_shape)
        c_freq_bin = freq_shape // self.freq_ratio
        h = h.reshape(b, c, freq_shape // c_freq_bin, c_freq_bin, temporal_shape)
        h = h.transpose(0, 1, 3, 2, 4).reshape(b, c, c_freq_bin, -1)
        latent = jnp.mean(h.reshape(b, c, -1), axis=-1)
        return BaseModelOutputWithPooling(last_hidden_state=h, pooler_output=latent)


class ClapAudioModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.audio_encoder = ClapAudioEncoder(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_features, **kwargs):
        return self.audio_encoder(params["audio_encoder"], input_features)


# ------------------------------------------------------------ text branch
class ClapTextModel(Module):
    def __init__(self, config: ClapTextConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.embeddings = RobertaEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids, position_ids)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": False}
        hidden, _ = self.encoder(params["encoder"], hidden, attn_args)
        pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(last_hidden_state=hidden, pooler_output=pooled)


# ------------------------------------------------------------ joint model
class ClapPreTrainedModel(PreTrainedModel):
    config_class = ClapConfig
    base_model_prefix = "clap"


class ClapModel(ClapPreTrainedModel):
    def __init__(self, config: ClapConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = ClapTextModel(config.text_config, **kw)
        self.text_projection = ClapProjectionLayer(config.text_config, **kw)
        self.audio_model = ClapAudioModel(config.audio_config, **kw)
        self.audio_projection = ClapProjectionLayer(config.audio_config, **kw)

    def init(self, rng):
        params = super().init(rng)
        init_val = jnp.asarray(self.config.logit_scale_init, self.param_dtype)
        params["logit_scale_a"] = init_val
        params["logit_scale_t"] = init_val
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        feats = self.text_projection(params["text_projection"], out.pooler_output)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def get_audio_features(self, params, input_features, **kwargs):
        out = self.audio_model(params["audio_model"], input_features)
        feats = self.audio_projection(params["audio_projection"], out.pooler_output)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, params, input_ids=None, input_features=None, attention_mask=None,
                 is_longer=None, **kwargs) -> ClapOutput:
        audio_embeds = self.get_audio_features(params, input_features)
        text_embeds = self.get_text_features(params, input_ids, attention_mask)
        scale_t = jnp.exp(params["logit_scale_t"].astype(jnp.float32))
        scale_a = jnp.exp(params["logit_scale_a"].astype(jnp.float32))
        logits_per_text = text_embeds @ audio_embeds.T * scale_t
        logits_per_audio = audio_embeds @ text_embeds.T * scale_a
        return ClapOutput(logits_per_audio=logits_per_audio, logits_per_text=logits_per_text,
                          text_embeds=text_embeds, audio_embeds=audio_embeds)
