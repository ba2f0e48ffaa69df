"""Emu3 (reference models/emu3/modeling_emu3.py): any-to-any generation with
discrete tokens — a video-capable VQ-VAE (spatial down/up blocks with
mid-attention, temporal conv stacks with causal 3-D padding, spatial-norm
conditioned decoder) tokenizes images into codebook ids that a Llama-skeleton
text model consumes/produces via an image↔BPE vocabulary mapping."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, GroupNorm, BatchNorm, Linear, Module, ModuleList, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast, ModelOutput
from ...modeling_utils import PreTrainedModel
from ..llama.modeling_llama import (
    DECODER_TP_PLAN,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)
from ..luke.modeling_luke import _Container
from .configuration_emu3 import Emu3Config, Emu3TextConfig, Emu3VQVAEConfig


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _nearest(x, size):
    """torch F.interpolate(mode="nearest") for trailing spatial dims."""
    idx = [np.floor(np.arange(s) * (x.shape[i - len(size)] / s)).astype(np.int64)
           for i, s in enumerate(size)]
    for ax, ind in enumerate(idx):
        x = jnp.take(x, jnp.asarray(ind), axis=x.ndim - len(size) + ax)
    return x


class Emu3VQVAEConv3d(Module):
    """Conv3d with the reference's causal-in-time asymmetric padding."""

    def __init__(self, cin, cout, kernel_size, stride, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        pads = [k - s for k, s in zip(kernel_size[1:], stride[1:])]
        # (T_front, T_back), (H_lo, H_hi), (W_lo, W_hi)
        self.pad = [(2, 0)] + [(p // 2 + p % 2, p // 2) for p in pads]
        self.conv = Conv(cin, cout, kernel_size, stride=stride, ndim=3,
                         dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):  # [B, C, T, H, W]
        x = jnp.pad(x, [(0, 0), (0, 0)] + self.pad)
        return self.conv(params["conv"], x)


class Emu3VQVAESpatialNorm(Module):
    def __init__(self, in_channels, out_channels, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.norm_layer = GroupNorm(32, out_channels, 1e-6, **kw)
        self.conv_y = Conv(in_channels, out_channels, 1, ndim=2, **kw)
        self.conv_b = Conv(in_channels, out_channels, 1, ndim=2, **kw)

    def __call__(self, params, x, quant):
        quant = _nearest(quant, x.shape[-2:])
        h = self.norm_layer(params["norm_layer"], x)
        return (h * self.conv_y(params["conv_y"], quant)
                + self.conv_b(params["conv_b"], quant))


class Emu3VQVAETemporalResnetBlock(Module):
    def __init__(self, cin, cout, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.cin, self.cout = cin, cout
        self.norm1 = BatchNorm(cin, 1e-5, **kw)
        self.conv1 = Emu3VQVAEConv3d(cin, cout, (3, 3, 3), (1, 1, 1), **kw)
        self.norm2 = BatchNorm(cout, 1e-5, **kw)
        self.conv2 = Emu3VQVAEConv3d(cout, cout, (3, 3, 3), (1, 1, 1), **kw)
        if cin != cout:
            self.nin_shortcut = Conv(cin, cout, 1, ndim=3, **kw)

    def __call__(self, params, x):
        residual = x
        h = self.norm1(params["norm1"], x)
        h = _swish(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h)
        h = _swish(h)
        h = self.conv2(params["conv2"], h)
        if self.cin != self.cout:
            residual = self.nin_shortcut(params["nin_shortcut"], residual)
        return residual + h


class Emu3VQVAEResnetBlock(Module):
    def __init__(self, cin, cout=None, quant_channels=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        cout = cin if cout is None else cout
        self.cin, self.cout = cin, cout
        self.quant_channels = quant_channels
        if quant_channels is None:
            self.norm1 = GroupNorm(32, cin, 1e-6, **kw)
            self.norm2 = GroupNorm(32, cout, 1e-6, **kw)
        else:
            self.norm1 = Emu3VQVAESpatialNorm(quant_channels, cin, **kw)
            self.norm2 = Emu3VQVAESpatialNorm(quant_channels, cout, **kw)
        self.conv1 = Conv(cin, cout, 3, padding=1, ndim=2, **kw)
        self.conv2 = Conv(cout, cout, 3, padding=1, ndim=2, **kw)
        if cin != cout:
            self.nin_shortcut = Conv(cin, cout, 1, ndim=2, **kw)

    def _norm(self, norm, params, x, quant):
        if self.quant_channels is None:
            return norm(params, x)
        return norm(params, x, quant)

    def __call__(self, params, x, quant=None):
        residual = x
        h = self._norm(self.norm1, params["norm1"], x, quant)
        h = _swish(h)
        h = self.conv1(params["conv1"], h)
        h = self._norm(self.norm2, params["norm2"], h, quant)
        h = _swish(h)
        h = self.conv2(params["conv2"], h)
        if self.cin != self.cout:
            residual = self.nin_shortcut(params["nin_shortcut"], residual)
        return residual + h


class Emu3VQVAEAttentionBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        d = config.hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = d // self.num_heads
        self.q_proj = Linear(d, d, True, **kw)
        self.k_proj = Linear(d, d, True, **kw)
        self.v_proj = Linear(d, d, True, **kw)
        self.out_proj = Linear(d, d, True, **kw)

    def __call__(self, params, hidden):  # [B, S, C]
        b, s, _ = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (self.head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.out_proj(params["out_proj"], out)


def _spatial_attention(attn, attn_params, x):
    b, c, h, w = x.shape
    flat = x.reshape(b, c, h * w).transpose(0, 2, 1)
    out = attn(attn_params, flat)
    return out.reshape(b, h, w, c).transpose(0, 3, 1, 2)


class Emu3VQVAEMiddleBlock(Module):
    def __init__(self, config, in_channels, quant_channels=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.block_1 = Emu3VQVAEResnetBlock(in_channels, in_channels,
                                            quant_channels, **kw)
        self.attn_1 = Emu3VQVAEAttentionBlock(config, **kw)
        self.quant = quant_channels is not None
        if quant_channels is None:
            self.attn_norm = GroupNorm(32, in_channels, 1e-6, **kw)
        else:
            self.attn_norm = Emu3VQVAESpatialNorm(quant_channels, in_channels, **kw)
        self.block_2 = Emu3VQVAEResnetBlock(in_channels, in_channels,
                                            quant_channels, **kw)

    def __call__(self, params, x, quant=None):
        x = self.block_1(params["block_1"], x, quant)
        residual = x
        h = (self.attn_norm(params["attn_norm"], x, quant) if self.quant
             else self.attn_norm(params["attn_norm"], x))
        h = _spatial_attention(self.attn_1, params["attn_1"], h)
        x = residual + h
        return self.block_2(params["block_2"], x, quant)


class _DownLevel(Module):
    def __init__(self, config, block_in, block_out, has_down, attends=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        blocks, attns, norms = [], [], []
        cin = block_in
        for _ in range(config.num_res_blocks):
            blocks.append(Emu3VQVAEResnetBlock(cin, block_out, **kw))
            cin = block_out
            if attends:
                attns.append(Emu3VQVAEAttentionBlock(config, **kw))
                norms.append(GroupNorm(32, cin, 1e-6, **kw))
        self.block = blocks
        self.attn = attns
        self.attn_norms = norms
        if has_down:
            self.downsample = _Container({"conv": Conv(
                cin, cin, 3, stride=2, ndim=2, **kw)}, **kw)
        else:
            self.downsample = None


class Emu3VQVAEDownBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_res_blocks = config.num_res_blocks
        n = len(config.channel_multiplier)
        in_mult = (1,) + tuple(config.channel_multiplier)
        levels = []
        for i in range(n):
            levels.append(_DownLevel(
                config, config.base_channels * in_mult[i],
                config.base_channels * config.channel_multiplier[i],
                has_down=(i != n - 1),
                attends=(config.attn_resolutions is not None
                         and i in config.attn_resolutions), **kw))
        self.down = levels

    def __call__(self, params, x):
        for i, level in enumerate(self.down):
            p = params["down"][str(i)]
            for j in range(self.num_res_blocks):
                x = level.block[j](p["block"][str(j)], x)
                if level.attn:
                    residual = x
                    h = level.attn_norms[j](p["attn_norms"][str(j)], x)
                    h = _spatial_attention(level.attn[j], p["attn"][str(j)], h)
                    x = residual + h
            if level.downsample is not None:
                x = jnp.pad(x, [(0, 0), (0, 0), (0, 1), (0, 1)])
                x = level.downsample._children["conv"](
                    p["downsample"]["conv"], x)
        return x


class _UpLevel(Module):
    def __init__(self, config, block_in, block_out, has_up, attends=False,
                 *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        quant = config.embed_dim
        blocks, attns, norms = [], [], []
        cin = block_in
        for _ in range(config.num_res_blocks + 1):
            blocks.append(Emu3VQVAEResnetBlock(cin, block_out, quant, **kw))
            cin = block_out
            if attends:
                attns.append(Emu3VQVAEAttentionBlock(config, **kw))
                norms.append(Emu3VQVAESpatialNorm(quant, cin, **kw))
        self.block = blocks
        self.attn = attns
        self.attn_norms = norms
        if has_up:
            self.upsample = _Container({"conv": Conv(
                cin, cin, 3, stride=1, padding=1, ndim=2, **kw)}, **kw)
        else:
            self.upsample = None


class Emu3VQVAEUpBlock(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.num_res_blocks = config.num_res_blocks
        n = len(config.channel_multiplier)
        levels = [None] * n
        block_in = config.base_channels * config.channel_multiplier[-1]
        for i_level in reversed(range(n)):
            block_out = config.base_channels * config.channel_multiplier[i_level]
            levels[i_level] = _UpLevel(
                config, block_in, block_out, has_up=(i_level != 0),
                attends=(i_level in config.attn_resolutions), **kw)
            block_in = block_out
        self.up = levels

    def __call__(self, params, x, quant):
        n = len(self.up)
        for step, i_level in enumerate(reversed(range(n))):
            level = self.up[i_level]
            p = params["up"][str(i_level)]
            for j in range(self.num_res_blocks + 1):
                x = level.block[j](p["block"][str(j)], x, quant)
                if level.attn:
                    residual = x
                    h = level.attn_norms[j](p["attn_norms"][str(j)], x, quant)
                    h = _spatial_attention(level.attn[j], p["attn"][str(j)], h)
                    x = residual + h
            if step != n - 1:
                x = _nearest(x, (x.shape[2] * 2, x.shape[3] * 2))
                x = level.upsample._children["conv"](p["upsample"]["conv"], x)
        return x


class Emu3VQVAEEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        base = config.base_channels
        block_in = base * config.channel_multiplier[-1]
        out_ch = (2 * config.latent_channels if config.double_latent
                  else config.latent_channels)
        self.conv_in = Conv(config.in_channels, base, 3, padding=1, ndim=2, **kw)
        self.down_block = Emu3VQVAEDownBlock(config, **kw)
        self.middle_block = Emu3VQVAEMiddleBlock(config, block_in, **kw)
        self.norm_out = GroupNorm(32, block_in, 1e-6, **kw)
        self.conv_out = Conv(block_in, out_ch, 3, padding=1, ndim=2, **kw)
        t_down = int(math.log2(config.temporal_downsample_factor))
        self.time_conv = [_Container({"conv": Emu3VQVAEConv3d(
            out_ch, out_ch, (4, 3, 3), (2, 1, 1), **kw)}, **kw)
            for _ in range(t_down)]
        self.time_res_stack = [Emu3VQVAETemporalResnetBlock(out_ch, out_ch, **kw)
                               for _ in range(config.num_res_blocks)]

    def __call__(self, params, pixel_values):  # [B, T, C, H, W]
        t = pixel_values.shape[1]
        x = pixel_values.reshape(-1, *pixel_values.shape[2:])
        x = self.conv_in(params["conv_in"], x)
        x = self.down_block(params["down_block"], x)
        x = self.middle_block(params["middle_block"], x)
        x = self.norm_out(params["norm_out"], x)
        x = _swish(x)
        x = self.conv_out(params["conv_out"], x)
        x = x.reshape(-1, t, *x.shape[1:]).transpose(0, 2, 1, 3, 4)  # B C T H W
        for i, conv in enumerate(self.time_conv):
            x = conv._children["conv"](params["time_conv"][str(i)]["conv"], x)
            x = _swish(x)
        for i, layer in enumerate(self.time_res_stack):
            x = layer(params["time_res_stack"][str(i)], x)
        return x.transpose(0, 2, 1, 3, 4)  # B T C H W


class Emu3VQVAEDecoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        quant = config.embed_dim
        lc = config.latent_channels
        block_in = config.base_channels * config.channel_multiplier[-1]
        self.time_res_stack = [Emu3VQVAETemporalResnetBlock(lc, lc, **kw)
                               for _ in range(config.num_res_blocks)]
        t_up = int(math.log2(config.temporal_downsample_factor))
        self.time_conv = [_Container({"conv": Emu3VQVAEConv3d(
            lc, lc, (3, 3, 3), (1, 1, 1), **kw)}, **kw) for _ in range(t_up)]
        self.conv_in = Conv(lc, block_in, 3, padding=1, ndim=2, **kw)
        self.middle_block = Emu3VQVAEMiddleBlock(config, block_in, quant, **kw)
        self.up_block = Emu3VQVAEUpBlock(config, **kw)
        first = config.base_channels * config.channel_multiplier[0]
        self.norm_out = Emu3VQVAESpatialNorm(quant, first, **kw)
        self.conv_out = Conv(first, config.out_channels, 3, padding=1, ndim=2, **kw)

    def __call__(self, params, hidden, quant):  # both [B, T, C, H, W]
        hq = jnp.concatenate([hidden, quant], axis=0).transpose(0, 2, 1, 3, 4)
        for i, layer in enumerate(self.time_res_stack):
            hq = layer(params["time_res_stack"][str(i)], hq)
        for i, conv in enumerate(self.time_conv):
            b, c, t, h, w = hq.shape
            flat = hq.transpose(0, 1, 3, 4, 2).reshape(b, -1, t)
            flat = _nearest(flat, (t * 2,))
            hq = flat.reshape(b, c, h, w, -1).transpose(0, 1, 4, 2, 3)
            hq = conv._children["conv"](params["time_conv"][str(i)]["conv"], hq)
            hq = _swish(hq)
        hq = hq.transpose(0, 2, 1, 3, 4)
        hidden, quant = jnp.split(hq, 2, axis=0)
        hidden = hidden.reshape(-1, *hidden.shape[2:])
        quant = quant.reshape(-1, *quant.shape[2:])
        x = self.conv_in(params["conv_in"], hidden)
        x = self.middle_block(params["middle_block"], x, quant)
        x = self.up_block(params["up_block"], x, quant)
        x = self.norm_out(params["norm_out"], x, quant)
        x = _swish(x)
        return self.conv_out(params["conv_out"], x)


class Emu3VQVAEVectorQuantizer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embedding = Embedding(config.codebook_size, config.embed_dim,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):  # [B, T, C, H, W]
        b, t, c, h, w = hidden.shape
        flat = hidden.transpose(0, 1, 3, 4, 2).reshape(-1, c).astype(jnp.float32)
        table = params["embedding"]["weight"].astype(jnp.float32)
        d = ((flat ** 2).sum(-1, keepdims=True) + (table ** 2).sum(-1)
             - 2 * flat @ table.T)
        return jnp.argmin(d, axis=-1).reshape(b, t, h, w)


class Emu3VQVAE(PreTrainedModel):
    config_class = Emu3VQVAEConfig
    base_model_prefix = "emuvideovq"
    main_input_name = "pixel_values"
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)

    def __init__(self, config: Emu3VQVAEConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Emu3VQVAEEncoder(config, **kw)
        self.decoder = Emu3VQVAEDecoder(config, **kw)
        self.quantize = Emu3VQVAEVectorQuantizer(config, **kw)
        self.vision_spatial_factor = 2 ** (len(config.channel_multiplier) - 1)
        self.quant_conv = Emu3VQVAEConv3d(config.latent_channels,
                                          config.embed_dim, (3, 1, 1),
                                          (1, 1, 1), **kw)
        self.post_quant_conv = Emu3VQVAEConv3d(config.embed_dim,
                                               config.latent_channels,
                                               (3, 1, 1), (1, 1, 1), **kw)
        self.spatial_scale_factor = self.vision_spatial_factor

    def encode(self, params, pixel_values, image_sizes=None):
        px = jnp.asarray(pixel_values, self.dtype)
        is_image = px.ndim == 4
        if is_image:
            px = jnp.repeat(px[:, None], self.config.temporal_downsample_factor,
                            axis=1)
        hidden = self.encoder(params["encoder"], px)
        conv = self.quant_conv(params["quant_conv"],
                               hidden.transpose(0, 2, 1, 3, 4))
        codes = self.quantize(params["quantize"], conv.transpose(0, 2, 1, 3, 4))
        tokens = codes[:, 0] if is_image else codes
        if image_sizes is None:
            return [t for t in tokens]
        f = self.vision_spatial_factor
        return [tokens[i, :int(s[0]) // f, :int(s[1]) // f]
                for i, s in enumerate(np.asarray(image_sizes))]

    def decode(self, params, hidden):
        hidden = jnp.asarray(hidden)
        is_image = hidden.ndim == 3
        if is_image:
            hidden = hidden[:, None]
        b, t, h, w = hidden.shape
        quant = self.quantize.embedding(
            params["quantize"]["embedding"], hidden.reshape(-1))
        c = quant.shape[-1]
        quant = quant.reshape(b, t, h, w, c).transpose(0, 4, 1, 2, 3)
        post = self.post_quant_conv(params["post_quant_conv"], quant)
        video = self.decoder(params["decoder"], post.transpose(0, 2, 1, 3, 4),
                             quant.transpose(0, 2, 1, 3, 4))
        video = video.reshape(b, t * self.config.temporal_downsample_factor,
                              self.config.out_channels,
                              h * self.spatial_scale_factor,
                              w * self.spatial_scale_factor)
        return video[:, 0] if is_image else video

    def __call__(self, params, pixel_values=None, image_sizes=None, **kwargs):
        return self.encode(params, pixel_values, image_sizes)


class Emu3ImageVocabularyMapping:
    """Maps VQGAN codes to BPE ids (reference Emu3ImageVocabularyMapping)."""

    def __init__(self, vocab_map):
        vocab_map = vocab_map or {}
        self.vocab_map = vocab_map
        self.eol_token_id = vocab_map.get("<|extra_200|>")
        self.image_token_id = vocab_map.get("<image>")
        names = sorted(n for n in vocab_map if n.startswith("<|visual token"))
        self.img2bpe = {int(n[-8:-2]): vocab_map[n] for n in names}
        self.bpe2img = {v: k for k, v in self.img2bpe.items()}
        if self.img2bpe:
            t = np.zeros(max(self.img2bpe) + 1, np.int32)
            for k, v in self.img2bpe.items():
                t[k] = v
            self.img2bpe_table = t
            t2 = np.zeros(max(self.bpe2img) + 1, np.int32)
            for k, v in self.bpe2img.items():
                t2[k] = v
            self.bpe2img_table = t2
        else:
            self.img2bpe_table = self.bpe2img_table = None

    def convert_img2bpe(self, img):
        tokens = jnp.take(jnp.asarray(self.img2bpe_table), jnp.asarray(img), axis=0)
        eol = jnp.full((tokens.shape[0], 1), self.eol_token_id, tokens.dtype)
        return jnp.concatenate([tokens, eol], axis=-1)

    def convert_bpe2img(self, img):
        return jnp.take(jnp.asarray(self.bpe2img_table),
                        jnp.asarray(img)[..., :-1], axis=0)


class Emu3TextModelStandalone(LlamaModelStandalone):
    config_class = Emu3TextConfig


class Emu3ForCausalLM(LlamaForCausalLM):
    config_class = Emu3TextConfig


class _Emu3VQVAEModule(Module):
    """Emu3VQVAE as a child module (no PreTrainedModel machinery)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.encoder = Emu3VQVAEEncoder(config, **kw)
        self.decoder = Emu3VQVAEDecoder(config, **kw)
        self.quantize = Emu3VQVAEVectorQuantizer(config, **kw)
        self.quant_conv = Emu3VQVAEConv3d(config.latent_channels,
                                          config.embed_dim, (3, 1, 1),
                                          (1, 1, 1), **kw)
        self.post_quant_conv = Emu3VQVAEConv3d(config.embed_dim,
                                               config.latent_channels,
                                               (3, 1, 1), (1, 1, 1), **kw)
        self.vision_spatial_factor = 2 ** (len(config.channel_multiplier) - 1)

    def vqvae_encode(self, params, pixel_values, image_sizes=None):
        return Emu3VQVAE.encode(self, params, pixel_values, image_sizes)

    def vqvae_decode(self, params, hidden):
        return Emu3VQVAE.decode(self, params, hidden)

    @property
    def spatial_scale_factor(self):
        return self.vision_spatial_factor


class Emu3ForConditionalGeneration(PreTrainedModel, GenerationMixin):
    """text_model (full CausalLM incl. lm_head) + vqmodel, matching the hub
    checkpoint layout. Image placeholder ids are replaced with VQGAN-derived
    BPE ids before embedding — equivalent to the reference's masked_scatter
    of their embeddings (same embedding table)."""

    config_class = Emu3Config
    _prefill_input_names = ("pixel_values", "image_sizes")
    _keys_to_ignore_on_load_unexpected = (r"num_batches_tracked",)

    def __init__(self, config: Emu3Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = Emu3ForCausalLM(config.text_config, **kw)
        self.vqmodel = _Emu3VQVAEModule(config.vq_config, **kw)
        self.vocabulary_mapping = Emu3ImageVocabularyMapping(config.vocabulary_map)
        # generation helpers read these off the top-level config
        config.vocab_size = config.text_config.vocab_size
        for tok in ("bos_token_id", "eos_token_id", "pad_token_id"):
            setattr(config, tok, getattr(config.text_config, tok, None))

    def get_image_tokens(self, params, pixel_values, image_sizes):
        token_list = self.vqmodel.vqvae_encode(params["vqmodel"], pixel_values,
                                               image_sizes)
        bpe = [self.vocabulary_mapping.convert_img2bpe(t).reshape(-1)
               for t in token_list]
        return jnp.concatenate(bpe)

    def decode_image_tokens(self, params, image_tokens, height, width):
        seq = jnp.asarray(image_tokens)[:, :-3].reshape(-1, height, width + 1)
        codes = self.vocabulary_mapping.convert_bpe2img(seq)
        return self.vqmodel.vqvae_decode(params["vqmodel"], codes)

    def _merge_image_ids(self, params, input_ids, pixel_values, image_sizes):
        bpe_tokens = self.get_image_tokens(params, pixel_values, image_sizes)
        mask = input_ids == self.vocabulary_mapping.image_token_id
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(bpe_tokens,
                            jnp.clip(order, 0, bpe_tokens.shape[0] - 1))
        return jnp.where(mask, gathered.reshape(input_ids.shape), input_ids)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        if pixel_values is not None and input_ids is not None:
            input_ids = self._merge_image_ids(params, jnp.asarray(input_ids),
                                              pixel_values, image_sizes)
        return self.text_model(params["text_model"], input_ids, attention_mask,
                               position_ids, past_key_values, cache_position,
                               inputs_embeds, labels, logits_to_keep,
                               output_hidden_states)

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        return self.text_model.init_cache(batch_size, max_len, dtype=dtype,
                                          implementation=implementation)


class Emu3Model(PreTrainedModel):
    """Bare Emu3 text+vq stack without lm_head (reference Emu3Model)."""

    config_class = Emu3Config

    def __init__(self, config: Emu3Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = LlamaModel(config.text_config, **kw)
        self.vqmodel = _Emu3VQVAEModule(config.vq_config, **kw)
        self.vocabulary_mapping = Emu3ImageVocabularyMapping(config.vocabulary_map)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False, **kwargs):
        if pixel_values is not None and input_ids is not None:
            helper = Emu3ForConditionalGeneration._merge_image_ids
            input_ids = helper(self, params, jnp.asarray(input_ids),
                               pixel_values, image_sizes)
        return self.text_model(params["text_model"], input_ids, attention_mask,
                               position_ids, past_key_values, cache_position,
                               inputs_embeds, output_hidden_states)
