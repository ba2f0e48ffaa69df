"""Florence-2 (reference models/florence2/modeling_florence2.py): a DaViT
vision backbone — four stages of conv patch embeds, each stacking
[spatial window-attention block, channel group-attention block] pairs with
depthwise-conv positional mixing — whose pooled features are projected and
scattered into a BART encoder at <image> placeholder positions; a standard
BART decoder generates the task output (captions, boxes-as-text, etc.)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, ModuleList
from ...modeling_outputs import ModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bart.modeling_bart import BartModel, shift_tokens_right
from .configuration_florence2 import Florence2Config, Florence2VisionConfig


@dataclass
class Florence2Seq2SeqLMOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    past_key_values: Any = None
    encoder_last_hidden_state: Any = None
    image_hidden_states: Any = None


class Florence2VisionMLP(Module):
    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim[stage_idx]
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fc1 = Linear(d, int(d * config.mlp_ratio), **kw)
        self.fc2 = Linear(int(d * config.mlp_ratio), d, **kw)
        self.act = get_activation(config.activation_function)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class Florence2VisionConvEmbed(Module):
    """reference :131 — conv patch embed with pre/post LayerNorm."""

    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        in_ch = config.in_channels if stage_idx == 0 else config.embed_dim[stage_idx - 1]
        out_ch = config.embed_dim[stage_idx]
        self.pre_norm = config.patch_prenorm[stage_idx]
        self.conv = Conv(in_ch, out_ch, config.patch_size[stage_idx],
                         stride=config.patch_stride[stage_idx],
                         padding=config.patch_padding[stage_idx], **kw)
        self.norm = LayerNorm(in_ch if self.pre_norm else out_ch, 1e-5, **kw)

    def __call__(self, params, x):
        if self.pre_norm:
            x = self.norm(params["norm"], x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        x = self.conv(params["conv"], x)
        if not self.pre_norm:
            x = self.norm(params["norm"], x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return x


class Florence2VisionChannelAttention(Module):
    """reference :223 — attention across channel groups: tokens act as the
    feature axis, C/groups channels attend to each other (scale = N^-0.5)."""

    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim[stage_idx]
        self.groups = config.num_groups[stage_idx]
        self.qkv = Linear(d, d * 3, config.qkv_bias, **kw)
        self.proj = Linear(d, d, **kw)

    def __call__(self, params, x):
        b, n, c = x.shape
        g = self.groups
        qkv = self.qkv(params["qkv"], x).reshape(b, n, 3, g, c // g)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3)]  # B,g,c/g,N
        attn = jnp.einsum("bgcn,bgdn->bgcd", q, k,
                          preferred_element_type=jnp.float32) * (n ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bgcd,bgdn->bgcn", attn, v)
        # (B,g,c/g,N) -> (B,N,g,c/g) -> (B,N,C), groups-major like the qkv split
        out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
        return self.proj(params["proj"], out)


class Florence2VisionWindowAttention(Module):
    """reference :324 — non-overlapping window MHA with edge padding."""

    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim[stage_idx]
        self.window = config.window_size
        self.num_heads = config.num_heads[stage_idx]
        self.qkv = Linear(d, d * 3, config.qkv_bias, **kw)
        self.proj = Linear(d, d, **kw)

    def __call__(self, params, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws, nh = self.window, self.num_heads
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        ph, pw = h + pad_b, w + pad_r
        x = x.reshape(b, ph // ws, ws, pw // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        win = x.reshape(-1, ws * ws, c)
        nw, nt, _ = win.shape
        qkv = self.qkv(params["qkv"], win).reshape(nw, nt, 3, nh, c // nh)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = jnp.einsum("whqd,whkd->whqk", q, k,
                          preferred_element_type=jnp.float32) * ((c // nh) ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("whqk,whkd->whqd", attn, v).transpose(0, 2, 1, 3)
        out = self.proj(params["proj"], out.reshape(nw, nt, c))
        out = out.reshape(b, ph // ws, pw // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, ph, pw, c)[:, :h, :w]
        return out.reshape(b, h * w, c)


def _dw_conv(conv, params, x):
    return conv(params, x) + x


class Florence2VisionSpatialBlock(Module):
    """reference :401 — dwconv + window attn, dwconv + FFN (post residuals)."""

    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim[stage_idx]
        self.conv1 = Conv(d, d, 3, padding=1, groups=d, **kw)
        self.norm1 = LayerNorm(d, 1e-5, **kw)
        self.window_attn = Florence2VisionWindowAttention(config, stage_idx, **kw)
        self.conv2 = Conv(d, d, 3, padding=1, groups=d, **kw)
        self.norm2 = LayerNorm(d, 1e-5, **kw)
        self.ffn = Florence2VisionMLP(config, stage_idx, **kw)

    def __call__(self, params, x):
        b, c, h, w = x.shape
        x = _dw_conv(self.conv1, params["conv1"], x)
        seq = x.reshape(b, c, h * w).transpose(0, 2, 1)
        normed = self.norm1(params["norm1"], seq)
        attn = self.window_attn(params["window_attn"],
                                normed.reshape(b, h, w, c))
        seq = seq + attn
        x = seq.transpose(0, 2, 1).reshape(b, c, h, w)
        x = _dw_conv(self.conv2, params["conv2"], x)
        seq = x.reshape(b, c, h * w).transpose(0, 2, 1)
        seq = seq + self.ffn(params["ffn"], self.norm2(params["norm2"], seq))
        return seq.transpose(0, 2, 1).reshape(b, c, h, w)


class Florence2VisionChannelBlock(Module):
    """reference :262 — dwconv + channel attn, dwconv + FFN."""

    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.embed_dim[stage_idx]
        self.conv1 = Conv(d, d, 3, padding=1, groups=d, **kw)
        self.norm1 = LayerNorm(d, 1e-5, **kw)
        self.channel_attn = Florence2VisionChannelAttention(config, stage_idx, **kw)
        self.conv2 = Conv(d, d, 3, padding=1, groups=d, **kw)
        self.norm2 = LayerNorm(d, 1e-5, **kw)
        self.ffn = Florence2VisionMLP(config, stage_idx, **kw)

    def __call__(self, params, x):
        b, c, h, w = x.shape
        x = _dw_conv(self.conv1, params["conv1"], x)
        seq = x.reshape(b, c, h * w).transpose(0, 2, 1)
        seq = seq + self.channel_attn(params["channel_attn"],
                                      self.norm1(params["norm1"], seq))
        x = seq.transpose(0, 2, 1).reshape(b, c, h, w)
        x = _dw_conv(self.conv2, params["conv2"], x)
        seq = x.reshape(b, c, h * w).transpose(0, 2, 1)
        seq = seq + self.ffn(params["ffn"], self.norm2(params["norm2"], seq))
        return seq.transpose(0, 2, 1).reshape(b, c, h, w)


class Florence2VisionBlock(Module):
    def __init__(self, config, stage_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.spatial_block = Florence2VisionSpatialBlock(config, stage_idx, **kw)
        self.channel_block = Florence2VisionChannelBlock(config, stage_idx, **kw)

    def __call__(self, params, x):
        x = self.spatial_block(params["spatial_block"], x)
        return self.channel_block(params["channel_block"], x)


class Florence2VisionBackbone(Module):
    """reference :504 — four (conv embed, block stack) stages."""

    def __init__(self, config: Florence2VisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.convs = [Florence2VisionConvEmbed(config, i, **kw)
                      for i in range(len(config.depths))]
        # nested ModuleList mirrors the checkpoint's blocks.<stage>.<idx>.*
        self.blocks = [ModuleList([Florence2VisionBlock(config, i, **kw)
                                   for _ in range(config.depths[i])])
                       for i in range(len(config.depths))]
        self.depths = list(config.depths)

    def __call__(self, params, pixel_values):
        x = jnp.asarray(pixel_values, self.dtype)
        for i, (conv, stack) in enumerate(zip(self.convs, self.blocks)):
            x = conv(params["convs"][str(i)], x)
            for j in range(self.depths[i]):
                x = stack[j](params["blocks"][str(i)][str(j)], x)
        return x


def cosine_1d_embed(length, dim, dtype=jnp.float32):
    """reference Florence2VisionPositionalEmbeddingCosine1D:81 — interleaved
    sin/cos over half_dim frequencies (computed, not stored)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000) / half))
    ang = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None]
    out = jnp.zeros((length, dim), dtype)
    out = out.at[:, 0::2].set(jnp.sin(ang))
    out = out.at[:, 1::2].set(jnp.cos(ang))
    return out


class Florence2MultiModalProjector(Module):
    """reference :568 — learned 2D absolute pos + cosine temporal embed,
    spatial/temporal mean pooling, projection + LayerNorm."""

    def __init__(self, config: Florence2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        vc = config.vision_config
        d = vc.embed_dim[-1]
        self.d = d
        self.image_projection = Linear(d, vc.projection_dim, use_bias=False, **kw)
        self.image_proj_norm = LayerNorm(vc.projection_dim, 1e-5, **kw)
        pos_embed = Module(**kw)
        pos_embed._children["row_embeddings"] = Embedding(
            vc.max_position_embeddings, d // 2, **kw)
        pos_embed._children["column_embeddings"] = Embedding(
            vc.max_position_embeddings, d - d // 2, **kw)
        self.image_position_embed = pos_embed

    def __call__(self, params, image_features):
        b, c, h, w = image_features.shape
        pe = params["image_position_embed"]
        col = self.image_position_embed._children["column_embeddings"](
            pe["column_embeddings"], jnp.arange(w))
        row = self.image_position_embed._children["row_embeddings"](
            pe["row_embeddings"], jnp.arange(h))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (h, w, col.shape[-1])),
            jnp.broadcast_to(row[:, None, :], (h, w, row.shape[-1]))], -1)
        x = image_features + pos.transpose(2, 0, 1)[None]
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)  # B, HW, C
        temporal = cosine_1d_embed(1, self.d, x.dtype)  # first position only
        tokens = x + temporal[None]
        # one temporal frame: spatial mean (B,1,C) + per-token temporal mean
        spatial = tokens.mean(axis=1, keepdims=True)
        feats = jnp.concatenate([spatial, tokens], axis=1)
        feats = self.image_projection(params["image_projection"], feats)
        return self.image_proj_norm(params["image_proj_norm"], feats)


class Florence2PreTrainedModel(PreTrainedModel):
    config_class = Florence2Config
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (
        r".*visual_temporal_embed.*", r"\.embed_tokens\.weight$",
        r"^lm_head\.weight$")


class Florence2Model(Module):
    def __init__(self, config: Florence2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.vision_tower = Florence2VisionBackbone(config.vision_config, **kw)
        self.multi_modal_projector = Florence2MultiModalProjector(config, **kw)
        self.language_model = BartModel(config.text_config, **kw)


from ...generation.seq2seq import EncoderDecoderGenerationMixin  # noqa: E402
from ...modeling_outputs import BaseModelOutput  # noqa: E402


class Florence2ForConditionalGeneration(Florence2PreTrainedModel,
                                        EncoderDecoderGenerationMixin):
    main_input_name = "input_ids"
    encoder_input_name = "inputs_embeds"

    def __init__(self, config: Florence2Config, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = Florence2Model(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "model.language_model.shared.weight"

    # ------------------------------------------------------------------ vision
    def get_image_features(self, params, pixel_values):
        feats = self.model.vision_tower(params["model"]["vision_tower"],
                                        pixel_values)
        return self.model.multi_modal_projector(
            params["model"]["multi_modal_projector"], feats)

    def _merge(self, params, input_ids, image_features):
        """Scatter projected image features over <image> placeholder
        positions (reference get_placeholder_mask :693 + masked_scatter)."""
        lm = self.model.language_model
        embeds = lm.shared(params["model"]["language_model"]["shared"],
                           jnp.where(input_ids == self.config.image_token_id,
                                     0, input_ids))
        if image_features is None:
            return embeds
        mask = input_ids == self.config.image_token_id
        flat = image_features.reshape(-1, image_features.shape[-1])
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, flat.shape[0] - 1).reshape(mask.shape)
        placed = jnp.take(flat, order, axis=0)
        return jnp.where(mask[..., None], placed.astype(embeds.dtype), embeds)

    # ------------------------------------------- EncoderDecoderGenerationMixin
    def encode(self, params, inputs_embeds, attention_mask=None):
        lm = self.model.language_model
        hidden = lm.encoder(params["model"]["language_model"]["encoder"],
                            inputs_embeds, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        lm = self.model.language_model
        p = params["model"]["language_model"]["decoder"]["layers"]
        return tuple(layer.encoder_attn.kv(p[str(i)]["encoder_attn"], encoder_hidden)
                     for i, layer in enumerate(lm.decoder.layers))

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        lm = self.model.language_model
        embeds = lm.shared(params["model"]["language_model"]["shared"], input_ids)
        return lm.decoder(params["model"]["language_model"]["decoder"], embeds,
                          cross_kv, cache, cache_position, decoder_mask,
                          encoder_mask)

    def compute_logits(self, params, hidden):
        return self.model.language_model.shared.attend(
            params["model"]["language_model"]["shared"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None):
        from ...cache_utils import init_static_cache

        c = self.config.text_config
        return init_static_cache(
            num_layers=c.decoder_layers, batch_size=batch_size, max_len=max_len,
            num_kv_heads=c.decoder_attention_heads,
            head_dim=c.d_model // c.decoder_attention_heads,
            dtype=dtype or self.dtype)

    def generate(self, params=None, input_ids=None, pixel_values=None,
                 attention_mask=None, **kwargs):
        """Merge image features into the encoder embeds first (reference
        _prepare_encoder_decoder_kwargs_for_generation :935)."""
        params = params if params is not None else self.params
        feats = None
        if pixel_values is not None:
            feats = self.get_image_features(params, pixel_values)
        embeds = self._merge(params, jnp.asarray(input_ids), feats)
        return super().generate(params, inputs_embeds=embeds,
                                attention_mask=attention_mask, **kwargs)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None,
                 past_key_values=None, cache_position=0, labels=None,
                 **kwargs) -> Florence2Seq2SeqLMOutput:
        image_features = None
        if encoder_outputs is None:
            if pixel_values is not None:
                image_features = self.get_image_features(params, pixel_values)
            embeds = self._merge(params, jnp.asarray(input_ids), image_features)
            encoder_outputs = self.encode(params, embeds, attention_mask)
        if decoder_input_ids is None:
            if labels is not None:
                decoder_input_ids = shift_tokens_right(
                    labels, self.config.text_config.pad_token_id,
                    self.config.text_config.decoder_start_token_id)
            else:
                b = encoder_outputs.last_hidden_state.shape[0]
                decoder_input_ids = jnp.full(
                    (b, 1), self.config.text_config.decoder_start_token_id,
                    jnp.int32)
        cross_kv = self.precompute_cross_kv(
            params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(
            params, decoder_input_ids, cross_kv, past_key_values,
            cache_position, decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size,
                                      shift_labels=labels)
        return Florence2Seq2SeqLMOutput(
            loss=loss, logits=logits, past_key_values=cache,
            encoder_last_hidden_state=encoder_outputs.last_hidden_state,
            image_hidden_states=image_features)
