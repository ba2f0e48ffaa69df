"""UDOP (reference models/udop/modeling_udop.py): document T5 — image patches
are fused into the TEXT token embeddings at their OCR positions (remaining
patches are appended), 2-D cell embeddings of token bboxes are added, and the
encoder self-attention bias aggregates the T5 1-D bias with bucketed
horizontal/vertical bbox-distance biases. The decoder is a plain T5 decoder,
so conditional generation inherits the standard seq2seq machinery."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.module import Conv, Embedding, Linear, Module, ModuleList, RMSNorm, normal_init
from ...modeling_outputs import BaseModelOutput, ModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ..luke.modeling_luke import _Container
from ..t5.modeling_t5 import (
    T5Block,
    T5ForConditionalGeneration,
    T5Stack,
    relative_position_bucket,
)
from .configuration_udop import UdopConfig


class UdopPatchEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.proj = Conv(config.num_channels, config.d_model, config.patch_size,
                         stride=config.patch_size, ndim=2, dtype=dtype,
                         param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        h = self.proj(params["proj"], pixel_values)
        b, c = h.shape[:2]
        return h.reshape(b, c, -1).transpose(0, 2, 1)


class _RelativeBias(Module):
    """One bias head: 1d / horizontal / vertical (reference
    RelativePositionBias*)."""

    def __init__(self, config, kind, num_heads, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.kind = kind
        self.num_buckets = config.relative_attention_num_buckets
        self.scaling_factor = 1 if kind == "1d" else 100
        self.max_distance = 128 if kind == "1d" else 100
        self.relative_attention_bias = Embedding(self.num_buckets, num_heads,
                                                 dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, attention_mask, bbox):
        if self.kind == "1d":
            positions = jnp.arange(attention_mask.shape[1],
                                   dtype=jnp.float32)[None]
        elif self.kind == "horizontal":
            positions = bbox[:, :, jnp.asarray([0, 2])].mean(-1) * self.scaling_factor
        else:
            positions = bbox[:, :, jnp.asarray([1, 3])].mean(-1) * self.scaling_factor
        rel = (positions[:, None, :] - positions[:, :, None]).astype(jnp.int32)
        bucket = relative_position_bucket(rel, bidirectional=True,
                                          num_buckets=self.num_buckets,
                                          max_distance=self.max_distance)
        table = params["relative_attention_bias"]["weight"].astype(jnp.float32)
        values = jnp.take(table, bucket, axis=0)  # [B, Q, K, H]
        return values.transpose(0, 3, 1, 2)


class UdopCellEmbeddings(Module):
    def __init__(self, max_pos, hidden_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.max_pos = max_pos
        self.x_position_embeddings = Embedding(max_pos, hidden_size, **kw)
        self.y_position_embeddings = Embedding(max_pos, hidden_size, **kw)

    def __call__(self, params, bbox):
        bbox = jnp.clip(jnp.asarray(bbox, jnp.float32), 0.0, 1.0)
        bbox = jnp.clip((bbox * (self.max_pos - 1)).astype(jnp.int32),
                        0, self.max_pos - 1)
        xe = self.x_position_embeddings
        ye = self.y_position_embeddings
        return (xe(params["x_position_embeddings"], bbox[:, :, 0])
                + ye(params["y_position_embeddings"], bbox[:, :, 1])
                + xe(params["x_position_embeddings"], bbox[:, :, 2])
                + ye(params["y_position_embeddings"], bbox[:, :, 3]))


def _visual_bbox(image_size, patch_size):
    n = image_size // patch_size
    edges = np.arange(n + 1, dtype=np.float32) / n
    x0 = np.tile(edges[:-1], (n, 1))
    y0 = np.tile(edges[:-1], (n, 1)).T
    x1 = np.tile(edges[1:], (n, 1))
    y1 = np.tile(edges[1:], (n, 1)).T
    return np.stack([x0, y0, x1, y1], -1).reshape(-1, 4)


def combine_image_text_embeddings(image_embeddings, inputs_embeds, bbox,
                                  attention_mask, num_patches, image_size,
                                  patch_size):
    """reference combine_image_text_embeddings (host/numpy; variable-length
    per-sample patch lists padded back to a fixed width)."""
    img = np.asarray(image_embeddings)
    txt = np.asarray(inputs_embeds)
    bbox_np = np.asarray(bbox, np.float64)
    s = num_patches
    ox = np.clip(np.floor((bbox_np[:, :, 0] + bbox_np[:, :, 2]) / 2.0 * s), 0, s - 1).astype(int)
    oy = np.clip(np.floor((bbox_np[:, :, 1] + bbox_np[:, :, 3]) / 2.0 * s), 0, s - 1).astype(int) * s
    ocr_points = ox + oy
    target_seg = (bbox_np.mean(-1) == 0.0) | (bbox_np.mean(-1) == 1.0)
    repeated = np.take_along_axis(img, ocr_points[:, :, None], axis=1).copy()
    repeated[target_seg] = 0.0
    txt = txt + repeated
    b = img.shape[0]
    patch_inds = np.ones(img.shape[:2], bool)
    for i in range(b):
        patch_inds[i, ocr_points[i]] = False
    vis_bbox = _visual_bbox(image_size, patch_size)
    max_len = img.shape[1]
    patches_out = np.zeros((b, max_len, img.shape[-1]), img.dtype)
    bbox_out = np.zeros((b, max_len, 4), bbox_np.dtype)
    has_mask = attention_mask is not None
    mask_np = (np.asarray(attention_mask) if has_mask
               else np.ones(txt.shape[:2], np.int64))
    vmask_out = np.zeros((b, max_len), mask_np.dtype)
    for i in range(b):
        sel = img[i][patch_inds[i]][:max_len]
        patches_out[i, :len(sel)] = sel
        vb = vis_bbox[patch_inds[i]][:max_len]
        bbox_out[i, :len(vb)] = vb
        vmask_out[i, :len(sel)] = 1
    inputs_embeds = np.concatenate([txt, patches_out], 1)
    bbox_full = np.concatenate([bbox_np, bbox_out], 1)
    mask_full = (jnp.asarray(np.concatenate([mask_np, vmask_out], 1))
                 if has_mask else None)
    return jnp.asarray(inputs_embeds), jnp.asarray(bbox_full, jnp.float32), mask_full


class UdopEncoderStack(Module):
    """T5 encoder blocks driven by the aggregated 2-D relative bias."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.block = [T5Block(config, has_bias=(i == 0), is_decoder=False, **kw)
                      for i in range(config.num_layers)]
        self.final_layer_norm = RMSNorm(config.d_model,
                                        config.layer_norm_epsilon, **kw)
        self.cell_2d_embedding = UdopCellEmbeddings(
            config.max_2d_position_embeddings, config.d_model, **kw)
        biases = {}
        for i, args in enumerate(config.relative_bias_args):
            biases[str(i)] = _RelativeBias(config, args["type"],
                                           config.num_heads, **kw)
        self.relative_bias = _Container({"biases": _Container(biases, **kw)}, **kw)

    def __call__(self, params, inputs_embeds, bbox, attention_mask):
        bias = 0.0
        b_mods = self.relative_bias._children["biases"]._children
        for i, mod in b_mods.items():
            bias = bias + mod(params["relative_bias"]["biases"][i],
                              attention_mask, bbox)
        mask_bias = (1.0 - jnp.asarray(attention_mask)[:, None, None, :]
                     .astype(jnp.float32)) * jnp.finfo(jnp.float32).min
        bias = bias + mask_bias
        hidden = inputs_embeds + self.cell_2d_embedding(
            params["cell_2d_embedding"], bbox)
        for i, block in enumerate(self.block):
            hidden, _ = block(params["block"][str(i)], hidden, bias)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class UdopForConditionalGeneration(T5ForConditionalGeneration):
    """UDOP seq2seq head; decoder-side generation is inherited T5."""

    config_class = UdopConfig
    # the hub checkpoint carries an UNUSED decoder-side relative_bias stack
    _keys_to_ignore_on_load_unexpected = (
        r"(encoder|decoder)\.embed_tokens\.weight$", r"^lm_head\.weight$",
        r"decoder\.relative_bias\.")

    def tie_weights(self, params):
        # the 1d relative bias table is tied to encoder block 0's table
        # (reference _tied_weights_keys)
        src = params["encoder"]["block"]["0"]["layer"]["0"]["SelfAttention"][
            "relative_attention_bias"]["weight"]
        params["encoder"]["relative_bias"]["biases"]["0"] = {
            "relative_attention_bias": {"weight": src}}
        return params

    def __init__(self, config: UdopConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # replace the plain T5 encoder with the UDOP multimodal encoder; the
        # patch embedding lives at the top level (hub layout)
        self._children.pop("encoder", None)
        self.patch_embed = UdopPatchEmbeddings(config, **kw)
        self.encoder = UdopEncoderStack(config, **kw)

    def encode(self, params, input_ids, attention_mask=None, bbox=None,
               pixel_values=None, **kwargs) -> BaseModelOutput:
        embeds = self.shared(params["shared"], jnp.asarray(input_ids))
        bbox = jnp.asarray(bbox, jnp.float32)
        if pixel_values is not None:
            image_embeddings = self.patch_embed(
                params["patch_embed"], jnp.asarray(pixel_values, self.dtype))
            num_patches = self.config.image_size // self.config.patch_size
            # reference quirk: with no user mask, the post-combine default is
            # ALL-ONES (padded patch slots are attended)
            embeds, bbox, attention_mask = combine_image_text_embeddings(
                image_embeddings, embeds, bbox, attention_mask, num_patches,
                self.config.image_size, self.config.patch_size)
        if attention_mask is None:
            attention_mask = jnp.ones(embeds.shape[:2], jnp.int32)
        hidden = self.encoder(params["encoder"], embeds, bbox, attention_mask)
        out = BaseModelOutput(last_hidden_state=hidden)
        out.attention_mask = attention_mask
        return out

    def __call__(self, params, input_ids=None, attention_mask=None, bbox=None,
                 pixel_values=None, visual_bbox=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None,
                 past_key_values=None, cache_position=0, labels=None,
                 **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask,
                                          bbox, pixel_values)
        enc_mask = getattr(encoder_outputs, "attention_mask", attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id or self.config.pad_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype),
                 labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100,
                                          self.config.pad_token_id,
                                          decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params,
                                            encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, enc_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class UdopModel(UdopForConditionalGeneration):
    """Bare encoder-decoder (no LM head use)."""

    def __call__(self, params, input_ids=None, attention_mask=None, bbox=None,
                 pixel_values=None, decoder_input_ids=None, **kwargs):
        out = super().__call__(params, input_ids, attention_mask, bbox,
                               pixel_values, None, decoder_input_ids, **kwargs)
        return out


class UdopEncoderModel(PreTrainedModel):
    config_class = UdopConfig
    main_input_name = "input_ids"
    _keys_to_ignore_on_load_unexpected = (r"encoder\.embed_tokens\.weight$",
                                          r"relative_bias\.biases\.[12]\.")

    def __init__(self, config: UdopConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.shared = Embedding(config.vocab_size, config.d_model,
                                embedding_init=normal_init(1.0), **kw)
        self.patch_embed = UdopPatchEmbeddings(config, **kw)
        self.encoder = UdopEncoderStack(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, bbox=None,
                 pixel_values=None, **kwargs) -> BaseModelOutput:
        helper = UdopForConditionalGeneration.encode
        return helper(self, params, input_ids, attention_mask, bbox, pixel_values)
