"""LLaVA-OneVision (reference models/llava_onevision/modeling_llava_onevision.py).

LLaVA-NeXT AnyRes packing plus:
- ``anyres_max_N`` aspect ratio (:329): after unpad, if the tile canvas
  exceeds N base-tile areas by >1.1x it is bilinearly downscaled;
- video inputs: per-frame features are 2x bilinearly pooled (:404
  apply_pooling), flattened across frames, and a single image_newline is
  appended per video.

Torch ``F.interpolate(mode='bilinear', align_corners=False)`` is reproduced
exactly as two separable host-built weight matrices (static shapes).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..llava_next.modeling_llava_next import (LlavaNextForConditionalGeneration,
                                              LlavaNextModel,
                                              get_anyres_image_grid_shape,
                                              unpad_image)
from .configuration_llava_onevision import LlavaOnevisionConfig


def bilinear_resize_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] row-stochastic weights matching torch bilinear
    (align_corners=False, half-pixel centers, edge clamp)."""
    x = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x)
    t = x - x0
    i0 = np.clip(x0, 0, src - 1).astype(int)
    i1 = np.clip(x0 + 1, 0, src - 1).astype(int)
    m = np.zeros((dst, src))
    m[np.arange(dst), i0] += 1 - t
    m[np.arange(dst), i1] += t
    return m


def bilinear_resize_chw(img, out_h: int, out_w: int):
    """img [C, H, W] -> [C, out_h, out_w] (torch F.interpolate parity)."""
    mh = jnp.asarray(bilinear_resize_matrix(img.shape[1], out_h), jnp.float32)
    mw = jnp.asarray(bilinear_resize_matrix(img.shape[2], out_w), jnp.float32)
    return jnp.einsum("hH,cHW,wW->chw", mh, img.astype(jnp.float32), mw).astype(img.dtype)


class LlavaOnevisionModel(LlavaNextModel):
    def pack_image_features(self, params, image_features, image_sizes):
        """AnyRes-max packing (reference :293)."""
        cfg = self.config
        newline = params["image_newline"].astype(self.dtype)
        packed = []
        for idx, feats in enumerate(image_features):
            if feats.shape[0] > 1:
                base = feats[0]
                tiles = feats[1:]
                hw = cfg.vision_config.image_size // cfg.vision_config.patch_size
                nph, npw = get_anyres_image_grid_shape(
                    image_sizes[idx], cfg.image_grid_pinpoints,
                    cfg.vision_config.image_size)
                f = tiles.reshape(nph, npw, hw, hw, -1)
                f = f.transpose(4, 0, 2, 1, 3)
                f = f.reshape(f.shape[0], nph * hw, npw * hw)
                f = unpad_image(f, tuple(image_sizes[idx]))
                max_patches = int(str(cfg.vision_aspect_ratio).replace("anyres_max_", ""))
                ch, cur_h, cur_w = f.shape
                ratio = math.sqrt(cur_h * cur_w / (max_patches * hw**2))
                if ratio > 1.1:
                    f = bilinear_resize_chw(f, int(cur_h // ratio), int(cur_w // ratio))
                nl = jnp.broadcast_to(newline[:, None, None],
                                      (f.shape[0], f.shape[1], 1)).astype(f.dtype)
                f = jnp.concatenate([f, nl], axis=-1)
                f = f.reshape(f.shape[0], -1).T
                packed.append(jnp.concatenate([base, f], axis=0))
            else:
                packed.append(jnp.concatenate([feats[0], newline[None]], axis=0))
        return packed

    def get_video_features(self, params, pixel_values_videos):
        """Per-frame tower + 2x bilinear pooling (reference :358/:404)."""
        cfg = self.config
        b, frames, c, h, w = pixel_values_videos.shape
        pix = pixel_values_videos.reshape(b * frames, c, h, w)
        out = self.vision_tower(params["vision_tower"], pix, output_hidden_states=True)
        layer = cfg.vision_feature_layer
        feats = (out.hidden_states[layer] if isinstance(layer, int)
                 else jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1))
        if cfg.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = self.multi_modal_projector(params["multi_modal_projector"], feats)
        side = cfg.vision_config.image_size // cfg.vision_config.patch_size
        bf, s, d = feats.shape
        grid = feats.reshape(bf, side, side, d).transpose(0, 3, 1, 2)
        oh, ow = math.ceil(side / 2), math.ceil(side / 2)
        mh = jnp.asarray(bilinear_resize_matrix(side, oh), jnp.float32)
        mw = jnp.asarray(bilinear_resize_matrix(side, ow), jnp.float32)
        pooled = jnp.einsum("hH,bcHW,wW->bchw", mh, grid.astype(jnp.float32), mw)
        pooled = pooled.transpose(0, 2, 3, 1).reshape(bf, -1, d).astype(feats.dtype)
        pooled = pooled.reshape(b, frames * pooled.shape[1], d)
        newline = params["image_newline"].astype(pooled.dtype)
        nl = jnp.broadcast_to(newline[None, None, :], (b, 1, d))
        return jnp.concatenate([pooled, nl], axis=1).reshape(b * (frames * oh * ow + 1), d)

    def embed_with_images(self, params, input_ids, pixel_values, image_sizes,
                          pixel_values_videos=None):
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where((input_ids == self.config.image_token_id)
                      | (input_ids == self.config.video_token_id), 0, input_ids))
        feats_list = []
        mask = jnp.zeros_like(input_ids, dtype=bool)
        if pixel_values is not None:
            feats_list.append(jnp.concatenate(
                self.get_image_features(params, pixel_values, image_sizes), axis=0))
            mask = mask | (input_ids == self.config.image_token_id)
        if pixel_values_videos is not None:
            feats_list.append(self.get_video_features(params, pixel_values_videos))
            mask = mask | (input_ids == self.config.video_token_id)
        if not feats_list:
            return embeds
        feats = jnp.concatenate(feats_list, axis=0).astype(embeds.dtype)
        order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
        gathered = jnp.take(feats, jnp.clip(order, 0, feats.shape[0] - 1), axis=0)
        return jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 output_hidden_states=False, pixel_values_videos=None):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(params, input_ids, pixel_values,
                                                   image_sizes, pixel_values_videos)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class LlavaOnevisionForConditionalGeneration(LlavaNextForConditionalGeneration):
    config_class = LlavaOnevisionConfig
    _prefill_input_names = ("pixel_values", "pixel_values_videos")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        del self._children["model"]
        object.__delattr__(self, "model")
        self.model = LlavaOnevisionModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, pixel_values_videos=None, **kwargs):
        from ...modeling_outputs import CausalLMOutputWithPast

        outputs = self.model(params["model"], input_ids, pixel_values,
                             image_sizes, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states, pixel_values_videos)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)
