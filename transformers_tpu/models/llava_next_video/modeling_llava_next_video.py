"""LLaVA-NeXT-Video, TPU-native (reference
src/transformers/models/llava_next_video/modeling_llava_next_video.py).

LLaVA-NeXT plus a video path: frames are run through the same vision tower,
spatially pooled 2x by the ``vision_resampler`` (:107-139, average/max/conv),
projected, flattened across frames, and scattered at ``video_token_id``.
Images keep the AnyRes packing from llava_next.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Conv, Module
from ...modeling_outputs import CausalLMOutputWithPast
from ..llava_next.modeling_llava_next import (LlavaNextForConditionalGeneration,
                                              LlavaNextModel)
from .configuration_llava_next_video import LlavaNextVideoConfig


class LlavaNextVideoPooler(Module):
    """Spatial pool over the frame patch grid (reference :107-139)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.mode = config.spatial_pool_mode
        self.stride = config.spatial_pool_stride
        if self.mode == "conv":
            out_ch = getattr(config, "spatial_pool_out_channels",
                             config.vision_config.hidden_size)
            self.pool = Conv(config.vision_config.hidden_size, out_ch,
                             self.stride, stride=self.stride, ndim=2,
                             dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, feats):
        b, n, d = feats.shape
        side = int(round(n ** 0.5))
        x = feats.reshape(b, side, side, d).transpose(0, 3, 1, 2)
        s = self.stride
        if self.mode == "average":
            hh, ww = side // s, side // s
            x = x[:, :, :hh * s, :ww * s].reshape(b, d, hh, s, ww, s)
            x = jnp.mean(x, axis=(3, 5))
        elif self.mode == "max":
            hh, ww = side // s, side // s
            x = x[:, :, :hh * s, :ww * s].reshape(b, d, hh, s, ww, s)
            x = jnp.max(x, axis=(3, 5))
        elif self.mode == "conv":
            x = self.pool(params["pool"], x)
        else:
            raise ValueError(f"Unknown pooling mode: {self.mode}")
        b2, d2, hh, ww = x.shape
        return x.reshape(b2, d2, hh * ww).transpose(0, 2, 1)


class LlavaNextVideoModel(LlavaNextModel):
    def __init__(self, config: LlavaNextVideoConfig, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_resampler = LlavaNextVideoPooler(config, dtype=dtype,
                                                     param_dtype=param_dtype)

    def get_video_features(self, params, pixel_values_videos):
        cfg = self.config
        b, f, c, h, w = pixel_values_videos.shape
        pixels = pixel_values_videos.reshape(b * f, c, h, w)
        out = self.vision_tower(params["vision_tower"], pixels,
                                output_hidden_states=True)
        layer = cfg.vision_feature_layer
        if isinstance(layer, int):
            feats = out.hidden_states[layer]
        else:
            feats = jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1)
        if cfg.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = self.vision_resampler(params.get("vision_resampler", {}), feats)
        feats = self.multi_modal_projector(params["multi_modal_projector"], feats)
        return feats.reshape(b, -1, feats.shape[-1])

    def embed_with_images(self, params, input_ids, pixel_values, image_sizes,
                          pixel_values_videos=None):
        img_token = self.config.image_token_id
        vid_token = self.config.video_token_id
        safe_ids = jnp.where((input_ids == img_token) | (input_ids == vid_token),
                             0, input_ids)
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"], safe_ids)
        if pixel_values is not None:
            feats = jnp.concatenate(
                self.get_image_features(params, pixel_values, image_sizes),
                axis=0).astype(embeds.dtype)
            mask = input_ids == img_token
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(feats, jnp.clip(order, 0, feats.shape[0] - 1), axis=0)
            embeds = jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)
        if pixel_values_videos is not None:
            vfeats = self.get_video_features(params, pixel_values_videos)
            vfeats = vfeats.reshape(-1, vfeats.shape[-1]).astype(embeds.dtype)
            mask = input_ids == vid_token
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(vfeats, jnp.clip(order, 0, vfeats.shape[0] - 1), axis=0)
            embeds = jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)
        return embeds

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


class LlavaNextVideoForConditionalGeneration(LlavaNextForConditionalGeneration):
    config_class = LlavaNextVideoConfig
    _prefill_input_names = ("pixel_values", "pixel_values_videos")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = LlavaNextVideoModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_sizes=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0, output_hidden_states=False,
                 pixel_values_videos=None, **kwargs) -> CausalLMOutputWithPast:
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
