"""Video-LLaVA (reference models/video_llava/modeling_video_llava.py): LLaVA
with SEPARATE image and video CLIP towers sharing one projector; video
frames flatten through the video tower and scatter at video-token slots."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Module
from ...core.loading import WeightRule
from ..llava.modeling_llava import (
    LlavaForConditionalGeneration,
    LlavaModel,
    LlavaMultiModalProjector,
    _language_model_cls,
    _vision_tower_cls,
)
from .configuration_video_llava import VideoLlavaConfig


class VideoLlavaModel(LlavaModel):
    def __init__(self, config, *, dtype, param_dtype):
        Module.__init__(self, dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        tower_cls = _vision_tower_cls(config.vision_config.model_type)
        self.image_tower = tower_cls(config.vision_config, **kw)
        self.video_tower = tower_cls(config.vision_config, **kw)
        self.multi_modal_projector = LlavaMultiModalProjector(config, **kw)
        self.language_model = _language_model_cls(
            config.text_config.model_type)(config.text_config, **kw).model

    def _tower_features(self, params, tower, pixel_values, drop_cls):
        layer = self.config.vision_feature_layer
        out = tower(params, pixel_values, output_hidden_states=True)
        if isinstance(layer, int):
            feats = out.hidden_states[layer]
        else:
            feats = jnp.concatenate([out.hidden_states[i] for i in layer], axis=-1)
        if drop_cls and self.config.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        return feats

    def get_image_features(self, params, pixel_values_images):
        feats = self._tower_features(params["image_tower"], self.image_tower,
                                     pixel_values_images, drop_cls=True)
        return self.multi_modal_projector(params["multi_modal_projector"], feats)

    def get_video_features(self, params, pixel_values_videos):
        # video frames keep the CLS token (reference get_video_features:
        # no select strategy on the video branch)
        b, t = pixel_values_videos.shape[:2]
        flat = pixel_values_videos.reshape((b * t,) + pixel_values_videos.shape[2:])
        feats = self._tower_features(params["video_tower"], self.video_tower,
                                     flat, drop_cls=False)
        feats = self.multi_modal_projector(params["multi_modal_projector"], feats)
        return feats.reshape(b, t * feats.shape[1], -1)

    def embed_with_images(self, params, input_ids, pixel_values_images=None,
                          pixel_values_videos=None):
        embeds = self.language_model.embed_tokens(
            params["language_model"]["embed_tokens"],
            jnp.where((input_ids == self.config.image_token_id)
                      | (input_ids == self.config.video_token_id), 0, input_ids))
        for pixels, token_id, getter in (
                (pixel_values_images, self.config.image_token_id,
                 self.get_image_features),
                (pixel_values_videos, self.config.video_token_id,
                 self.get_video_features)):
            if pixels is None:
                continue
            feats = getter(params, pixels)
            flat = feats.reshape(-1, feats.shape[-1]).astype(embeds.dtype)
            mask = input_ids == token_id
            order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
            gathered = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1), axis=0)
            embeds = jnp.where(mask.reshape(embeds.shape[:2])[..., None],
                               gathered.reshape(embeds.shape), embeds)
        return embeds

    def __call__(self, params, input_ids=None, pixel_values_images=None,
                 pixel_values_videos=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_with_images(
                params, input_ids, pixel_values_images, pixel_values_videos)
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)


class VideoLlavaForConditionalGeneration(LlavaForConditionalGeneration):
    config_class = VideoLlavaConfig
    model_cls = VideoLlavaModel
    _prefill_input_names = ("pixel_values_images", "pixel_values_videos")
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.", rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^image_tower\.", rename="model.image_tower."),
        WeightRule(pattern=r"^video_tower\.", rename="model.video_tower."),
        WeightRule(pattern=r"^multi_modal_projector\.", rename="model.multi_modal_projector."),
    )

    def __call__(self, params, input_ids=None, pixel_values_images=None,
                 pixel_values_videos=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs):
        from ...modeling_outputs import CausalLMOutputWithPast

        outputs = self.model(params["model"], input_ids, pixel_values_images,
                             pixel_values_videos, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states)
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
