"""InstructBLIP-Video (reference
models/instructblipvideo/modular_instructblipvideo.py): InstructBlip over
4-frame clips — frames flatten through the vision tower and Q-Former (the
qformer text repeats per frame), per-frame query tokens concatenate to
num_query_tokens * frames soft tokens scattered at video-token slots."""

from __future__ import annotations

import jax.numpy as jnp

from ..instructblip.modeling_instructblip import InstructBlipForConditionalGeneration
from .configuration_instructblipvideo import InstructBlipVideoConfig


class InstructBlipVideoForConditionalGeneration(InstructBlipForConditionalGeneration):
    config_class = InstructBlipVideoConfig

    def get_image_features(self, params, pixel_values, qformer_input_ids=None,
                           qformer_attention_mask=None):
        b, t = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        if qformer_input_ids is not None:
            qformer_input_ids = jnp.repeat(qformer_input_ids, t, axis=0)
        if qformer_attention_mask is not None:
            qformer_attention_mask = jnp.repeat(qformer_attention_mask, t, axis=0)
        feats = super().get_image_features(params, flat, qformer_input_ids,
                                           qformer_attention_mask)
        return feats.reshape(b, t * feats.shape[1], -1)

    def _embed(self, params, input_ids, pixel_values, qformer_input_ids=None,
               qformer_attention_mask=None):
        # scatter at the VIDEO token (reference :204); reuse the parent's
        # scatter by aliasing image_token_id for the call
        token = getattr(self.config, "video_token_id", None) or \
            self.config.image_token_id
        orig = self.config.image_token_id
        self.config.image_token_id = token
        try:
            return super()._embed(params, input_ids, pixel_values,
                                  qformer_input_ids, qformer_attention_mask)
        finally:
            self.config.image_token_id = orig
