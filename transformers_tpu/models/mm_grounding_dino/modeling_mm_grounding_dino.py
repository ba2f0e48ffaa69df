"""MM-Grounding-DINO (reference
models/mm_grounding_dino/modular_mm_grounding_dino.py): the MMDetection
re-training of Grounding-DINO. Architecturally identical to Grounding-DINO
except the contrastive class head scales scores by 1/sqrt(d_model) and adds a
learned scalar bias (one on the encoder output head, one per decoder level —
all decoder levels tied to index 0, :280)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..grounding_dino.modeling_grounding_dino import (
    GroundingDinoForObjectDetection,
    GroundingDinoModel,
    contrastive_logits,
)
from .configuration_mm_grounding_dino import MMGroundingDinoConfig

# focal-prior bias init (reference modular_mm_grounding_dino.py:192)
_PRIOR_BIAS = -math.log((1 - 0.01) / 0.01)


class MMGroundingDinoModel(GroundingDinoModel):
    def init(self, rng):
        params = super().init(rng)
        params["encoder_output_class_embed"] = {
            "bias": jnp.asarray(_PRIOR_BIAS, self.param_dtype)}
        return params

    def _enc_contrastive(self, params, queries, text, text_token_mask):
        return contrastive_logits(
            queries, text, text_token_mask, self.config.max_text_len,
            scaled=True, bias=params["encoder_output_class_embed"]["bias"])


class MMGroundingDinoForObjectDetection(GroundingDinoForObjectDetection):
    config_class = MMGroundingDinoConfig
    # tied duplicates beyond the canonical index-0 copy (reference
    # _tied_weights_keys: bbox_embed.N -> .0, class_embed.N -> .0)
    _keys_to_ignore_on_load_unexpected = (
        GroundingDinoForObjectDetection._keys_to_ignore_on_load_unexpected
        + (r"^(model\.decoder\.)?(bbox_embed|class_embed)\.[1-9]\d*\.",))

    def __init__(self, config: MMGroundingDinoConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = MMGroundingDinoModel(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)

        def bound_bbox(idx, hidden):
            return self.bbox_embed[0](self._params_ref["bbox_embed"]["0"], hidden)

        self.model._bbox_embed = bound_bbox

    def init(self, rng):
        params = super().init(rng)
        params["class_embed"] = {
            "0": {"bias": jnp.asarray(_PRIOR_BIAS, self.param_dtype)}}
        return params

    def _cls_contrastive(self, params, level, hidden, text, text_token_mask):
        return contrastive_logits(
            hidden, text, text_token_mask, self.config.max_text_len,
            scaled=True, bias=params["class_embed"]["0"]["bias"])
