"""MM-Grounding-DINO config (reference
models/mm_grounding_dino/modular_mm_grounding_dino.py:44 — identical surface
to GroundingDinoConfig minus the bbox-share switches; all per-layer heads are
tied to index 0, i.e. effectively shared)."""

from __future__ import annotations

from ..grounding_dino.configuration_grounding_dino import GroundingDinoConfig


class MMGroundingDinoConfig(GroundingDinoConfig):
    model_type = "mm-grounding-dino"

    def __init__(self, **kwargs):
        # reference ties bbox_embed.N -> bbox_embed.0 and class_embed.N ->
        # class_embed.0 (_tied_weights_keys), so the heads are shared
        kwargs["decoder_bbox_embed_share"] = True
        super().__init__(**kwargs)
