"""GLPN config (reference src/transformers/models/glpn/configuration_glpn.py
— a SegFormer encoder + depth decoder)."""

from __future__ import annotations

from ..segformer.configuration_segformer import SegformerConfig


class GLPNConfig(SegformerConfig):
    model_type = "glpn"

    def __init__(self, *args, decoder_hidden_size=64, max_depth=10, head_in_index=-1,
                 **kwargs):
        kwargs.pop("reshape_last_stage", None)
        super().__init__(*args, decoder_hidden_size=decoder_hidden_size,
                         reshape_last_stage=True, **kwargs)
        self.max_depth = max_depth
        self.head_in_index = head_in_index
