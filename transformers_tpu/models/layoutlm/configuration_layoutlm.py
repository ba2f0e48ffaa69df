"""LayoutLM config (reference src/transformers/models/layoutlm/configuration_layoutlm.py)."""

from __future__ import annotations

from ..bert.configuration_bert import BertConfig


class LayoutLMConfig(BertConfig):
    model_type = "layoutlm"

    def __init__(self, max_2d_position_embeddings=1024, **kwargs):
        self.max_2d_position_embeddings = max_2d_position_embeddings
        super().__init__(**kwargs)
