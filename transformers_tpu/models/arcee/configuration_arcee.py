"""Arcee config (reference src/transformers/models/arcee/configuration_arcee.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class ArceeConfig(LlamaConfig):
    model_type = "arcee"

    def __init__(self, hidden_act="relu2", **kwargs):
        kwargs["hidden_act"] = hidden_act
        super().__init__(**kwargs)
