"""Marian config (reference src/transformers/models/marian/configuration_marian.py)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig


class MarianConfig(BartConfig):
    model_type = "marian"
