"""M2M100 config (reference src/transformers/models/m2m_100/configuration_m2m_100.py)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig


class M2M100Config(BartConfig):
    model_type = "m2m_100"
