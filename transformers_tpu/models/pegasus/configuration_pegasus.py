"""Pegasus config (reference src/transformers/models/pegasus/configuration_pegasus.py)."""

from __future__ import annotations

from ..bart.configuration_bart import BartConfig


class PegasusConfig(BartConfig):
    model_type = "pegasus"
