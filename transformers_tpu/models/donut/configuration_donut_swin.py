"""Donut-Swin config (reference
src/transformers/models/donut/configuration_donut_swin.py) — Swin geometry
under the ``donut-swin`` model_type."""

from __future__ import annotations

from ..swin.configuration_swin import SwinConfig


class DonutSwinConfig(SwinConfig):
    model_type = "donut-swin"
