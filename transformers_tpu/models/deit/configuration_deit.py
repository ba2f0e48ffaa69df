"""DeiT config (reference src/transformers/models/deit/configuration_deit.py)."""

from __future__ import annotations

from ..vit.configuration_vit import ViTConfig


class DeiTConfig(ViTConfig):
    model_type = "deit"
